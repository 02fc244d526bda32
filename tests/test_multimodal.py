"""Multimodal plumbing: Arrow-batch UDF output must equal pure-Python math
on the same payload bytes, and the decode stub must fail loudly."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from broadway_kinesis_spark.operators.multimodal import (
    FRAME_BYTES,
    FRAME_STRIDE,
    as_media,
    decode_image,
    multimodal_byte_features,
    multimodal_frame_sample,
)
from broadway_kinesis_spark.session import load


def _payloads(spark, sf_dir, n=5):
    rows = (
        load(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(n)
        .select("doc_id", "text")
        .collect()
    )
    return {r.doc_id: r.text.encode("utf-8") for r in rows}


def test_media_schema(spark, sf_dir):
    media = as_media(load(spark, sf_dir, "documents"))
    fields = dict(media.dtypes)
    assert fields["payload"] == "binary"
    assert fields["meta"].startswith("struct<n_bytes:bigint,content_type:string")


def test_byte_features_match_python(spark, sf_dir):
    expected = _payloads(spark, sf_dir)
    got = {
        r.media_id: r
        for r in multimodal_byte_features(spark, sf_dir)
        .filter(f"media_id in ({','.join(map(str, expected))})")
        .collect()
    }
    assert set(got) == set(expected)
    for mid, payload in expected.items():
        arr = np.frombuffer(payload, dtype=np.uint8)
        r = got[mid]
        assert r.n_bytes == arr.size
        assert r.byte_sum == int(arr.sum())
        assert r.min_byte == int(arr.min())
        assert r.max_byte == int(arr.max())
        assert r.hist4 == ",".join(str(int(x)) for x in np.bincount(arr >> 6, minlength=4))


def test_frame_sample_match_python(spark, sf_dir):
    expected = _payloads(spark, sf_dir, n=3)
    got = (
        multimodal_frame_sample(spark, sf_dir)
        .filter(f"media_id in ({','.join(map(str, expected))})")
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.media_id, r.frame_idx)):
        by_doc.setdefault(r.media_id, []).append(r)
    for mid, payload in expected.items():
        n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
        want = [
            (fi, payload[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES])
            for fi in range(0, n_frames, FRAME_STRIDE)
        ]
        rows = by_doc[mid]
        assert [(r.frame_idx, r.frame_len, r.frame_md5) for r in rows] == [
            (fi, len(chunk), hashlib.md5(chunk).hexdigest()) for fi, chunk in want
        ]


def _bmp_bytes(img: np.ndarray, bottom_up: bool = True) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (BITMAPINFOHEADER) for the
    decoder tests: BGR samples, rows padded to 4 bytes."""
    import struct

    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = []
    order = range(h - 1, -1, -1) if bottom_up else range(h)
    for y in order:
        row = img[y, :, ::-1].tobytes()  # RGB -> BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    pixel_data = b"".join(rows)
    data_off = 14 + 40
    file_size = data_off + len(pixel_data)
    file_hdr = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h if bottom_up else -h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return file_hdr + dib + pixel_data


def _rand_img(h: int, w: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip():
    from broadway_kinesis_spark.operators.multimodal import encode_ppm

    img = _rand_img(5, 3)
    assert np.array_equal(decode_image(encode_ppm(img)), img)


def test_ppm_header_comments_and_whitespace():
    img = _rand_img(2, 4)
    payload = b"P6 # binary ppm\n# another comment\n 4\t2 # dims\n255\n" + img.tobytes()
    assert np.array_equal(decode_image(payload), img)


def test_bmp_decode_bottom_up_and_top_down():
    img = _rand_img(3, 5)  # w=5 -> 15-byte rows pad to 16 (exercises stride)
    assert np.array_equal(decode_image(_bmp_bytes(img, bottom_up=True)), img)
    assert np.array_equal(decode_image(_bmp_bytes(img, bottom_up=False)), img)


@pytest.mark.parametrize(
    "payload, match",
    [
        (b"\x89PNG\r\n", "unsupported image format"),
        (b"P6\n4 2\n255\n" + b"\x00" * 10, "expected 24 pixel bytes"),
        (b"P6\n4 2\n65535\n", "unsupported maxval"),
        (b"BM" + b"\x00" * 20, "truncated header"),
    ],
)
def test_decode_image_rejects_bad_payloads(payload, match):
    with pytest.raises(ValueError, match=match):
        decode_image(payload)


def test_image_stats_match_python(spark, sf_dir):
    """The mapInPandas decode path must equal a straight Python decode of
    the same synthesized payloads."""
    from broadway_kinesis_spark.operators.multimodal import (
        IMG_W,
        as_ppm_media,
        multimodal_image_stats,
    )

    media = {
        r.media_id: bytes(r.payload)
        for r in as_ppm_media(load(spark, sf_dir, "documents"))
        .orderBy("media_id")
        .limit(5)
        .collect()
    }
    got = {
        r.media_id: r
        for r in multimodal_image_stats(spark, sf_dir)
        .filter(f"media_id in ({','.join(map(str, media))})")
        .collect()
    }
    assert set(got) == set(media)
    for mid, payload in media.items():
        img = decode_image(payload)
        h, w, _ = img.shape
        assert w == IMG_W
        r = got[mid]
        assert (r.width, r.height) == (w, h)
        sums = img.reshape(-1, 3).sum(axis=0, dtype="int64")
        npx = float(h * w)
        assert (r.mean_r, r.mean_g, r.mean_b) == (
            sums[0] / npx,
            sums[1] / npx,
            sums[2] / npx,
        )


# -- round-4 audio decoder ---------------------------------------------------


def test_wav_roundtrip():
    from broadway_kinesis_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.RandomState(11)
    src = rng.randint(-32768, 32768, size=37, dtype=np.int16)
    smp, rate = decode_wav(encode_wav(src, rate=8000))
    assert rate == 8000
    assert np.array_equal(smp, src)


def test_wav_chunk_walker_skips_unknown_and_odd_chunks():
    """Unknown chunks before `data` — including odd-size ones, which pad to
    even offsets per the RIFF spec — must be walked over, not tripped on."""
    import struct

    from broadway_kinesis_spark.operators.multimodal import decode_wav, encode_wav

    src = np.array([1, -2, 300, -400], dtype=np.int16)
    base = encode_wav(src)
    fmt_chunk = base[12:36]          # "fmt " + size + 16-byte body
    data_chunk = base[36:]           # "data" + size + pcm
    odd = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded to even
    body = fmt_chunk + odd + data_chunk
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    smp, rate = decode_wav(payload)
    assert rate == 16000
    assert np.array_equal(smp, src)


@pytest.mark.parametrize(
    "mutate, match",
    [
        (lambda p: b"OggS" + p[4:], "bad RIFF/WAVE magic"),
        (lambda p: p[:22] + b"\x02" + p[23:], "only 16-bit mono PCM"),
        (lambda p: p[:-3], "truncated b'data' chunk"),
        (lambda p: p[:12] + p[36:] + p[12:36], "data chunk before fmt"),
    ],
)
def test_decode_wav_rejects_bad_payloads(mutate, match):
    from broadway_kinesis_spark.operators.multimodal import decode_wav, encode_wav

    payload = mutate(encode_wav(np.array([5, -6], dtype=np.int16)))
    with pytest.raises(ValueError, match=match):
        decode_wav(payload)


def test_audio_stats_match_python(spark, sf_dir):
    """The mapInPandas decode path must equal a straight Python decode of
    the same synthesized payloads."""
    import math

    from broadway_kinesis_spark.operators.multimodal import (
        as_wav_media,
        decode_wav,
        multimodal_audio_stats,
    )

    media = {
        r.media_id: bytes(r.payload)
        for r in as_wav_media(load(spark, sf_dir, "documents"))
        .orderBy("media_id")
        .limit(5)
        .collect()
    }
    got = {
        r.media_id: r
        for r in multimodal_audio_stats(spark, sf_dir)
        .filter(f"media_id in ({','.join(map(str, media))})")
        .collect()
    }
    assert set(got) == set(media)
    for mid, payload in media.items():
        smp, rate = decode_wav(payload)
        s64 = smp.astype("int64")
        r = got[mid]
        assert (r.sample_rate, r.n_samples) == (rate, smp.size)
        assert r.mean_amp == int(s64.sum()) / smp.size
        assert r.peak == max(abs(int(smp.min())), abs(int(smp.max())))
        assert r.rms == math.sqrt(int((s64 * s64).sum()) / smp.size)
