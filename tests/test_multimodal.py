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


def test_decode_image_is_stubbed():
    try:
        import PIL  # noqa: F401

        pytest.skip("imaging lib present; stub not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="stub"):
        decode_image(b"\x89PNG\r\n")
