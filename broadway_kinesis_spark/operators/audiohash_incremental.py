"""Batch incremental corpus-version dedup — AUDIO FINGERPRINT channel
(round 11, session 3).

Session 2 gave the image branch of the perceptual family its delta form
(``fingerprint_incremental``); this module does the same for the ACOUSTIC
branch, whose fingerprint is wider (12 words / 555 bits — the
three-envelope magnitude/energy/first-difference construction of
``operators/audiohash.py``) and whose bands are therefore fewer and wider
(24 bands of 22–24 bits, ``imagehash.make_bands(3, 2)``). A delta of
clips arrives; only the delta DECODES (the RIFF walk + int16 sample read
is the channel's dominant cost — a fingerprint is 96 bytes, the payload
is the clip); version N serves from a persisted band table.

Persisted artifact (:func:`ensure_audio_bands`): ``(media_id, bkeyc,
w0..w11)`` — one row per (clip, band), with (band id, band value) packed
into the single injective join key ``bkeyc = bid * 2^25 + bkey`` (audio
band widths are <= 24 bits, so 2^25 clears every band value; the image
channel's 2^16 packing would alias here). Bucketed+sorted by ``bkeyc``
so delta probes sort-merge against the stored side without shuffling it
— the shared incremental layout protocol (ngram index → image bands →
these). Fingerprint words ride in the band rows, so the exact
total-Hamming verify (<= {AUDIO_HAM_T}) runs off the join output without
re-reading version-N payloads.

Pairs the delta introduces are exactly ``m2 >= boundary`` (version-N ids
all sit below every delta id and pairs are (m1 < m2)), so the registered
oracle is the INLINE channel's oracle — read from the registry at module
load, the dedup_persist pattern — wrapped in that one restriction.
Pigeonhole recall is inherited unchanged: with 24 bands and a Hamming
budget of {AUDIO_HAM_T}, every qualifying pair still shares a clean
band, and the probe join sees every band of every delta fingerprint
against every band of version N plus the delta itself.

Roll-forward: :func:`roll_forward_audio_bands` folds the accepted
delta's band rows into version N's table → N+1 (only the delta decodes;
fold == scratch and probe-on-rolled == probe-on-scratch pinned by
tests/test_round11_s3_channels.py).

Reference parity: [TGT] — engine extension (SURVEY §2.B multimodal
family; the reference has no media surface).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.functions.table_build import corpus_sig, ensure_table
from broadway_kinesis_spark.functions.versioned_fold import (
    fold_policy,
    link_forward_table,
    spread_delta,
)
from broadway_kinesis_spark.operators import audiohash as _audiohash  # noqa: F401 (registers the inline twin)
from broadway_kinesis_spark.operators.audiohash import (
    AUDIO_BANDS_PER_WORD,
    AUDIO_HAM_T,
    N_MEASURES,
)
from broadway_kinesis_spark.operators.imagehash import (
    _hamming_expr,
    make_bands,
    phash_words,
    w_cols,
    words_schema,
)
from broadway_kinesis_spark.operators.multimodal import as_wav_media, decode_wav
from broadway_kinesis_spark.registry import REGISTRY, query
from broadway_kinesis_spark.session import load

#: version-N / delta boundary for the registered fixture query (the
#: dedup_incremental convention).
BOUNDARY = 400

#: bucket count for the persisted band table — the protocol knob, sized
#: like any bucketed table at deployment scale.
BAND_BUCKETS = 8

#: audio band widths reach 24 bits (48-bit words / 2 bands), so the
#: injective (bid, bkey) packing shifts by 25 — asserted against the
#: actual band spec below, not assumed.
_PACK_SHIFT = 25

_AUDIO_BANDS = make_bands(N_MEASURES, AUDIO_BANDS_PER_WORD)
assert all(width < _PACK_SHIFT for (_, _, width) in _AUDIO_BANDS)

_BANDS_POLICY = f"r11s3:aufp555:h{AUDIO_HAM_T}:b{BAND_BUCKETS}"

_W = w_cols(N_MEASURES)
_N_WORDS = len(_W)

#: the inline channel's oracle OBJECT — importing operators.audiohash above
#: ran its @query decorator, so this lookup can never miss nor drift.
_INLINE_ORACLE = REGISTRY["dedup_audio_fingerprint"].oracle


def _fingerprints(docs: DataFrame) -> DataFrame:
    """(media_id, w0..w11) via the REAL decode path — the same RIFF-walking
    decode_wav + three-envelope phash_words the inline channel runs,
    Arrow-batched. Clips with no samples carry no envelope and are
    excluded, exactly as in both inline engines."""
    import numpy as np
    import pandas as pd

    media = as_wav_media(docs)

    def hash_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, _rate = decode_wav(bytes(payload))
                if samples.shape[0] == 0:
                    continue
                s = samples.astype(np.int64)
                mag = np.abs(s)
                rows.append(
                    (
                        int(mid),
                        *phash_words(mag),
                        *phash_words(mag * mag),
                        *phash_words(np.abs(np.diff(s))),
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", *_W])

    return media.select("media_id", "payload").mapInPandas(
        hash_batch, words_schema(N_MEASURES)
    )


def _band_rows(fps: DataFrame) -> DataFrame:
    """(media_id, bkeyc, w0..w11): one row per band, with (bid, bkey)
    packed into the single injective key ``bid * 2^{_PACK_SHIFT} + bkey``."""
    keys = [
        F.lit(bid * (1 << _PACK_SHIFT))
        + (
            F.expr(f"shiftright(w{w}, {shift})").bitwiseAND(
                F.lit((1 << width) - 1)
            )
        )
        for bid, (w, shift, width) in enumerate(_AUDIO_BANDS)
    ]
    return fps.select(
        "media_id", *_W, F.explode(F.array(*keys)).alias("bkeyc")
    )


def ensure_audio_bands(
    spark: SparkSession, sf_dir: str, boundary: int = BOUNDARY
) -> str:
    """Persist version N's acoustic band index — decode + fingerprint +
    band explosion for ``media_id < boundary``, bucketed by the packed
    band key so delta probes never shuffle the stored side."""
    pol = hashlib.md5(f"{_BANDS_POLICY}:v{boundary}".encode()).hexdigest()[:8]
    sig = corpus_sig(sf_dir, ("documents",))
    name = f"_bks_aubands_{pol}_{sig}"

    def build() -> DataFrame:
        docs = load(spark, sf_dir, "documents").filter(
            F.col("doc_id") < boundary
        )
        return _band_rows(_fingerprints(docs))

    return ensure_table(spark, name, build, bucket_by=(BAND_BUCKETS, "bkeyc"))


def roll_forward_audio_bands(
    spark: SparkSession,
    sf_dir: str,
    boundary_n: int,
    boundary_n1: int,
    src: str | None = None,
) -> str:
    """Fold the accepted delta ``[boundary_n, boundary_n1)`` into version
    N's persisted band index → version N+1's — only the delta is decoded
    AND only the delta's rows are written (round 12, VERDICT r11 #1):
    version N's data files hard-link into the new location in the same
    bucketed layout, so the fold's write cost tracks the delta, never the
    artifact. Name keys the roll-forward policy + BOTH boundaries;
    fold(N, delta) == build(N+1) is pinned by
    tests/test_round11_s3_channels.py, inode identity of the linked
    remainder by tests/test_versioned_fold.py."""
    # chained daily loop: ``src`` names the previous day's rolled table
    # (fold-on-fold); default is the from-scratch version-N build.
    old_tbl = src if src is not None else ensure_audio_bands(spark, sf_dir, boundary_n)
    pol = fold_policy(_BANDS_POLICY, boundary_n, boundary_n1, src)
    sig = corpus_sig(sf_dir, ("documents",))
    name = f"_bks_aubands_{pol}_{sig}"

    def delta_build() -> DataFrame:
        docs = load(spark, sf_dir, "documents").filter(
            (F.col("doc_id") >= boundary_n) & (F.col("doc_id") < boundary_n1)
        )
        return _band_rows(_fingerprints(spread_delta(docs)))

    return link_forward_table(
        spark, name, old_tbl, delta_build, bucket_by=(BAND_BUCKETS, "bkeyc")
    )


@query(
    "dedup_incremental_audiohash",
    oracle=f"""
    SELECT m1, m2, hamming FROM ({_INLINE_ORACLE}) WHERE m2 >= {BOUNDARY}
    """,
)
def dedup_incremental_audiohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acoustic near-dup pairs the DELTA introduces — banded-Hamming pairs
    with total distance <= {AUDIO_HAM_T} and at least one delta side —
    computed by probing version N's persisted band index with the delta's
    fingerprints instead of re-decoding the corpus. The oracle is the
    inline channel's oracle restricted to ``m2 >= {BOUNDARY}``, so the
    driver row proves the persisted index + probe serve exactly the
    from-scratch answer."""
    return incremental_audio_pairs(spark, sf_dir)


def incremental_audio_pairs(
    spark: SparkSession,
    sf_dir: str,
    boundary: int = BOUNDARY,
    bands_tbl: str | None = None,
) -> DataFrame:
    """Parameterized body of ``dedup_incremental_audiohash`` — scale runs
    place ``boundary`` per corpus; ``bands_tbl`` overrides the version-N
    artifact with a :func:`roll_forward_audio_bands` fold so day D+1's
    delta probes day D's fold.

    Shape: only the delta decodes (Arrow-batched); its band rows are the
    probe side ``b`` and ALSO self-join so delta-delta (new-new) pairs
    surface. The stored side joins FIRST, before any union: its bucketed
    HashPartitioning(bkeyc) satisfies the join distribution, so only the
    delta side exchanges — the image-channel probe plan at 12 words."""
    stored = spark.table(
        bands_tbl
        if bands_tbl is not None
        else ensure_audio_bands(spark, sf_dir, boundary)
    )
    d = load(spark, sf_dir, "documents")
    # One decode pass for the delta, shared by the probe side and the
    # new-new self-join (two consumers; delta-bounded by construction).
    delta_bands = _band_rows(
        _fingerprints(spread_delta(d.filter(F.col("doc_id") >= boundary)))
    ).cache()

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col("media_id").alias(f"m{tag}"),
            *[
                F.col(f"w{i}").alias(f"{'a' if tag == '1' else 'b'}{i}")
                for i in range(_N_WORDS)
            ],
            "bkeyc",
        )

    b = side(delta_bands, "2")
    old_cand = side(stored, "1").join(b, "bkeyc")
    new_cand = side(delta_bands, "1").join(b, "bkeyc")
    cand = (
        old_cand.unionByName(new_cand)
        .filter(F.col("m1") < F.col("m2"))
        .select(
            "m1",
            "m2",
            *[f"a{i}" for i in range(_N_WORDS)],
            *[f"b{i}" for i in range(_N_WORDS)],
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", _hamming_expr(_N_WORDS))
        .filter(F.col("hamming") <= AUDIO_HAM_T)
        .select("m1", "m2", "hamming")
    )
