"""Image perceptual-hash near-duplicate detection (dHash + banded Hamming).

The visual counterpart of MinHash that multimodal corpus builds run: no
text to shingle, so near-dup candidates come from a compact perceptual
fingerprint of the DECODED PIXELS — two re-encodes / slight corruptions
of the same image land within a few bits of each other, and a banded
self-join surfaces the pairs without any all-pairs scan (same LSH shape
as ``dedup_simhash``, dedup.py:275).

Fingerprint (48-bit block-difference hash): the decoded image's byte
plane (grayscale-equivalent: the raw interleaved RGB luminance signal,
padding included) is pooled into ``B = 49`` index-blocks
(``blk(i) = i·B // L``), and bit ``r`` is set iff block ``r``'s mean
exceeds block ``r+1``'s — the classic dHash "is the left cell brighter
than its right neighbour" rule applied to the flattened plane. Means are
compared EXACTLY via integer cross-multiplication
(``s[r]·c[r+1] > s[r+1]·c[r]``), so no float enters the fingerprint and
both engines agree bit-for-bit.

Candidate generation: 4 bands x 12 bits — two fingerprints within
Hamming distance <= {HAM_T} of each other must agree on at least one
whole band whenever their differing bits cluster (standard banded-LSH
recall argument); candidates verify with ``bit_count(xor)``. At 100 TB
band width is the tuning knob (wider bands = fewer random collisions),
exactly as for the text LSH family.

The Spark side runs the REAL decode path — :func:`multimodal.decode_image`
(header tokenizer + numpy reshape) inside Arrow-batched ``mapInPandas`` —
so a header-parse or reshape bug cannot hash-match the oracle, which
computes the same fingerprint in closed form from the PPM construction
(``as_ppm_media``: body bytes = ASCII text bytes zero-padded to a whole
pixel grid).

Reference parity: [TGT] — no relational surface in the reference; engine
extension beyond it (SURVEY §2.B multimodal family).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.operators.multimodal import (
    IMG_W,
    as_ppm_media,
    decode_image,
)
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

B_BLOCKS = 49  # pooling blocks -> 48 difference bits
N_BANDS = 4
BAND_BITS = 12  # 4 x 12 = 48
HAM_T = 6  # max Hamming distance for a verified near-dup pair

_ROW = IMG_W * 3  # bytes per pixel row in the synthesized P6 corpus


def phash48(flat_values) -> int:
    """48-bit block-difference hash of a flattened non-negative integer
    signal (image byte plane, audio magnitude profile, ...). Pure-integer:
    block sums are exact int64 (float64 bincount weights stay exact below
    2^53), comparisons are cross-multiplied — shared by the image and
    audio operators and their tests."""
    import numpy as np

    flat = np.asarray(flat_values, dtype=np.int64).reshape(-1)
    length = flat.shape[0]
    if length == 0:
        return 0
    blk = (np.arange(length) * B_BLOCKS) // length
    sums = np.bincount(blk, weights=flat, minlength=B_BLOCKS).astype(np.int64)
    cnts = np.bincount(blk, minlength=B_BLOCKS)
    fp = 0
    for r in range(B_BLOCKS - 1):
        if int(sums[r]) * int(cnts[r + 1]) > int(sums[r + 1]) * int(cnts[r]):
            fp |= 1 << r
    return fp


def banded_pairs(fps: DataFrame) -> DataFrame:
    """Candidate-generate + verify near-dup pairs from a ``(media_id,
    phash)`` DataFrame: {N_BANDS}x{BAND_BITS}-bit banded self-join, exact
    ``bit_count(xor) <= {HAM_T}`` verify — shared by the image and audio
    fingerprint operators."""
    bands = fps.select(
        "media_id",
        "phash",
        F.explode(F.array(*[F.lit(b) for b in range(N_BANDS)])).alias("band"),
    ).withColumn(
        "bkey",
        F.expr(f"shiftright(phash, band * {BAND_BITS})").bitwiseAND(
            F.lit((1 << BAND_BITS) - 1)
        ),
    )
    a = bands.select(
        F.col("media_id").alias("m1"), F.col("phash").alias("p1"), "band", "bkey"
    )
    b = bands.select(
        F.col("media_id").alias("m2"), F.col("phash").alias("p2"), "band", "bkey"
    )
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("m1") < F.col("m2"))
        .select("m1", "m2", "p1", "p2")
        .distinct()
    )
    ham = F.bit_count(F.col("p1").bitwiseXOR(F.col("p2"))).cast("int")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= HAM_T)
        .select("m1", "m2", "hamming")
    )


#: oracle fragment: bands/candidates/verify over a CTE named ``fp`` with
#: columns (media_id, phash) — the SQL twin of :func:`banded_pairs`.
PAIR_SQL_TAIL = f""", bands AS (
        SELECT media_id, phash, band,
               (phash >> (band * {BAND_BITS})) & {(1 << BAND_BITS) - 1} AS bkey
        FROM fp, UNNEST([{", ".join(str(x) for x in range(N_BANDS))}]) AS tb(band)
    ), cand AS (
        SELECT DISTINCT a.media_id AS m1, b.media_id AS m2,
                        a.phash AS p1, b.phash AS p2
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.media_id < b.media_id
    )
    SELECT m1, m2, CAST(bit_count(xor(p1, p2)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(p1, p2)) <= {HAM_T}"""


@query(
    "dedup_image_phash",
    oracle=f"""
    WITH b AS (
        SELECT doc_id AS media_id,
               list_transform(string_split(text, ''), c -> ascii(c)) AS bl,
               octet_length(encode(text)) AS n,
               CAST(GREATEST(CEIL(octet_length(encode(text)) / {_ROW}.0), 1)
                    * {_ROW} AS BIGINT) AS plane_len
        FROM documents
    ), g AS (
        SELECT media_id, n, bl, plane_len,
               UNNEST(range(0, plane_len)) AS i
        FROM b
    ), v AS (
        SELECT media_id, (i * {B_BLOCKS}) // plane_len AS blk,
               CASE WHEN i < n THEN bl[CAST(i + 1 AS INTEGER)] ELSE 0 END AS byte
        FROM g
    ), s AS (
        SELECT media_id, blk,
               CAST(SUM(byte) AS BIGINT) AS sv, CAST(COUNT(*) AS BIGINT) AS cv
        FROM v GROUP BY media_id, blk
    ), bits AS (
        SELECT lo.media_id, CAST(lo.blk AS INTEGER) AS r,
               CASE WHEN lo.sv * hi.cv > hi.sv * lo.cv THEN 1 ELSE 0 END AS bit
        FROM s lo JOIN s hi
          ON lo.media_id = hi.media_id AND hi.blk = lo.blk + 1
    ), fp0 AS (
        SELECT media_id,
               CAST(SUM(bit * (CAST(1 AS BIGINT) << r)) AS BIGINT) AS phash
        FROM bits GROUP BY media_id
    ), fp AS (
        -- a signal shorter than {B_BLOCKS} occupies non-adjacent blocks:
        -- the blk+1 join then has NO rows for it, but its fingerprint is
        -- defined (every comparison against an empty block is false) = 0.
        -- LEFT JOIN keeps such media instead of silently dropping them.
        SELECT d.media_id, COALESCE(f.phash, CAST(0 AS BIGINT)) AS phash
        FROM (SELECT DISTINCT media_id FROM b) d
        LEFT JOIN fp0 f ON d.media_id = f.media_id
    ){PAIR_SQL_TAIL}
    """,
)
def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs: 48-bit dHash per decoded image, 4x12-bit
    banded candidate join, exact Hamming verify <= {HAM_T}."""
    import pandas as pd

    media = as_ppm_media(load(spark, sf_dir, "documents"))

    def hash_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(bytes(payload))
                rows.append((int(mid), phash48(img.reshape(-1))))
            yield pd.DataFrame(rows, columns=["media_id", "phash"])

    # One row per image (64x smaller than the payloads): cached so the
    # banded SELF-join's two branches share a single decode pass instead of
    # each re-running the Arrow stage — the dedup.py shingle-cache pattern.
    fps = media.select("media_id", "payload").mapInPandas(
        hash_batch, "media_id long, phash long"
    ).cache()
    return banded_pairs(fps)
