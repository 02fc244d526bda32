"""Audio fingerprint near-duplicate detection — the acoustic phash.

Completes the multimodal dedup pair started by ``dedup_image_phash``
(operators/imagehash.py): decoded WAV clips fingerprint by their
MAGNITUDE ENVELOPE — the |int16| sample profile pooled into the same 49
index-blocks and compared block-to-neighbour with exact integer
cross-multiplication — then the shared 4x12-bit banded Hamming self-join
surfaces near-identical clips (re-encodes, small edits) with no
all-pairs scan. The envelope is the spirit of a chromaprint-style
acoustic fingerprint reduced to public integer primitives: amplitude
structure over time, robust to small local perturbations.

The Spark side runs the REAL decode path — :func:`multimodal.decode_wav`
(RIFF chunk walker, fmt validation, int16-LE sample read) inside one
cached Arrow-batched ``mapInPandas`` stage — so a chunk-offset or
endianness bug cannot hash-match the oracle, which recomputes the
fingerprint in closed form from the WAV construction (sample i =
byte[2i] | byte[2i+1]<<8, signed; fixture text is pure ASCII so code
points == payload bytes). |x| is taken AFTER widening to int64 (int16
abs overflows on -32768).

Clips with no samples (sub-2-byte text) carry no envelope and are
excluded in BOTH engines rather than colliding on a degenerate zero
fingerprint.

Reference parity: [TGT] — engine extension (SURVEY §2.B multimodal
family).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.operators.imagehash import (
    B_BLOCKS,
    PAIR_SQL_TAIL,
    banded_pairs,
    phash48,
)
from broadway_kinesis_spark.operators.multimodal import as_wav_media, decode_wav
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

_SIGNED = (
    "CASE WHEN ascii(text[2*i+1]) + 256 * ascii(text[2*i+2]) >= 32768 "
    "THEN ascii(text[2*i+1]) + 256 * ascii(text[2*i+2]) - 65536 "
    "ELSE ascii(text[2*i+1]) + 256 * ascii(text[2*i+2]) END"
)


@query(
    "dedup_audio_fingerprint",
    oracle=f"""
    WITH s AS (
        SELECT doc_id AS media_id,
               list_transform(range(0, length(text) // 2), i -> {_SIGNED}) AS smp
        FROM documents WHERE length(text) >= 2
    ), g AS (
        SELECT media_id, CAST(len(smp) AS BIGINT) AS n, smp,
               UNNEST(range(0, len(smp))) AS i
        FROM s
    ), v AS (
        SELECT media_id, (i * {B_BLOCKS}) // n AS blk,
               ABS(smp[CAST(i + 1 AS INTEGER)]) AS mag
        FROM g
    ), bs AS (
        SELECT media_id, blk,
               CAST(SUM(mag) AS BIGINT) AS sv, CAST(COUNT(*) AS BIGINT) AS cv
        FROM v GROUP BY media_id, blk
    ), bits AS (
        SELECT lo.media_id, CAST(lo.blk AS INTEGER) AS r,
               CASE WHEN lo.sv * hi.cv > hi.sv * lo.cv THEN 1 ELSE 0 END AS bit
        FROM bs lo JOIN bs hi
          ON lo.media_id = hi.media_id AND hi.blk = lo.blk + 1
    ), fp0 AS (
        SELECT media_id,
               CAST(SUM(bit * (CAST(1 AS BIGINT) << r)) AS BIGINT) AS phash
        FROM bits GROUP BY media_id
    ), fp AS (
        -- a clip with fewer samples than {B_BLOCKS} blocks occupies
        -- non-adjacent blocks: the blk+1 join then has NO rows for it, but
        -- its fingerprint is defined (every comparison against an empty
        -- block is false) = 0. LEFT JOIN keeps such clips instead of
        -- silently dropping them (caught live: 48-char docs at sf0.01).
        SELECT s2.media_id, COALESCE(f.phash, CAST(0 AS BIGINT)) AS phash
        FROM (SELECT DISTINCT media_id FROM s) s2
        LEFT JOIN fp0 f ON s2.media_id = f.media_id
    ){PAIR_SQL_TAIL}
    """,
)
def dedup_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate audio pairs: 48-bit magnitude-envelope hash per
    decoded clip, banded Hamming candidate join, exact verify."""
    import numpy as np
    import pandas as pd

    media = as_wav_media(load(spark, sf_dir, "documents"))

    def hash_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, _rate = decode_wav(bytes(payload))
                if samples.shape[0] == 0:
                    continue  # no envelope: excluded in both engines
                rows.append(
                    (int(mid), phash48(np.abs(samples.astype(np.int64))))
                )
            yield pd.DataFrame(rows, columns=["media_id", "phash"])

    fps = media.select("media_id", "payload").mapInPandas(
        hash_batch, "media_id long, phash long"
    ).cache()
    return banded_pairs(fps)
