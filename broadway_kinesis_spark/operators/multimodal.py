"""Multimodal column plumbing (driver north star: "treat image/audio/video as
opaque binary columns with typed metadata").

The container ships no image/audio codecs, so the DECODE step is stubbed
(:func:`decode_image` raises ``NotImplementedError`` unless PIL appears), but
everything Spark-side is real and tested: the binary+metadata schema, the
Arrow-batched ``mapInPandas`` UDF signatures, batch iteration shape, and the
deterministic byte-level feature extraction that stands in for a codec.

Media rows are synthesized from `documents` (payload = utf-8 bytes of `text`)
— the fixture set has no binary table, and byte-level ops are agnostic to
what the bytes mean.

Scale posture: feature extraction is a per-row projection inside
``mapInPandas`` — embarrassingly parallel, no shuffle, Arrow transfer both
ways, numpy-vectorized inside the batch. Payload bytes never cross a shuffle
boundary: only extracted (small) features do. At 100 TB keep payloads in
parquet binary columns, push metadata predicates down (they're plain
columns), and size `spark.sql.files.maxPartitionBytes` so a task's batch of
payloads fits executor memory.

Reference parity: the reference treats Kinesis record `Data` as exactly this
kind of opaque base64/binary payload (`subscribe_to_shard.ex:365-366`) and
never interprets it — this module is the engine's generalization of that
posture to media payloads ([TGT]).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

FRAME_BYTES = 64   # fake "frame" size for frame sampling
FRAME_STRIDE = 4   # keep every 4th frame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<n_bytes: long, content_type: string, width: int, height: int, sample_rate: int>"
)


def as_media(docs: DataFrame) -> DataFrame:
    """documents -> opaque media rows: (media_id, kind, payload BINARY, meta STRUCT).

    The typed-metadata struct carries what a real ingest would parse from
    container headers; unknown fields stay NULL rather than fake."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.lit("text/plain; charset=utf-8").alias("content_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: decode an image payload to (height, width, channels) pixels.

    The test container has no imaging libraries; the Spark-side plumbing
    (binary column in, feature columns out) is exercised with byte-level
    features instead. Swap this for a real decoder when PIL is available.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "decode_image is a stub: no imaging library in this environment"
        ) from exc
    import io

    from PIL import Image as _Image

    return _Image.open(io.BytesIO(payload))


@query(
    "multimodal_byte_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(list_sum(list_transform(string_split(text, ''), c -> ascii(c))) AS BIGINT) AS byte_sum,
           CAST(list_min(list_transform(string_split(text, ''), c -> ascii(c))) AS INT) AS min_byte,
           CAST(list_max(list_transform(string_split(text, ''), c -> ascii(c))) AS INT) AS max_byte,
           CAST(len(list_filter(list_transform(string_split(text, ''), c -> ascii(c)), b -> b // 64 = 0)) AS VARCHAR)
           || ',' || CAST(len(list_filter(list_transform(string_split(text, ''), c -> ascii(c)), b -> b // 64 = 1)) AS VARCHAR)
           || ',' || CAST(len(list_filter(list_transform(string_split(text, ''), c -> ascii(c)), b -> b // 64 = 2)) AS VARCHAR)
           || ',' || CAST(len(list_filter(list_transform(string_split(text, ''), c -> ascii(c)), b -> b // 64 = 3)) AS VARCHAR)
               AS hist4
    FROM documents
    """,
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over opaque payloads via Arrow-batched
    ``mapInPandas``: per payload — byte count, byte sum (checksum stand-in),
    min/max byte, and a 4-bin byte histogram serialized to a CSV string
    (raw array cells crash the harness canonicalizer). The oracle replays
    the same byte math character-wise — valid because the fixture text is
    verified pure ASCII, so code points == bytes."""
    import numpy as np
    import pandas as pd

    media = as_media(load(spark, sf_dir, "documents"))

    def featurize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> 6, minlength=4)  # 4 bins of 64 values
                rows.append(
                    (
                        int(mid),
                        int(arr.size),
                        int(arr.sum()),
                        int(arr.min()),
                        int(arr.max()),
                        ",".join(str(int(x)) for x in hist),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "byte_sum", "min_byte", "max_byte", "hist4"]
            )

    return media.select("media_id", "payload").mapInPandas(
        featurize,
        "media_id long, n_bytes long, byte_sum long, min_byte int, max_byte int, hist4 string",
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(fi AS INT) AS frame_idx,
           CAST(length(substr(text, CAST(fi AS INT) * 64 + 1, 64)) AS INT) AS frame_len,
           md5(substr(text, CAST(fi AS INT) * 64 + 1, 64)) AS frame_md5
    FROM documents,
         LATERAL unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT), 4)) AS t(fi)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque payloads: split each payload into fixed
    {FRAME_BYTES}-byte 'frames', keep every {FRAME_STRIDE}-th, emit one row
    per sampled frame with its md5 — the exact plumbing shape of video
    frame-sampling (1 input row -> N output rows through ``mapInPandas``).
    Oracle replays the chunking character-wise (fixture text is pure ASCII,
    so substr == byte slicing); DuckDB ``range`` is end-exclusive with step,
    matching Python ``range(0, n_frames, 4)``."""
    import hashlib as _hashlib

    import pandas as pd

    media = as_media(load(spark, sf_dir, "documents"))

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
                for fi in range(0, n_frames, FRAME_STRIDE):
                    chunk = payload[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]
                    out.append(
                        (int(mid), fi, len(chunk), _hashlib.md5(chunk).hexdigest())
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame_len", "frame_md5"])

    return media.select("media_id", "payload").mapInPandas(
        sample, "media_id long, frame_idx int, frame_len int, frame_md5 string"
    )


@query(
    "multimodal_metadata_stats",
    oracle="""
    SELECT COUNT(*) AS n_media,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MIN(octet_length(encode(text))) AS min_bytes,
           MAX(octet_length(encode(text))) AS max_bytes
    FROM documents
    """,
)
def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan: aggregates over the typed-metadata struct WITHOUT
    touching payload bytes — the pattern that matters at 100 TB (metadata
    predicates prune before any payload IO; parquet column pruning keeps the
    binary column unread, visible in the scan's ReadSchema)."""
    media = as_media(load(spark, sf_dir, "documents"))
    return media.select(F.col("meta.n_bytes").alias("nb")).agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("nb").alias("total_bytes"),
        F.min("nb").alias("min_bytes"),
        F.max("nb").alias("max_bytes"),
    )
