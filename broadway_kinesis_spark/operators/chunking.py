"""Overlapping sliding-window document chunking — RAG/embedding prep.

The other chunking policy next to ``pack_sequences`` (which concatenates
documents INTO fixed budgets for pretraining): retrieval pipelines split
each document into OVERLAPPING windows — chunk k covers words
``[k·STRIDE, k·STRIDE + CHUNK_W)`` — so no query-relevant span is ever
cut at a hard boundary. Every embedding/RAG corpus build runs exactly
this before the encoder.

Shape: the chunk index materializes as ``sequence(0, n_chunks-1)``
exploded against the word array, and each chunk is ``slice(words, ...)``
rejoined — pure built-in higher-order array functions, whole-stage
codegen, NO Python. ``n_chunks = 1 + max(0, ceil((n_words - CHUNK_W) /
STRIDE))`` (every document yields at least one chunk; the last chunk may
be short; a final window is emitted only if it covers words beyond the
previous one).

Exactness: integer word arithmetic; the chunk text is a deterministic
single-space rejoin (same contract as paragraphs.py's chunker — multi-
space runs do not round-trip, which is irrelevant to the retrieval use
and identical in both engines).

Scale posture: stateless per-document projection — zero exchanges, the
same embarrassingly-parallel class as the classifier scoring pass. Output
grows by the overlap factor (CHUNK_W/STRIDE), which is the knob the
docstring exposes, not a hidden blow-up.

Reference parity: [TGT] — no text surface in the reference; engine
extension beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

CHUNK_W = 32  # words per chunk
STRIDE = 24  # words between chunk starts (CHUNK_W - STRIDE = 8 overlap)


@query(
    "text_chunk_overlap",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, string_split(lower(text), ' ') AS words,
               len(string_split(lower(text), ' ')) AS n_words
        FROM documents
    ), n AS (
        SELECT doc_id, words, n_words,
               1 + GREATEST(0,
                   CAST(CEIL(CAST(n_words - {CHUNK_W} AS DOUBLE)
                             / {STRIDE}) AS BIGINT)) AS n_chunks
        FROM w
    )
    SELECT doc_id,
           CAST(k AS BIGINT) AS chunk_id,
           CAST(k * {STRIDE} AS BIGINT) AS start_word,
           CAST(LEAST(n_words - k * {STRIDE}, {CHUNK_W}) AS BIGINT)
               AS chunk_words,
           array_to_string(
               list_slice(words, k * {STRIDE} + 1, k * {STRIDE} + {CHUNK_W}),
               ' ') AS chunk_text
    FROM n, UNNEST(generate_series(0, n_chunks - 1)) AS t(k)
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into {CHUNK_W}-word chunks at a {STRIDE}-word
    stride (8-word overlap): (doc_id, chunk_id, start_word, chunk_words,
    chunk_text). One stateless projection, no shuffle."""
    docs = load(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        F.split(F.lower("text"), " ").alias("words"),
        F.size(F.split(F.lower("text"), " ")).alias("n_words"),
    )
    n_chunks = 1 + F.greatest(
        F.lit(0),
        F.ceil((F.col("n_words") - CHUNK_W).cast("double") / STRIDE).cast("long"),
    )
    chunks = w.withColumn("n_chunks", n_chunks).select(
        "doc_id",
        "words",
        "n_words",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("k"),
    )
    start = F.col("k") * STRIDE
    return chunks.select(
        "doc_id",
        F.col("k").cast("long").alias("chunk_id"),
        start.cast("long").alias("start_word"),
        F.least(F.col("n_words") - start, F.lit(CHUNK_W))
        .cast("long")
        .alias("chunk_words"),
        F.array_join(
            F.slice(F.col("words"), start + 1, CHUNK_W), " "
        ).alias("chunk_text"),
    )
