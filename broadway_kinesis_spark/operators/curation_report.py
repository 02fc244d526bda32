"""Per-source curation report — the round-6 composite.

Composes the span-granularity dedup exposure (``dedup_substring_spans``)
with exact-duplicate detection into the per-SOURCE rollup a corpus owner
actually reads: how big is each source, how much of it is exact-dup, how
much of its token mass is covered by cross-document spans. This is the
decision table behind "drop source X / mask source Y" — the report stage
every curation pipeline ends with, and a live composition proof that the
round-6 operators stack (the `composite.py` pattern applied to the new
family).

Hash-exactness: every aggregated quantity is an INTEGER sum (doc counts,
token counts, masked-token counts); the two ratios are single divisions
of exact integers with identical expression shape in both engines, so
partial-aggregation order can never flip the driver hash — the ratio-of-
sums form is chosen over mean-of-ratios precisely because averaging
per-doc doubles would be order-sensitive.

Scale posture: inherits the span operator's shape (one span-key shuffle,
one doc rollup), adds a corpus-wide md5 exact-dup flag (one exchange on
the text hash — the ``dedup_exact_docs`` shape), and ends in a 20-group
rollup. No Python, no cartesian, no data-sized window.

Reference parity: [TGT] — engine extension (SURVEY §2.B composite
family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.operators.substring_spans import (
    K_SPAN,
    MIN_DOCS,
    dedup_substring_spans,
)
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load


@query(
    "composite_curation_report",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents
    ), spans AS (
        SELECT doc_id, i AS pos,
               array_to_string(l[CAST(i + 1 AS INTEGER):CAST(i + {K_SPAN} AS INTEGER)], ' ') AS span
        FROM (SELECT doc_id, l, UNNEST(range(0, len(l) - {K_SPAN} + 1)) AS i
              FROM tok)
    ), shared AS (
        SELECT span FROM spans GROUP BY span
        HAVING COUNT(DISTINCT doc_id) >= {MIN_DOCS}
    ), flagged AS (
        SELECT s.doc_id, s.pos FROM spans s JOIN shared sh ON s.span = sh.span
    ), masked AS (
        SELECT doc_id, CAST(COUNT(DISTINCT t) AS BIGINT) AS n_masked
        FROM (SELECT doc_id, UNNEST(range(pos, pos + {K_SPAN})) AS t
              FROM flagged)
        GROUP BY doc_id
    ), dup AS (
        SELECT doc_id,
               COUNT(*) OVER (PARTITION BY md5(text)) > 1 AS is_dup
        FROM documents
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN dup.is_dup THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exact_dup_docs,
           CAST(SUM(CASE WHEN COALESCE(m.n_masked, 0) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_span_exposed_docs,
           CAST(SUM(len(string_split(lower(d.text), ' '))) AS BIGINT)
               AS total_tokens,
           CAST(SUM(COALESCE(m.n_masked, 0)) AS BIGINT) AS masked_tokens,
           CAST(SUM(COALESCE(m.n_masked, 0)) AS DOUBLE)
               / SUM(len(string_split(lower(d.text), ' '))) AS masked_ratio,
           CAST(SUM(CASE WHEN dup.is_dup THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS dup_ratio
    FROM documents d
    JOIN dup ON d.doc_id = dup.doc_id
    LEFT JOIN masked m ON d.doc_id = m.doc_id
    GROUP BY d.source
    """,
)
def composite_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation decision table: size, exact-dup share, span
    exposure, and the token mass covered by cross-document spans — all
    integer sums, ratios as single exact divisions."""
    docs = load(spark, sf_dir, "documents")
    spans = dedup_substring_spans(spark, sf_dir).select(
        "doc_id", "n_tokens", "n_masked_tokens"
    )
    is_dup = (
        F.count(F.lit(1)).over(Window.partitionBy(F.md5("text"))) > 1
    ).alias("is_dup")
    flagged = docs.select("doc_id", "source", is_dup)
    joined = flagged.join(spans, "doc_id")
    dup_n = F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).cast("long")
    masked_n = F.sum("n_masked_tokens").cast("long")
    tok_n = F.sum("n_tokens").cast("long")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        dup_n.alias("n_exact_dup_docs"),
        F.sum(F.when(F.col("n_masked_tokens") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_span_exposed_docs"),
        tok_n.alias("total_tokens"),
        masked_n.alias("masked_tokens"),
        (masked_n.cast("double") / tok_n).alias("masked_ratio"),
        (dup_n.cast("double") / F.count(F.lit(1))).alias("dup_ratio"),
    )
