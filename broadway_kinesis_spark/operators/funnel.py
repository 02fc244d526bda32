"""Quality-gate funnel audit: the observability layer of a corpus build.

Every large-scale filter pipeline needs to answer "which gate dropped how
much?" — this module computes the sequential per-gate survivor/drop audit
in a single corpus scan. Lives in its own module (not pipeline_ops.py) so
gate changes and pipeline-stage changes stale each other's driver rows only
when they actually share code (per-file staleness rule,
tests/test_registry_window.py).

Reference parity: [TGT] — BASELINE.json north star; no processing surface
in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

FUNNEL_MIN_CHARS = 100   # gate 1: minimum document length
FUNNEL_MIN_TOKENS = 40   # gate 2: minimum token count
FUNNEL_WLEN_MAX10 = 48   # gate 3: mean word length <= 4.8 (x10 integer)
FUNNEL_DISTINCT = (2, 5)  # gate 4: distinct tokens / tokens >= 2/5


@query(
    "pipeline_quality_funnel",
    oracle=f"""
    WITH f AS (
        SELECT CASE WHEN n_chars >= {FUNNEL_MIN_CHARS} THEN 1 ELSE 0 END AS g1,
               CASE WHEN len(string_split(lower(text), ' '))
                        >= {FUNNEL_MIN_TOKENS} THEN 1 ELSE 0 END AS g2,
               CASE WHEN list_sum(list_transform(string_split(lower(text), ' '),
                                                 w -> length(w))) * 10
                        <= {FUNNEL_WLEN_MAX10}
                           * len(string_split(lower(text), ' '))
                    THEN 1 ELSE 0 END AS g3,
               CASE WHEN {FUNNEL_DISTINCT[1]}
                           * len(list_distinct(string_split(lower(text), ' ')))
                        >= {FUNNEL_DISTINCT[0]}
                           * len(string_split(lower(text), ' '))
                    THEN 1 ELSE 0 END AS g4
        FROM documents
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS s0,
               CAST(SUM(g1) AS BIGINT) AS s1,
               CAST(SUM(g1 * g2) AS BIGINT) AS s2,
               CAST(SUM(g1 * g2 * g3) AS BIGINT) AS s3,
               CAST(SUM(g1 * g2 * g3 * g4) AS BIGINT) AS s4
        FROM f
    )
    SELECT 1 AS stage, 'min_chars' AS gate, s0 AS n_in, s1 AS n_out,
           s0 - s1 AS n_dropped FROM s
    UNION ALL SELECT 2, 'min_tokens', s1, s2, s1 - s2 FROM s
    UNION ALL SELECT 3, 'word_shape', s2, s3, s2 - s3 FROM s
    UNION ALL SELECT 4, 'distinct_ratio', s3, s4, s3 - s4 FROM s
    """,
)
def pipeline_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential quality-gate funnel with per-gate audit counts — the
    observability layer every corpus build runs alongside its filters
    (which gate is responsible for how much loss?). Four gates, applied
    in order: minimum length, minimum token count, mean-word-length
    shape, distinct-token ratio; each output row reports the stage's
    input size, survivors, and drops, with n_in(k) == n_out(k-1) by
    construction.

    Exactness: every gate is an integer cross-multiplied predicate (no
    ratios materialized), and the audit is integer counting — nothing to
    round anywhere.

    Scale posture: one shuffle-free projection computes all four flags
    per document, one map-side-combinable aggregation reduces them to a
    single cumulative-survivor row, and the 4-row funnel is unpivoted
    from that row with ``stack`` — the corpus is scanned ONCE no matter
    how many gates the funnel grows."""
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.lower("text"), " ")
    n_tok = F.size(words)
    wlen = F.aggregate(
        F.transform(words, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    n_distinct = F.size(F.array_distinct(words))
    g1 = (F.col("n_chars") >= FUNNEL_MIN_CHARS).cast("int")
    g2 = (n_tok >= FUNNEL_MIN_TOKENS).cast("int")
    g3 = (wlen * 10 <= FUNNEL_WLEN_MAX10 * n_tok).cast("int")
    g4 = (FUNNEL_DISTINCT[1] * n_distinct >= FUNNEL_DISTINCT[0] * n_tok).cast("int")
    flags = docs.select(
        g1.alias("g1"), g2.alias("g2"), g3.alias("g3"), g4.alias("g4")
    )
    s = flags.agg(
        F.count(F.lit(1)).cast("long").alias("s0"),
        F.sum("g1").cast("long").alias("s1"),
        F.sum(F.col("g1") * F.col("g2")).cast("long").alias("s2"),
        F.sum(F.col("g1") * F.col("g2") * F.col("g3")).cast("long").alias("s3"),
        F.sum(F.col("g1") * F.col("g2") * F.col("g3") * F.col("g4"))
        .cast("long")
        .alias("s4"),
    )
    return s.select(
        F.expr(
            "stack(4, "
            "1, 'min_chars',      s0, s1, s0 - s1, "
            "2, 'min_tokens',     s1, s2, s1 - s2, "
            "3, 'word_shape',     s2, s3, s2 - s3, "
            "4, 'distinct_ratio', s3, s4, s3 - s4) "
            "AS (stage, gate, n_in, n_out, n_dropped)"
        )
    )
