"""Mergeable histogram-quantile summaries — percentiles without a sort.

The quantile sibling of ``agg_sketch_merge``'s mergeable-HLL distincts:
at 100 TB you never sort a column to find its p99. You keep a MERGEABLE
summary per shard/day/file — here an equi-width integer histogram, the
deterministic moral equivalent of t-digest/KLL — and answer any quantile
from the merged summary, with error bounded by the bucket width. Partials
compose across shards, runs, and days without re-touching raw data, which
is the entire point (Spark's ``percentile_approx`` sketch is internal and
engine-specific, so its estimates can never hash-match an oracle; this
histogram is exact integer arithmetic end to end).

Two explicit levels over ``events.value``:
1. per-shard partials (shard = ``user_id mod N_SHARDS``, the same
   deterministic stand-in for ingest shards as sketch_merge.py):
   ``(shard, bucket) -> count`` with ``bucket = floor(value / W)``;
2. merge: sum partials per bucket, cumulative-sum in bucket order, and
   report each target quantile as the FIRST bucket whose cumulative count
   reaches ``ceil(q*total/100)`` (exact integer threshold).

Estimate contract: the true rank-quantile lies inside the reported
bucket, so the upper-edge estimate errs by at most W — asserted against
the exact rank quantile in tests (not in the query: the exact branch
would re-sort the data the summary exists to avoid).

Scale posture: level 1 is one map-side-combinable exchange; everything
after operates on ~(N_SHARDS x n_buckets) summary rows — the cumulative
window runs over dozens of rows, not the corpus. The level-1/level-2
split is explicit (not just Spark's internal partial agg) because the
PARTIALS are the persisted artifact at scale.

Reference parity: [TGT] — no relational surface in the reference; engine
extension beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

N_SHARDS = 8
W = 10.0  # bucket width (exact binary double: bucket boundaries agree)
QUANTILES = (50, 90, 99)

_QS_SQL = ", ".join(f"({q})" for q in QUANTILES)


@query(
    "agg_quantile_histogram",
    oracle=f"""
    WITH partials AS (
        SELECT user_id % {N_SHARDS} AS shard,
               CAST(FLOOR(value / {W}) AS BIGINT) AS bucket,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ), merged AS (
        SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS cnt
        FROM partials GROUP BY bucket
    ), cum AS (
        SELECT bucket, cnt,
               CAST(SUM(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum,
               CAST(SUM(cnt) OVER () AS BIGINT) AS total
        FROM merged
    ), qs(q) AS (VALUES {_QS_SQL})
    SELECT q,
           MIN(bucket) AS est_bucket,
           MIN(bucket) * {W} + {W} AS est_upper,
           MIN(total) AS total_count
    FROM qs JOIN cum ON cum.cum >= (q * cum.total + 99) // 100
    GROUP BY q
    """,
)
def agg_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P50/P90/P99 of ``events.value`` from merged per-shard histogram
    partials: each reported quantile is the first bucket whose cumulative
    merged count reaches the exact integer rank threshold; ``est_upper``
    is that bucket's upper edge (true quantile within W below it)."""
    events = load(spark, sf_dir, "events")
    partials = (
        events.select(
            (F.col("user_id") % N_SHARDS).alias("shard"),
            F.floor(F.col("value") / W).cast("long").alias("bucket"),
        )
        .groupBy("shard", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merged = partials.groupBy("bucket").agg(F.sum("cnt").cast("long").alias("cnt"))
    return quantiles_from_histogram(merged, QUANTILES)


def quantiles_from_histogram(hist: DataFrame, quantiles=QUANTILES) -> DataFrame:
    """Answer quantiles from a merged ``(bucket, cnt)`` histogram — the
    exact integer threshold rule (first bucket whose cumulative count
    reaches ``ceil(q*total/100)``). ONE implementation shared by the batch
    operator above and the streaming state's ``serve_quantiles``
    (streaming/histogram_state.py) so the rule can never diverge between
    the two (the candidate_gen.py lesson). Runs on summary-sized rows."""
    spark = hist.sparkSession
    cum = hist.select(
        "bucket",
        "cnt",
        F.sum("cnt").over(Window.orderBy("bucket")).cast("long").alias("cum"),
        F.sum("cnt").over(
            Window.partitionBy()  # summary-sized: dozens of rows
        ).cast("long").alias("total"),
    )
    qs = spark.createDataFrame([(q,) for q in quantiles], "q int")
    thresh = F.expr("(q * total + 99) div 100")
    return (
        cum.join(F.broadcast(qs), F.col("cum") >= thresh)
        .groupBy("q")
        .agg(
            F.min("bucket").alias("est_bucket"),
            (F.min("bucket") * W + W).alias("est_upper"),
            F.min("total").alias("total_count"),
        )
    )
