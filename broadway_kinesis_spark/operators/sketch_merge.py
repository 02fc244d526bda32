"""Mergeable-sketch partial aggregation — the 100 TB distinct-count shape.

``agg_approx_distinct`` (operators/aggregates.py) asserts the one-shot
HyperLogLog++ estimate. This module asserts the property that actually
matters at cluster scale: HLL sketches are MERGEABLE — partial sketches
built independently per shard (per executor / per day / per file) union
into exactly the sketch a single pass would have built, so distinct
counts compose across partitions, reruns, and time without ever
re-touching raw data. That two-level shape (partial sketch map-side →
union reduce-side) is what Spark's own partial aggregation does
internally; here it is surfaced explicitly through the Datasketches
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``
functions so the sketches themselves could be persisted and rolled up
incrementally (the same train-once/serve-many posture as
operators/ann_persist.py). Own module per the per-file staleness rule
(tests/test_registry_window.py).

Reference parity: [TGT] — BASELINE.json north star; no aggregation
surface in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

N_SHARDS = 8       # explicit partial-sketch shards (per-executor stand-in)
LG_K = 12          # Datasketches lgConfigK → ~1.6% relative std error
TOL = 0.05         # assertion slack: ~3 sigma


@query(
    "agg_sketch_merge",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_orderkey % {N_SHARDS}) AS n_partials,
           COUNT(DISTINCT o_custkey) AS exact_custs,
           TRUE AS within_tol
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level HLL distinct count: per-(status, shard) partial sketches,
    merged per status with ``hll_union_agg``, estimated once at the end.

    Hash-checkable sketch assertion (same pattern as agg_approx_distinct):
    the exact distinct count and the shard count go into the hash; the
    merged estimate is asserted in-plan as ``abs(est-exact)/exact <= TOL``
    (0.05; lgK=12 → ~1.6% rse, so 5% is ~3 sigma). The oracle emits the
    exact count + TRUE. The shard count pins that all N_SHARDS (8)
    partials really existed before the merge — a silent single-level
    fallback would still estimate correctly but fail that column.

    Scale posture: level 1 is map-side combinable on (status, shard) and
    produces N_SHARDS fixed-size sketch blobs per status — the ONLY
    thing that crosses the second shuffle; raw customer keys never reach
    the merge. At 100 TB the shard key is the natural partition (file,
    day, executor), partial sketches land in a metadata store, and any
    rollup window (day → month → all-time) is a union over blobs — zero
    raw-data re-reads. The exact ``countDistinct`` branch here exists
    only to ground the assertion; production serves from the sketch."""
    o = load(spark, sf_dir, "orders")
    shard = (F.col("o_orderkey") % N_SHARDS).alias("shard")
    partials = (
        o.select("o_orderstatus", shard, "o_custkey")
        .groupBy("o_orderstatus", "shard")
        .agg(F.hll_sketch_agg("o_custkey", F.lit(LG_K)).alias("sk"))
    )
    merged = partials.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_partials"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"),
    )
    exact = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_custs")
    )
    tol = (
        F.abs(F.col("_est") - F.col("exact_custs"))
        / F.col("exact_custs").cast("double")
        <= TOL
    )
    return merged.join(exact, "o_orderstatus").select(
        "o_orderstatus", "n_partials", "exact_custs", tol.alias("within_tol")
    )
