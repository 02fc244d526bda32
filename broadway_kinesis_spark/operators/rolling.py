"""Rolling distinct count — the sliding-window cardinality problem.

``COUNT(DISTINCT ...)`` cannot ride a window frame (distinct state is not
a running aggregate), which makes "rolling 7-day active users" one of the
classic awkward operators at scale: the naive plan re-touches W days of
raw events for every output day. This module composes the engine's two
sketch facts instead — HLL sketches are per-group aggregable AND
mergeable (operators/sketch_merge.py) — so raw events are scanned ONCE
into per-day sketches and every rolling window is a union over W
fixed-size blobs. Own module per the per-file staleness rule
(tests/test_registry_window.py).

Reference parity: [TGT] — BASELINE.json north star; no aggregation
surface in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

US_PER_DAY = 86_400_000_000  # one day in microseconds
WINDOW_DAYS = 7              # rolling window width (trailing, inclusive)
LG_K = 12                    # Datasketches lgConfigK → ~1.6% rse
# Assertion slack: lgK=12 gives ~1.6% rse, and ~30 day windows each face
# the band independently — 0.07 (~4.4 sigma) keeps the per-query flip
# probability negligible where 3 sigma would leave ~30 x 0.3% tail risk.
TOL = 0.07


@query(
    "window_rolling_distinct",
    oracle=f"""
    WITH days AS (
        SELECT DISTINCT epoch_us(ts) // {US_PER_DAY} AS day_id FROM events
    )
    SELECT d.day_id,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS exact_users,
           TRUE AS within_tol
    FROM days d
    JOIN events e
      ON epoch_us(e.ts) // {US_PER_DAY}
         BETWEEN d.day_id - {WINDOW_DAYS - 1} AND d.day_id
    GROUP BY d.day_id
    """,
)
def window_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing WINDOW_DAYS (7) day distinct active users per observed
    day — rolling MAU. The hash carries the exact count plus the in-plan
    tolerance boolean asserting the sketch path's estimate (the
    agg_approx_distinct / agg_sketch_merge pattern); the oracle emits
    exact + TRUE.

    Scale posture — the part that matters at 100 TB: the SKETCH path
    touches raw events exactly once (one map-side-combinable aggregation
    to per-day HLL blobs), and the rolling union then runs entirely on
    the day-sketch table — #days rows of fixed-size state, independent
    of event volume, range-self-joined over the trailing window and
    merged with ``hll_union_agg``. Persist the day sketches
    (ann_persist.py posture) and any window width — 7, 28, 90 — is a
    re-union over blobs with zero raw re-reads. The EXACT branch (range
    join against raw events, W-way re-touch) exists only to ground the
    assertion, exactly as in agg_sketch_merge; production serves from
    the sketches."""
    e = load(spark, sf_dir, "events")
    day_id = F.expr(f"unix_micros(ts) div {US_PER_DAY}").alias("day_id")

    # sketch path: ONE pass over events -> per-day sketches (tiny table)
    day_sk = (
        e.select(day_id, "user_id")
        .groupBy("day_id")
        .agg(F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("sk"))
    )
    anchor = day_sk.select(F.col("day_id").alias("d"))
    rolled = (
        anchor.join(
            day_sk,
            (F.col("day_id") >= F.col("d") - (WINDOW_DAYS - 1))
            & (F.col("day_id") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"))
    )

    # exact branch: grounds the assertion (the oracle's plan, verbatim)
    exact = (
        anchor.join(
            e.select(day_id, "user_id"),
            (F.col("day_id") >= F.col("d") - (WINDOW_DAYS - 1))
            & (F.col("day_id") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )

    tol = (
        F.abs(F.col("_est") - F.col("exact_users"))
        / F.col("exact_users").cast("double")
        <= TOL
    )
    return (
        rolled.join(exact, "d")
        .select(
            F.col("d").alias("day_id"),
            F.col("exact_users").cast("long").alias("exact_users"),
            tol.alias("within_tol"),
        )
    )
