"""As-of join (SURVEY.md §2.B "Join: as-of").

Spark has no native ASOF JOIN (DuckDB does — the oracle uses it). The
scalable re-expression used here is the *union-merge* trick:

1. tag both sides and union them on (key, event-time, tag);
2. one window pass per key ordered by (time, tag) carries the most recent
   right-side row forward with ``last(..., ignorenulls=True)``;
3. keep only left-side rows.

Cost model at 100 TB: exactly one shuffle (hash-partition by key) plus an
in-partition sort — identical to the sort-merge join Spark would run for a
plain equi-join, and crucially NOT the range-join explosion you get from
``l.t >= r.t`` as a join predicate (which Catalyst plans as BroadcastNestedLoop
/ cartesian-per-key: quadratic in events-per-key).

Tie semantics match DuckDB ``ASOF JOIN ... ON l.k = r.k AND l.t >= r.t``:
a right row at exactly l.t is eligible (right tag sorts before left tag at
equal time), and the right side is pre-deduplicated to one row per (key,
time) — ``max(event_id)`` wins — so the match is deterministic in both
engines.

Event-time is compared as integer epoch-microseconds on BOTH sides
(``unix_micros`` / ``epoch_us``): the parquet fixture stores TIMESTAMP(NS),
which Spark floors to µs at load while DuckDB keeps ns — comparing raw
timestamps would let a sub-µs residue flip an `>=` at the boundary.

Reference parity note: the reference (mbta/broadway_kinesis) has no joins at
all — `SURVEY.md §2.B` marks this row [TGT], required by the driver harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load


@query(
    "asof_join",
    oracle="""
    WITH v AS (
        SELECT user_id AS k, epoch_us(ts) AS t,
               MAX(event_id) AS view_id,
               ARG_MAX(value, event_id) AS view_value
        FROM events
        WHERE event_type = 'view'
        GROUP BY 1, 2
    ), p AS (
        SELECT user_id, epoch_us(ts) AS t, event_id AS purchase_id
        FROM events
        WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, p.t AS purchase_us, v.view_id, v.view_value
    FROM p ASOF LEFT JOIN v ON p.user_id = v.k AND p.t >= v.t
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the most recent view event at-or-before it
    by the same user (nearest-earlier match per key) — left as-of join."""
    ev = load(spark, sf_dir, "events")

    view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(
            F.col("user_id").alias("k"),
            F.unix_micros("ts").alias("t"),
        )
        .agg(
            F.max("event_id").alias("view_id"),
            F.max_by("value", "event_id").alias("view_value"),
        )
        .select("k", "t", F.lit(0).alias("tag"), F.lit(None).cast("long").alias("purchase_id"), "view_id", "view_value")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"),
        F.unix_micros("ts").alias("t"),
        F.lit(1).alias("tag"),
        F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("long").alias("view_id"),
        F.lit(None).cast("double").alias("view_value"),
    )

    merged = view.unionByName(purch)
    w = (
        Window.partitionBy("k")
        .orderBy("t", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("m_view_id", F.last("view_id", ignorenulls=True).over(w))
        .withColumn("m_view_value", F.last("view_value", ignorenulls=True).over(w))
        .filter(F.col("tag") == 1)
        .select(
            "purchase_id",
            F.col("k").alias("user_id"),
            F.col("t").alias("purchase_us"),
            F.col("m_view_id").alias("view_id"),
            F.col("m_view_value").alias("view_value"),
        )
    )


US_PER_MIN = 60_000_000
TOL_MIN = 30  # tolerance: match only a view within the last 30 minutes


@query(
    "asof_join_tolerance",
    oracle=f"""
    WITH v AS (
        SELECT user_id AS k, epoch_us(ts) AS t,
               MAX(event_id) AS view_id
        FROM events
        WHERE event_type = 'view'
        GROUP BY 1, 2
    ), p AS (
        SELECT user_id, epoch_us(ts) AS t, event_id AS purchase_id
        FROM events
        WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, p.t AS purchase_us,
           CASE WHEN p.t - v.t <= {TOL_MIN * US_PER_MIN}
                THEN v.view_id END AS view_id,
           CASE WHEN p.t - v.t <= {TOL_MIN * US_PER_MIN}
                THEN p.t - v.t END AS gap_us,
           v.view_id IS NOT NULL
               AND p.t - v.t <= {TOL_MIN * US_PER_MIN} AS attributed
    FROM p ASOF LEFT JOIN v ON p.user_id = v.k AND p.t >= v.t
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE bound (pandas ``merge_asof(tolerance=)``
    semantics, the attribution-window shape): the nearest-earlier view
    matches only if it happened within {TOL_MIN} minutes of the purchase —
    older matches report NULL, and ``attributed`` flags the accepted ones.

    Same single-shuffle union-merge as :func:`asof_join`; the tolerance is
    a post-window projection (carry the matched view TIME forward too,
    then null out matches whose gap exceeds the bound), so the cost model
    is unchanged — the bound never becomes a range-join predicate."""
    ev = load(spark, sf_dir, "events")
    tol_us = TOL_MIN * US_PER_MIN

    view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(
            F.col("user_id").alias("k"),
            F.unix_micros("ts").alias("t"),
        )
        .agg(F.max("event_id").alias("view_id"))
        .select(
            "k", "t", F.lit(0).alias("tag"),
            F.lit(None).cast("long").alias("purchase_id"), "view_id",
        )
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"),
        F.unix_micros("ts").alias("t"),
        F.lit(1).alias("tag"),
        F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("long").alias("view_id"),
    )
    merged = view.unionByName(purch).withColumn(
        "view_t", F.when(F.col("tag") == 0, F.col("t"))
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Window expressions MUST be materialized as columns BEFORE the
    # tag filter: referencing `last(view_t).over(w)` in the post-filter
    # select would re-evaluate the window over purchase-only rows (all
    # view_t NULL) and silently unattribute everything.
    gap = F.col("t") - F.last("view_t", ignorenulls=True).over(w)
    m_view = F.last("view_id", ignorenulls=True).over(w)
    in_tol = F.col("gap_raw") <= tol_us
    return (
        merged.withColumn("gap_raw", gap)
        .withColumn("m_view_id", m_view)
        .filter(F.col("tag") == 1)
        .select(
            "purchase_id",
            F.col("k").alias("user_id"),
            F.col("t").alias("purchase_us"),
            F.when(in_tol, F.col("m_view_id")).alias("view_id"),
            F.when(in_tol, F.col("gap_raw")).alias("gap_us"),
            (
                F.col("m_view_id").isNotNull()
                & F.coalesce(in_tol, F.lit(False))
            ).alias("attributed"),
        )
    )


@query(
    "asof_join_forward",
    oracle="""
    WITH p AS (
        SELECT user_id AS k, epoch_us(ts) AS t,
               MAX(event_id) AS purchase_id
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ), v AS (
        SELECT user_id, epoch_us(ts) AS t, event_id AS view_id
        FROM events
        WHERE event_type = 'view'
    )
    SELECT v.view_id, v.user_id, v.t AS view_us, p.purchase_id,
           p.t - v.t AS lead_us
    FROM v ASOF LEFT JOIN p ON v.user_id = p.k AND v.t <= p.t
    """,
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of (pandas ``merge_asof(direction='forward')``): for
    every view event, the EARLIEST purchase at-or-after it by the same
    user, with the conversion lead time — the time-to-convert shape.

    Same single-shuffle union-merge as :func:`asof_join`, run in reverse:
    one window per key ordered by (t DESC, tag) carries the nearest
    LATER purchase backward with ``last(..., ignorenulls=True)``. A
    purchase at exactly v.t is eligible (purchase tag sorts first at
    equal time in the descending order), and the right side is
    pre-deduplicated to one row per (key, time) — ``max(event_id)`` —
    matching the backward operator's tie convention."""
    ev = load(spark, sf_dir, "events")

    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.col("user_id").alias("k"),
            F.unix_micros("ts").alias("t"),
        )
        .agg(F.max("event_id").alias("purchase_id"))
        .select(
            "k", "t", F.lit(0).alias("tag"),
            F.lit(None).cast("long").alias("view_id"), "purchase_id",
        )
    )
    view = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("k"),
        F.unix_micros("ts").alias("t"),
        F.lit(1).alias("tag"),
        F.col("event_id").alias("view_id"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    merged = purch.unionByName(view).withColumn(
        "purchase_t", F.when(F.col("tag") == 0, F.col("t"))
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.desc("t"), F.asc("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # materialize window columns BEFORE the tag filter (same trap as the
    # tolerance variant: post-filter evaluation would see view-only rows)
    m_pid = F.last("purchase_id", ignorenulls=True).over(w)
    lead = F.last("purchase_t", ignorenulls=True).over(w) - F.col("t")
    return (
        merged.withColumn("m_purchase_id", m_pid)
        .withColumn("lead_raw", lead)
        .filter(F.col("tag") == 1)
        .select(
            "view_id",
            F.col("k").alias("user_id"),
            F.col("t").alias("view_us"),
            F.col("m_purchase_id").alias("purchase_id"),
            F.col("lead_raw").alias("lead_us"),
        )
    )


@query(
    "asof_join_nearest",
    oracle="""
    WITH v AS (
        SELECT user_id AS k, epoch_us(ts) AS t,
               MAX(event_id) AS view_id
        FROM events
        WHERE event_type = 'view'
        GROUP BY 1, 2
    ), p AS (
        SELECT user_id, epoch_us(ts) AS t, event_id AS purchase_id
        FROM events
        WHERE event_type = 'purchase'
    ), back AS (
        SELECT p.purchase_id, p.user_id, p.t,
               v.view_id AS b_id, p.t - v.t AS b_gap
        FROM p ASOF LEFT JOIN v ON p.user_id = v.k AND p.t >= v.t
    ), fwd AS (
        SELECT p.purchase_id, v.view_id AS f_id, v.t - p.t AS f_gap
        FROM p ASOF LEFT JOIN v ON p.user_id = v.k AND p.t < v.t
    )
    SELECT back.purchase_id, back.user_id, back.t AS purchase_us,
           CASE WHEN b_id IS NOT NULL AND (f_id IS NULL OR b_gap <= f_gap)
                THEN b_id ELSE f_id END AS view_id,
           CASE WHEN b_id IS NOT NULL AND (f_id IS NULL OR b_gap <= f_gap)
                THEN b_gap ELSE f_gap END AS abs_gap_us
    FROM back JOIN fwd ON back.purchase_id = fwd.purchase_id
    """,
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of (pandas ``merge_asof(direction='nearest')``): for
    every purchase, the view closest in time by the same user, in EITHER
    direction; equidistant candidates resolve backward (pandas' rule). A
    view at exactly the purchase time is a backward match with gap 0.

    Still one shuffle: BOTH direction passes are windows over the SAME
    (key) partitioning of the same union — Catalyst plans one exchange
    feeding two sorts (t ASC / t DESC). The oracle composes DuckDB's
    backward (>=) and strictly-forward (<) ASOF joins with the same
    tie-break CASE."""
    ev = load(spark, sf_dir, "events")

    view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(
            F.col("user_id").alias("k"),
            F.unix_micros("ts").alias("t"),
        )
        .agg(F.max("event_id").alias("view_id"))
        .select(
            "k", "t", F.lit(0).alias("tag"),
            F.lit(None).cast("long").alias("purchase_id"), "view_id",
        )
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"),
        F.unix_micros("ts").alias("t"),
        F.lit(1).alias("tag"),
        F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("long").alias("view_id"),
    )
    merged = view.unionByName(purch).withColumn(
        "view_t", F.when(F.col("tag") == 0, F.col("t"))
    )
    wb = (
        Window.partitionBy("k")
        .orderBy("t", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # strictly-forward: views at the SAME time must not win the forward
    # pass (they are backward matches) — purchase tag 1 sorts BEFORE the
    # equal-time view's tag 0 in (t DESC, tag DESC) order
    wf = (
        Window.partitionBy("k")
        .orderBy(F.desc("t"), F.desc("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    b_id = F.last("view_id", ignorenulls=True).over(wb)
    b_gap = F.col("t") - F.last("view_t", ignorenulls=True).over(wb)
    f_id = F.last("view_id", ignorenulls=True).over(wf)
    f_gap = F.last("view_t", ignorenulls=True).over(wf) - F.col("t")
    back_wins = F.col("b_id").isNotNull() & (
        F.col("f_id").isNull() | (F.col("b_gap") <= F.col("f_gap"))
    )
    return (
        merged.withColumn("b_id", b_id)
        .withColumn("b_gap", b_gap)
        .withColumn("f_id", f_id)
        .withColumn("f_gap", f_gap)
        .filter(F.col("tag") == 1)
        .select(
            "purchase_id",
            F.col("k").alias("user_id"),
            F.col("t").alias("purchase_us"),
            F.when(back_wins, F.col("b_id")).otherwise(F.col("f_id")).alias("view_id"),
            F.when(back_wins, F.col("b_gap"))
            .otherwise(F.col("f_gap"))
            .alias("abs_gap_us"),
        )
    )
