"""Exact per-group winsorization (quantile clipping) of a numeric column.

The standard robust-statistics guard in feature/metrics pipelines: clamp a
long-tailed value to its per-group [p05, p95] band before aggregation so
a handful of outliers (bot bursts, price glitches, unit errors) cannot
dominate a mean or a trained normalizer. Applied per ``event_type`` over
``events.value``.

Exactness: NO interpolated percentile anywhere — interpolation rules (and
approx-percentile sketches) differ between engines. A quantile here is
defined by RANK: order the group by (value, event_id) and take the value
at row ceil(q*n), computed as the exact integer ``(q*n + 99) div 100``.
Clamping then compares raw doubles — every output value is one of the
input doubles, so the hash cannot drift.

Scale posture: one exchange total. The ranking window partitions on
``event_type``; the per-group bounds reduce THE SAME partitioning (no
second exchange), and the bounds table (one row per group) broadcasts
back onto the ranked rows — at 100 TB this is scan + window + broadcast
join, and the skew concern lives where it should: a single giant group
serializes its sort, which is when you switch the bound computation to
the mergeable histogram summaries next door (operators/quantiles.py).

Reference parity: [TGT] — no relational surface in the reference; engine
extension beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

Q_LO, Q_HI = 5, 95  # winsorization band, in percent


@query(
    "window_winsorize",
    oracle=f"""
    WITH ranked AS (
        SELECT event_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ), bounds AS (
        SELECT event_type,
               MIN(CASE WHEN rn = ({Q_LO} * n + 99) // 100 THEN value END) AS p_lo,
               MIN(CASE WHEN rn = ({Q_HI} * n + 99) // 100 THEN value END) AS p_hi
        FROM ranked GROUP BY event_type
    )
    SELECT event_id, e.event_type, value,
           CASE WHEN value < p_lo THEN p_lo
                WHEN value > p_hi THEN p_hi
                ELSE value END AS value_w,
           CASE WHEN value < p_lo THEN 'lo'
                WHEN value > p_hi THEN 'hi'
                ELSE 'in' END AS clip
    FROM events e JOIN bounds USING (event_type)
    """,
)
def window_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamp every event's value into its event_type's exact rank-defined
    [p{Q_LO}, p{Q_HI}] band; ``clip`` records which side (if any) clamped.
    Bounds come from the same window pass that ranks the rows — one
    exchange, then a broadcast join-back."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = events.select("event_id", "event_type", "value").withColumn(
        "rn", F.row_number().over(w)
    ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("event_type")))
    lo_rank = F.expr(f"({Q_LO} * n + 99) div 100")
    hi_rank = F.expr(f"({Q_HI} * n + 99) div 100")
    bounds = ranked.groupBy("event_type").agg(
        F.min(F.when(F.col("rn") == lo_rank, F.col("value"))).alias("p_lo"),
        F.min(F.when(F.col("rn") == hi_rank, F.col("value"))).alias("p_hi"),
    )
    e = events.select("event_id", "event_type", "value")
    return e.join(F.broadcast(bounds), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.when(F.col("value") < F.col("p_lo"), F.col("p_lo"))
        .when(F.col("value") > F.col("p_hi"), F.col("p_hi"))
        .otherwise(F.col("value"))
        .alias("value_w"),
        F.when(F.col("value") < F.col("p_lo"), F.lit("lo"))
        .when(F.col("value") > F.col("p_hi"), F.lit("hi"))
        .otherwise(F.lit("in"))
        .alias("clip"),
    )


# -- the scale path: histogram-bounded winsorization -------------------------

W_BIN = 10.0  # bucket width for the binned variant (binary-exact double)


@query(
    "window_winsorize_binned",
    oracle=f"""
    WITH hist AS (
        SELECT event_type,
               CAST(FLOOR(value / {W_BIN}) AS BIGINT) AS bucket,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ), cum AS (
        SELECT event_type, bucket, cnt,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
               SUM(cnt) OVER (PARTITION BY event_type) AS n
        FROM hist
    ), bounds AS (
        SELECT event_type,
               MIN(CASE WHEN cum >= ({Q_LO} * n + 99) // 100
                        THEN bucket END) * {W_BIN} AS lo_edge,
               (MIN(CASE WHEN cum >= ({Q_HI} * n + 99) // 100
                         THEN bucket END) + 1) * {W_BIN} AS hi_edge
        FROM cum GROUP BY event_type
    )
    SELECT event_id, e.event_type, value,
           CASE WHEN value < lo_edge THEN lo_edge
                WHEN value > hi_edge THEN hi_edge
                ELSE value END AS value_w,
           CASE WHEN value < lo_edge THEN 'lo'
                WHEN value > hi_edge THEN 'hi'
                ELSE 'in' END AS clip
    FROM events e JOIN bounds USING (event_type)
    """,
)
def window_winsorize_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path the exact variant's docstring promises for skewed
    groups: winsorize against per-group HISTOGRAM quantile bounds instead
    of a per-group sort. Bounds snap to bucket edges — the p{Q_LO} bucket's
    LOWER edge and the p{Q_HI} bucket's UPPER edge, so every value the
    exact variant keeps is also kept here (the band only widens, by at
    most one bucket width per side — the conservative direction for a
    clipping guard).

    Plan shape: one map-side-combinable (group, bucket) aggregation —
    rows never sort, a single giant group costs the same as a small one —
    then a cumulative window over SUMMARY-sized rows and a broadcast
    join-back. Same two-level mergeable-summary machinery as
    operators/quantiles.py, applied per group."""
    events = load(spark, sf_dir, "events")
    hist = (
        events.select(
            "event_type",
            F.floor(F.col("value") / W_BIN).cast("long").alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wcum = Window.partitionBy("event_type").orderBy("bucket")
    wall = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "bucket",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    lo_rank = F.expr(f"({Q_LO} * n + 99) div 100")
    hi_rank = F.expr(f"({Q_HI} * n + 99) div 100")
    bounds = cum.groupBy("event_type").agg(
        (F.min(F.when(F.col("cum") >= lo_rank, F.col("bucket"))) * W_BIN).alias(
            "lo_edge"
        ),
        ((F.min(F.when(F.col("cum") >= hi_rank, F.col("bucket"))) + 1) * W_BIN).alias(
            "hi_edge"
        ),
    )
    e = events.select("event_id", "event_type", "value")
    return e.join(F.broadcast(bounds), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.when(F.col("value") < F.col("lo_edge"), F.col("lo_edge"))
        .when(F.col("value") > F.col("hi_edge"), F.col("hi_edge"))
        .otherwise(F.col("value"))
        .alias("value_w"),
        F.when(F.col("value") < F.col("lo_edge"), F.lit("lo"))
        .when(F.col("value") > F.col("hi_edge"), F.lit("hi"))
        .otherwise(F.lit("in"))
        .alias("clip"),
    )
