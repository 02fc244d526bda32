"""Window-function operators (SURVEY.md §2.B "Window" rows).

``Window.partitionBy(...).orderBy(...)`` — one shuffle on the partition
keys, then a per-partition sort; Spark's WindowExec streams frames without
materializing the whole partition where the frame allows. Determinism
rules for the oracle hash: ranking orders always end in a unique key
tiebreak; running doubles go through decimal stabilization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.functions.numeric import lsum, sql_lsum
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

_DEC = "decimal(38,8)"


@query(
    "window_ranking",
    oracle="""
    SELECT p_partkey, p_brand, p_size,
           RANK()        OVER (PARTITION BY p_brand ORDER BY p_size) AS rnk,
           DENSE_RANK()  OVER (PARTITION BY p_brand ORDER BY p_size) AS drnk,
           ROW_NUMBER()  OVER (PARTITION BY p_brand ORDER BY p_size, p_partkey) AS rn,
           NTILE(4)      OVER (PARTITION BY p_brand ORDER BY p_size, p_partkey) AS quartile
    FROM part
    WHERE p_size <= 10
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank over a tie-heavy ordering (deterministic for ties);
    row_number/ntile get a unique-key tiebreak so output is stable."""
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    by_size = Window.partitionBy("p_brand").orderBy("p_size")
    stable = Window.partitionBy("p_brand").orderBy("p_size", "p_partkey")
    return p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.rank().over(by_size).alias("rnk"),
        F.dense_rank().over(by_size).alias("drnk"),
        F.row_number().over(stable).alias("rn"),
        F.ntile(4).over(stable).alias("quartile"),
    )


@query(
    "window_analytic",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           LAG(o_totalprice)  OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
    FROM orders
    WHERE o_custkey <= 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last over an explicit frame. Doubles pass through
    unchanged (no arithmetic) so no stabilization needed."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(full).alias("last_order"),
    )


@query(
    "window_running",
    oracle="""
    SELECT event_id, user_id, value,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(38,8))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS running_total,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(38,8))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS DOUBLE)
             / COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg_3
    FROM events
    WHERE user_id <= 20
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + 3-row moving average (frame-bounded running aggs).

    Decimal-stabilized: window sums accumulate in a different order in
    DuckDB (segment tree) than Spark (streaming frame) — exact decimal
    addition makes both identical.
    """
    e = load(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last3 = w.rowsBetween(-2, Window.currentRow)
    dec_val = F.col("value").cast(_DEC)
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.round(F.sum(dec_val).over(running), 4).cast("double").alias("running_total"),
        (F.round(F.sum(dec_val).over(last3), 4).cast("double") / F.count(F.lit(1)).over(last3)).alias(
            "moving_avg_3"
        ),
    )


@query(
    "window_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 5
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number ≤ k — the scalable top-k: partial
    top-k per partition before the shuffle (Spark pushes the rank filter
    into a WindowGroupLimit), never a global sort."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_orderpriority", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH stage AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t_signup,
               MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
        FROM events
        GROUP BY user_id
    )
    SELECT
        COUNT(*) AS n_users,
        COUNT(t_signup) AS n_signed_up,
        COUNT(CASE WHEN t_click > t_signup THEN 1 END) AS n_clicked_after,
        COUNT(CASE WHEN t_purchase > t_click AND t_click > t_signup THEN 1 END)
            AS n_converted
    FROM stage
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup -> first click -> first purchase): one
    conditional-min aggregate per user (single shuffle), then ordering
    predicates over the stage timestamps — the standard funnel rewrite that
    avoids per-user event sorting entirely. Null propagation does the
    drop-out accounting (a missing stage yields NULL, failing the > test in
    both engines identically). Integer epoch-µs as everywhere."""
    e = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    stage = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", us)).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", us)).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("t_purchase"),
    )
    return stage.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_signup").alias("n_signed_up"),
        F.count(F.when(F.col("t_click") > F.col("t_signup"), 1)).alias("n_clicked_after"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_signup")),
                1,
            )
        ).alias("n_converted"),
    )


@query(
    "window_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           percent_rank() OVER w AS pr,
           cume_dist()   OVER w AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank ((rank-1)/(n-1)) and
    cume_dist (rows<=current / n) per market segment ordered by balance.
    Both are small-integer divisions evaluated identically in IEEE double
    on both engines, so no rounding is needed. Ties share a value by
    definition, making the result deterministic without a tiebreak."""
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


_HR_US = 3_600_000_000  # one hour in epoch-µs


@query(
    "window_forward_fill",
    oracle=f"""
    WITH agg AS (
        SELECT user_id, epoch_us(ts) // {_HR_US} AS hr,
               COUNT(*) AS n_events,
               {sql_lsum("value", "hour_value")}
        FROM events
        WHERE user_id < 40
        GROUP BY 1, 2
    ), b AS (
        SELECT user_id, MIN(hr) AS h0, MAX(hr) AS h1 FROM agg GROUP BY user_id
    ), spine AS (
        SELECT user_id, UNNEST(range(h0, h1 + 1)) AS hr FROM b
    )
    SELECT s.user_id, s.hr,
           COALESCE(a.n_events, 0) AS n_events,
           last_value(a.hour_value IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.hr
                     ROWS UNBOUNDED PRECEDING) AS locf_value
    FROM spine s LEFT JOIN agg a ON s.user_id = a.user_id AND s.hr = a.hr
    """,
)
def window_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap fill: per-user HOURLY buckets over each
    user's own [first, last] hour, empty hours filled by last-observation-
    carried-forward (LOCF) — the standard densification step before
    training on regularly-sampled series.

    Shape: one aggregate per (user, hour); the spine is generated IN-PLAN
    from per-user bounds via ``sequence``+``explode`` (no driver-side range
    materialization); the left join is an equi-join on (user, hour); LOCF is
    ``last(ignorenulls)`` over an unbounded-preceding row frame — one
    shuffle on user for the spine + window. Spine size = users x their own
    span (never global min..max x all users), so sparse users stay cheap at
    scale. Integer-hour bucket math; first spine row always has data (the
    span starts at an observed hour), so locf_value is never NULL."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    hr = (F.unix_micros("ts") / _HR_US).cast("long")
    agg = e.groupBy("user_id", hr.alias("hr")).agg(
        F.count(F.lit(1)).alias("n_events"),
        lsum("value", "hour_value"),
    )
    bounds = agg.groupBy("user_id").agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    spine = bounds.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("hr")
    )
    joined = spine.join(
        agg.select(F.col("user_id").alias("a_uid"), F.col("hr").alias("a_hr"), "n_events", "hour_value"),
        (F.col("user_id") == F.col("a_uid")) & (F.col("hr") == F.col("a_hr")),
        "left",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hr",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("hour_value", ignorenulls=True).over(w).alias("locf_value"),
    )


_30MIN_US_W = 30 * 60 * 1_000_000


@query(
    "window_time_range",
    oracle=f"""
    SELECT user_id, event_id, t_us,
           COUNT(*) OVER w AS n_30m,
           CAST(SUM(sv) OVER w AS DOUBLE) / 1000000.0 AS sum_30m
    FROM (
        SELECT user_id, event_id, epoch_us(ts) AS t_us,
               CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS sv
        FROM events WHERE user_id < 25
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY t_us
                 RANGE BETWEEN {_30MIN_US_W} PRECEDING AND CURRENT ROW)
    """,
)
def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per event, count and sum of the same
    user's events in the TRAILING 30 minutes — the frame is bounded by the
    ORDER-BY VALUE (epoch-µs), not a row count, so the aggregate window
    stretches and shrinks with event density (the moving-aggregate shape
    ROWS frames cannot express). Scaled-long value sums keep the frame
    arithmetic exact: the per-frame long sum casts to double losslessly
    (bounded by frame size x max scaled value << 2^53), and /1e6 matches
    the oracle's expression shape. One shuffle on user_id; in-partition
    sort; rows with equal t_us share a frame in both engines (RANGE peers).
    """
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    base = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t_us"),
        F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long").alias("sv"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(-_30MIN_US_W, Window.currentRow)
    )
    return base.select(
        "user_id",
        "event_id",
        "t_us",
        F.count(F.lit(1)).over(w).alias("n_30m"),
        (F.sum("sv").over(w).cast("double") / 1e6).alias("sum_30m"),
    )
