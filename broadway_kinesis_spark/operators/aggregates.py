"""Aggregation operators (SURVEY.md §2.B "Agg" rows).

All hash aggregates: ``df.groupBy(...).agg(...)`` → Catalyst plans a
partial (map-side) HashAggregate, a shuffle on the grouping keys, and a
final HashAggregate — the scalable two-phase plan; nothing to hand-roll.
Double sums/avgs use the decimal-stabilized helpers from
:mod:`broadway_kinesis_spark.functions.numeric` so the value-hash is
engine- and plan-order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.functions.numeric import (
    davg,
    dsum,
    lscale,
    lsum,
    lsum_round,
    sql_davg,
    sql_dsum,
    sql_lscale,
    sql_lsum,
    sql_lsum_round,
)
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

_CUTOFF = "2000-09-02 00:00:00"


@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_lsum_round("_sq", 2)} AS sum_qty,
           {sql_lsum_round("_sp", 2)} AS sum_base_price,
           {sql_lsum_round("_sd", 2)} AS sum_disc_price,
           {sql_lsum_round("_sc", 2)} AS sum_charge,
           {sql_lsum_round("_sq", 4)} / count_order AS avg_qty,
           {sql_lsum_round("_sp", 4)} / count_order AS avg_price,
           {sql_lsum_round("_sdisc", 4)} / count_order AS avg_disc,
           count_order
    FROM (
        SELECT l_returnflag, l_linestatus,
               SUM({sql_lscale("l_quantity")}) AS _sq,
               SUM({sql_lscale("l_extendedprice")}) AS _sp,
               SUM({sql_lscale("l_extendedprice * (1 - l_discount)")}) AS _sd,
               SUM({sql_lscale("l_extendedprice * (1 - l_discount) * (1 + l_tax)")}) AS _sc,
               SUM({sql_lscale("l_discount")}) AS _sdisc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '{_CUTOFF}'
        GROUP BY l_returnflag, l_linestatus
    )
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pricing summary (TPC-H Q1 shape) over ``lineitem``.

    Scan → pushed-down timestamp filter → two-phase hash aggregate on the
    2-value (returnflag, linestatus) keys → sort. At 100 TB the map-side
    partial agg collapses each input partition to ≤6 rows before the
    shuffle, so the exchange is trivially small regardless of input size.

    Sums ride the scaled-long fast path (functions/numeric.py lsum notes):
    each ≤6-decimal money term becomes an exact 1e-6-unit integer in the
    projection, the aggregate is a codegen primitive long sum (measured ~3x
    the decimal path's throughput), and rounding happens in integer space
    so the final double cast is exact in both engines. Each sum is
    aggregated ONCE; the 2-dp sum and 4-dp avg numerator are derived
    projections (5 sums instead of 7). Deployments where one group's sum
    could exceed 9.2e12 whole units switch these to dsum/davg (see range
    analysis in numeric.py).
    """
    l = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    disc = F.col("l_discount")
    tax = F.col("l_tax")
    summed = (
        l.filter(F.col("l_shipdate") <= F.lit(_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(lscale(F.col("l_quantity"))).alias("_sq"),
            F.sum(lscale(price)).alias("_sp"),
            F.sum(lscale(price * (1 - disc))).alias("_sd"),
            F.sum(lscale(price * (1 - disc) * (1 + tax))).alias("_sc"),
            F.sum(lscale(disc)).alias("_sdisc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return summed.select(
        "l_returnflag",
        "l_linestatus",
        lsum_round("_sq", 2).alias("sum_qty"),
        lsum_round("_sp", 2).alias("sum_base_price"),
        lsum_round("_sd", 2).alias("sum_disc_price"),
        lsum_round("_sc", 2).alias("sum_charge"),
        (lsum_round("_sq", 4) / F.col("count_order")).alias("avg_qty"),
        (lsum_round("_sp", 4) / F.col("count_order")).alias("avg_price"),
        (lsum_round("_sdisc", 4) / F.col("count_order")).alias("avg_disc"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


@query(
    "agg_distinct_counts",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(DISTINCT o_orderpriority) AS n_prios,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Catalyst expands to a two-level aggregate (Expand +
    partial distinct per key) so the distinct set never centralizes."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderpriority").alias("n_prios"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS exact_custs,
           TRUE AS within_tol
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch (`approx_count_distinct`) — the 100 TB-scale
    swap-in for exact distinct: fixed-size sketch, single pass, mergeable.

    Hash-checkable sketch assertion: the plan computes BOTH the sketch and
    the exact distinct, outputs the exact value plus an in-plan boolean
    `abs(approx-exact)/exact <= 0.05`; the oracle emits exact + TRUE. The
    sketch's estimate is thereby asserted (rsd=0.01 → 5% slack is generous)
    without putting its engine-specific value into the hash."""
    o = load(spark, sf_dir, "orders")
    a = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_custs"),
        F.approx_count_distinct("o_custkey", 0.01).alias("_approx"),
    )
    tol = (
        F.abs(F.col("_approx") - F.col("exact_custs"))
        / F.col("exact_custs").cast("double")
        <= 0.05
    )
    return a.select("o_orderstatus", "exact_custs", tol.alias("within_tol"))


@query(
    "agg_rollup",
    oracle=f"""
    SELECT n_name, o_orderstatus, COUNT(*) AS n_orders,
           {sql_lsum_round(f"SUM({sql_lscale('o_totalprice')})", 2)} AS total_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, o_orderstatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over a star join — Expand node feeds one shuffle; grouping-set
    rows share the same two-phase aggregate. The money sum rides the
    scaled-long fast path (2-decimal input, grand-total well under the
    lsum range bound — numeric.py)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return (
        joined.rollup("n_name", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(lscale(F.col("o_totalprice"))).alias("_tp"),
        )
        .select(
            "n_name",
            "o_orderstatus",
            "n_orders",
            lsum_round("_tp", 2).alias("total_price"),
        )
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           {sql_lsum("l_quantity", "sum_qty")}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets on lineitem flags."""
    l = load(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        lsum("l_quantity", "sum_qty"),
    )


@query(
    "agg_filtered_first_last",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           {sql_lsum_round(f"SUM({sql_lscale('l_extendedprice')}) FILTER (WHERE l_tax > 0.04)", 2)} AS taxed_price,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_filtered_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregates (agg-level predicates) + min/max over timestamps.
    The conditional money sum rides the scaled-long path (numeric.py)."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        lsum_round(
            "sum(case when l_tax > 0.04 then cast(floor(l_extendedprice * 1000000.0 + 0.5) as bigint) end)",
            2,
        ).alias("taxed_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@query(
    "agg_collect",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nation_keys
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → sorted array, serialized to a CSV string: order-independent
    AND canonicalizer-safe (raw array cells crash pandas lexsort in the
    driver's harness — unhashable numpy.ndarray)."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.array_join(F.sort_array(F.collect_set("c_nationkey")), ",").alias("nation_keys"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_linestatus,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
           ROUND(VAR_SAMP(l_quantity), 6) AS var_qty,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance + exact interpolated percentiles.

    Rounded (not decimal-stabilized): variance merging is inherently
    order-sensitive at ~1e-12 relative — rounding to 6 dp absorbs it.
    """
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_linestatus").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,8))), 2) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint one-dimensional marginals + grand
    total) through Spark SQL — same Expand-then-aggregate physical shape as
    rollup/cube, one shuffle for all sets."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,8))), 2) AS DOUBLE) AS total_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


@query(
    "agg_salted_skew",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           {sql_lsum("l_quantity", "sum_qty")}
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation — the manual skew-mitigation pattern for
    when one grouping key dominates (AQE splits skewed JOINS but a skewed
    AGG key still lands on one reducer): stage 1 groups by (key, salt) so
    the hot key spreads over SALT_BUCKETS reducers, stage 2 merges the
    partials. Exact integer partials (scaled-long, numeric.py) make the
    two-stage result bit-identical to the one-stage oracle regardless of
    how the salt splits rows."""
    SALT_BUCKETS = 8
    l = load(spark, sf_dir, "lineitem")
    salted = l.withColumn("_salt", F.pmod(F.col("l_orderkey"), F.lit(SALT_BUCKETS)))
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(lscale(F.col("l_quantity"))).alias("psum"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n_items"),
        lsum_round("sum(psum)", 2).alias("sum_qty"),
    )


@query(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
           ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
           TRUE AS p50_within_tol,
           TRUE AS p95_within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile sketch (`percentile_approx`, Greenwald-Khanna family) —
    the mergeable, fixed-size companion to approx_count_distinct for 100 TB
    profiling.

    Hash-checkable sketch assertion (same pattern as agg_approx_distinct):
    exact interpolated percentiles go into the hash; the sketch estimates
    are asserted in-plan as `abs(approx-exact)/exact <= 0.05` booleans
    (accuracy=1000 → 0.1% rank error, so 5% value slack is generous; the
    tight bound itself is proven in tests/test_sketches.py)."""
    l = load(spark, sf_dir, "lineitem")
    a = l.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("_ex50"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("_ex95"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("_ap50"),
        F.percentile_approx("l_extendedprice", 0.95, 1000).alias("_ap95"),
    )

    def _tol(ap: str, ex: str):
        return F.abs(F.col(ap) - F.col(ex)) / F.abs(F.col(ex)) <= 0.05

    return a.select(
        "l_returnflag",
        F.round("_ex50", 4).alias("median_price"),
        F.round("_ex95", 4).alias("p95_price"),
        _tol("_ap50", "_ex50").alias("p50_within_tol"),
        _tol("_ap95", "_ex95").alias("p95_within_tol"),
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) FILTER (WHERE l_returnflag = 'A') AS flag_a,
           COUNT(*) FILTER (WHERE l_returnflag = 'N') AS flag_n,
           COUNT(*) FILTER (WHERE l_returnflag = 'R') AS flag_r
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: rotate `l_returnflag` values into columns (counts per
    linestatus). The value list is given explicitly — with it, Spark plans
    pivot as ONE pass of conditional aggregates (the same shape as the SQL
    oracle's FILTER clauses); omitting it would cost an extra
    distinct-values job, which at 100 TB is a full extra scan."""
    l = load(spark, sf_dir, "lineitem")
    p = (
        l.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "l_linestatus",
        F.coalesce("A", F.lit(0)).alias("flag_a"),
        F.coalesce("N", F.lit(0)).alias("flag_n"),
        F.coalesce("R", F.lit(0)).alias("flag_r"),
    )


@query(
    "agg_string_concat",
    oracle="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
           COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG shape): collect the
    distinct set, sort it, join — the explicit sort makes the result
    deterministic under any partial-agg merge order (collect_set order is
    not), which is what makes this oracle-checkable at all."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias("priorities"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


@query(
    "agg_mode",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n FROM (
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                  ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group, with a DETERMINISTIC tiebreak
    (count desc, then value asc) — built-in mode()/max_by() break frequency
    ties arbitrarily and engine-specifically, so the portable shape is
    count + row_number: one hash-agg + one tiny window over group-cardinality
    rows. At scale the window input is |groups x distinct values|, not rows."""
    o = load(spark, sf_dir, "orders")
    from pyspark.sql import Window

    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("n"), F.asc("o_orderpriority"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"), "n")
    )
