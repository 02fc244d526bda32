"""Join operators (SURVEY.md §2.B "Join" rows).

All joins are declared with ``df.join(...)`` and left to Catalyst/AQE to
pick the physical strategy (broadcast-hash, shuffled-hash, sort-merge,
nested-loop for non-equi). The only hints used are ``F.broadcast`` on
genuinely small dimension tables — at 100 TB the fact side never fits in
memory but `nation`/`region`/`part`-sized dims always do, so forcing the
broadcast removes the big-side shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.functions.numeric import lsum, sql_lsum
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load


@query(
    "join_inner",
    oracle=f"""
    SELECT n_name,
           COUNT(*) AS n_orders,
           {sql_lsum("o_totalprice", "revenue")}
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join chain (fact ⋈ dim ⋈ dim) + aggregate.

    orders⋈customer shuffles on custkey (both large at scale); nation is
    broadcast so the second join adds no exchange.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), lsum("o_totalprice", "revenue"))
    )


@query(
    "join_broadcast",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n_items,
           {sql_lsum("l_quantity", "sum_qty")}
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 25
    GROUP BY p_brand
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast join: dim `part` ships to every executor; the
    lineitem side is never shuffled — the pattern that survives 100 TB."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_items"), lsum("l_quantity", "sum_qty"))
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           COUNT(o.o_custkey) AS n_with_urgent,
           COUNT(*) - COUNT(o.o_custkey) AS n_without
    FROM customer c
    LEFT JOIN (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ) o ON c.c_custkey = o.o_custkey
    GROUP BY c_mktsegment
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join; null-counting distinguishes matched/unmatched."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.count("o_custkey").alias("n_with_urgent"),
            (F.count(F.lit(1)) - F.count("o_custkey")).alias("n_without"),
        )
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT n_name, COUNT(s_suppkey) AS n_suppliers
    FROM supplier
    RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join keeps nations with zero suppliers (count 0)."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cust AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
         supp AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cust.nk, supp.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates; coalesced keys + zero-fill."""
    c = load(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    s = load(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return (
        c.join(s, c.nk == s.nk, "full")
        .select(
            F.coalesce(c.nk, s.nk).alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
    )
    GROUP BY c_mktsegment
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): probe side streamed, no row duplication."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    GROUP BY c_mktsegment
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no urgent order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, COUNT(*) AS n_foreign_nations
    FROM region CROSS JOIN nation
    WHERE r_regionkey <> n_regionkey
    GROUP BY r_name
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (both sides tiny) + post-filter."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return (
        r.crossJoin(n)
        .filter(F.col("r_regionkey") != F.col("n_regionkey"))
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_foreign_nations"))
    )


@query(
    "join_theta",
    oracle="""
    SELECT c_nationkey AS nationkey, COUNT(*) AS n_pairs
    FROM customer JOIN supplier
      ON c_nationkey = s_nationkey AND c_acctbal > s_acctbal
    GROUP BY c_nationkey
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key + range predicate. Catalyst plans the equi part
    as the join key and evaluates the inequality as a join condition, so
    it still hash-partitions by nation instead of a full cross product."""
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    return (
        c.join(s, (c.c_nationkey == s.s_nationkey) & (c.c_acctbal > s.s_acctbal))
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "join_range_interval",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS purchase_id,
           b.us - a.us AS gap_us
    FROM (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
          WHERE event_type = 'click') a
    JOIN (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
          WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id
     AND b.us > a.us
     AND b.us - a.us <= 60000000
    """,
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-interval range join: purchases within 60 s AFTER a click by
    the same user. The equi key (user) carries the hash partitioning; the
    range predicate evaluates inside the join — never a cross product. At
    skewed scale, bucketize time (join on (user, time_bucket) + neighbor
    bucket) to bound per-task pair counts; here user_id bounds fan-out.
    Time compared as integer epoch-µs (see asof.py note on ns fixtures)."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.unix_micros("ts").alias("a_us")
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("b_user"),
        F.unix_micros("ts").alias("b_us"),
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("b_us") > F.col("a_us"))
            & (F.col("b_us") - F.col("a_us") <= 60_000_000),
        )
        .select("click_id", "purchase_id", (F.col("b_us") - F.col("a_us")).alias("gap_us"))
    )
