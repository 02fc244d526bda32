"""Bucketed co-located join as a first-class, oracle-checked operator.

tests/test_bucketing.py has pinned the PLAN property since round 1 (both
sides pre-bucketed on the join key -> the join itself needs no exchange);
this module promotes the pattern from a plan test to a driver-checked
query: build bucketed twins of `orders` and `lineitem` once per corpus
version (Spark-native bucketed tables — no Hive — written into the
session's warehouse dir), then answer a join+aggregate entirely from them.

This is THE repeated-join pattern at 100 TB: the shuffle on the join key
is paid once at write time, and every subsequent join on that key — daily
pipelines re-joining the same fact/dim — plans a zero-exchange sort-merge
join (bucket-pruned, sorted within buckets). The oracle runs the plain
SQL over the raw parquet, so the driver's hash-match PROVES the bucketed
storage layout does not change results.

Idempotence: tables are keyed by a corpus signature (path + mtime + size
of both inputs), rebuilt only when missing from the catalog (a fresh
process has an empty in-memory catalog; the rebuild is one bucketed write
at fixture scale) or when the fixtures change. Names are namespaced
`_bks_*` to keep the shared session catalog clean (ADVICE r3 temp-view
lesson).

Reference parity: [TGT] — no relational surface in the reference; engine
extension beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.functions.numeric import lsum, sql_lsum
from broadway_kinesis_spark.functions.table_build import corpus_sig, ensure_table
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

N_BUCKETS = 8


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Create (once) and return the bucketed twin tables for this corpus.

    Both sides bucket AND sort by the join key with the same bucket count —
    the layout Spark requires to elide both the exchange and the sort of a
    sort-merge join. Build/idempotence/orphan protocol:
    functions/table_build.py."""
    sig = corpus_sig(sf_dir, ("orders", "lineitem"))
    # Use the names ensure_table RETURNS, not the requested ones: when a
    # LIVE sibling session owns the shared warehouse location, the build
    # diverts to a pid-scoped table that only exists in THIS process's
    # catalog — reading the requested name there raises
    # TABLE_OR_VIEW_NOT_FOUND (observed live in round 11: parallel pytest
    # + plan sweep on one warehouse).
    names = [
        ensure_table(
            spark,
            f"_bks_bkt_{table}_{sig}",
            lambda table=table: load(spark, sf_dir, table),
            bucket_by=(N_BUCKETS, key),
        )
        for table, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey"))
    ]
    return names[0], names[1]


@query(
    "join_bucketed",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_items,
           {sql_lsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus <> 'X'
    GROUP BY o_orderstatus
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join answered from bucketed storage: lineitem ⋈ orders on
    the order key plans ZERO exchanges for the join (both sides read
    pre-bucketed, pre-sorted; pinned in tests/test_plans.py) — only the
    final status aggregation shuffles. The oracle joins the raw parquet,
    proving layout-invariance of the result. The o_orderstatus filter is
    a no-op predicate (no 'X' status exists) kept so the plan audit can
    also assert pushdown INTO a bucketed-table scan."""
    name_o, name_l = ensure_bucketed_tables(spark, sf_dir)
    o = spark.table(name_o).filter(F.col("o_orderstatus") != "X")
    li = spark.table(name_l)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            lsum("l_extendedprice * (1 - l_discount)", "revenue"),
        )
    )
