"""Bucketed co-located join: pre-bucketing both sides on the join key must
remove the join's shuffles entirely — the 100 TB pattern for repeated joins
on the same key (pay the shuffle once at write time, never again)."""

from __future__ import annotations

import pytest

from broadway_kinesis_spark.plans.audit import formatted_plan, shuffle_count
from broadway_kinesis_spark.session import load


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    from pyspark.sql import functions as F

    name_o, name_l = "bkt_orders", "bkt_lineitem"
    spark.sql(f"DROP TABLE IF EXISTS {name_o}")
    spark.sql(f"DROP TABLE IF EXISTS {name_l}")
    (
        load(spark, sf_dir, "orders")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(name_o)
    )
    (
        load(spark, sf_dir, "lineitem")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(name_l)
    )
    yield name_o, name_l
    spark.sql(f"DROP TABLE IF EXISTS {name_o}")
    spark.sql(f"DROP TABLE IF EXISTS {name_l}")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, warehouse):
    from pyspark.sql import functions as F

    name_o, name_l = warehouse
    # Disable broadcast so the join would OTHERWISE be a shuffled SMJ.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(name_o)
        l = spark.table(name_l)
        joined = l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = formatted_plan(joined)
        # the JOIN itself must be exchange-free; the only allowed exchange
        # is the aggregation on o_orderstatus afterwards
        assert shuffle_count(joined) <= 1, plan
        assert "SortMergeJoin" in plan, plan

        # un-bucketed baseline for contrast: the same join plans 2+ exchanges
        lo = load(spark, sf_dir, "lineitem")
        oo = load(spark, sf_dir, "orders")
        base = lo.join(oo, lo.l_orderkey == oo.o_orderkey).groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )
        assert shuffle_count(base) >= 3, formatted_plan(base)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_results_match_plain_join(spark, sf_dir, warehouse):
    from pyspark.sql import functions as F

    name_o, name_l = warehouse
    bucketed = (
        spark.table(name_l)
        .join(spark.table(name_o), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plain = (
        load(spark, sf_dir, "lineitem")
        .join(load(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))
