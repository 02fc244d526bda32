"""Accuracy contracts for the sketch-based (rows-only) operators: the
driver can only check that they run; these tests pin their error bounds."""

from __future__ import annotations

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    from pyspark.sql import functions as F

    from broadway_kinesis_spark.session import load

    approx = {
        r.o_orderstatus: r.approx_custs
        for r in QUERIES["agg_approx_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r.o_orderstatus: r.n
        for r in load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.05 * n), (k, approx[k], n)


def test_approx_percentile_within_tolerance(spark, sf_dir):
    from pyspark.sql import functions as F

    from broadway_kinesis_spark.session import load

    approx = {
        r.l_returnflag: (r.approx_median_price, r.approx_p95_price)
        for r in QUERIES["agg_approx_percentile"](spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: (r.m, r.p)
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("m"),
            F.percentile("l_extendedprice", F.lit(0.95)).alias("p"),
        )
        .collect()
    }
    for k, (m, p) in exact.items():
        am, ap = approx[k]
        assert abs(am - m) / m < 0.05, (k, am, m)
        assert abs(ap - p) / p < 0.05, (k, ap, p)


def test_pandas_similarity_matches_exact_topk_sets(spark, sf_dir):
    """numpy-matmul path must return the same top-k CANDIDATE SETS as the
    fold-ordered exact path (ranks may swap only on float ties)."""
    exact = {}
    for r in QUERIES["similarity_topk_cosine"](spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.cand_id)
    fast = {}
    for r in QUERIES["similarity_topk_cosine_pandas"](spark, sf_dir).collect():
        fast.setdefault(r.query_id, set()).add(r.cand_id)
    assert exact.keys() == fast.keys()
    for qid in exact:
        assert exact[qid] == fast[qid], (qid, exact[qid], fast[qid])
