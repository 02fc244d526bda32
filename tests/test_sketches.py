"""Accuracy contracts for the sketch-based (rows-only) operators: the
driver can only check that they run; these tests pin their error bounds."""

from __future__ import annotations

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    """The sketch-vs-exact bound is now asserted IN-PLAN (within_tol column,
    hash-checked by the driver); here we pin that the boolean actually
    reflects the sketch and that exact counts are sane."""
    from pyspark.sql import functions as F

    from broadway_kinesis_spark.session import load

    rows = QUERIES["agg_approx_distinct"](spark, sf_dir).collect()
    assert rows and all(r.within_tol for r in rows), rows
    exact = {
        r.o_orderstatus: r.n
        for r in load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert {r.o_orderstatus: r.exact_custs for r in rows} == exact


def test_approx_percentile_within_tolerance(spark, sf_dir):
    rows = QUERIES["agg_approx_percentile"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p50_within_tol and r.p95_within_tol, r
        assert r.median_price <= r.p95_price, r


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
