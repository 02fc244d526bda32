"""session.load() memoization: bounded cache, eviction on file rewrite.

ADVICE r3: the old (session, path, mtime, size) keying never evicted, so a
rewritten fixture file or a sequence of sessions accumulated dead
DataFrame entries (each pinning its session's JVM handles) for process
lifetime. The cache is now keyed (session, path) with the stat signature
stored beside the value — a rewrite REPLACES the entry in place.
"""

from __future__ import annotations

import os

from broadway_kinesis_spark import session as sess


def _write_documents(spark, sf_dir: str, n: int) -> None:
    spark.range(n).selectExpr(
        "id AS doc_id", "'src0' AS source", "'en' AS lang", "'hello' AS text"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )


def test_load_memoizes_handle(spark, tmp_path):
    sf_dir = str(tmp_path)
    _write_documents(spark, sf_dir, 3)
    df1 = sess.load(spark, sf_dir, "documents")
    df2 = sess.load(spark, sf_dir, "documents")
    assert df1 is df2


def test_rewrite_evicts_instead_of_accreting(spark, tmp_path):
    sf_dir = str(tmp_path)
    path = os.path.join(sf_dir, "documents.parquet")
    _write_documents(spark, sf_dir, 3)
    df1 = sess.load(spark, sf_dir, "documents")
    assert df1.count() == 3

    _write_documents(spark, sf_dir, 5)  # new mtime/size signature
    df2 = sess.load(spark, sf_dir, "documents")
    assert df2 is not df1
    assert df2.count() == 5

    # one entry per (session, path), not one per file version
    keys = [k for k in sess._DF_CACHE if k == (id(spark), path)]
    assert len(keys) == 1
    assert len([k for k in sess._SCHEMA_CACHE if k == (id(spark), path)]) == 1
