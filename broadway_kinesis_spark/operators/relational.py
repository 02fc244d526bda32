"""Core relational operators: scan/project/filter, sort/limit, set ops,
exact dedup (SURVEY.md §2.B "Scan/Project/Filter/Sort/Set ops/Dedup").

Filters are expressed as Column predicates so Catalyst pushes them into the
parquet scan (verify with ``.explain``: ``PushedFilters`` on the
FileSourceScan) and prunes unread columns via ``ReadSchema``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load


@query(
    "scan_project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_returnflag
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R')
      AND l_quantity BETWEEN 10 AND 20
      AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND NOT (l_discount > 0.08 OR l_tax < 0.01)
      AND l_linestatus LIKE 'F%'
    """,
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate (IN / BETWEEN / comparison / NOT-OR / LIKE) +
    computed projection. Everything sits in one WholeStageCodegen over the
    scan; the conjuncts reach the parquet reader as PushedFilters.

    net_price is a deterministic per-row double product — identical in
    both engines, no stabilization needed.
    """
    l = load(spark, sf_dir, "lineitem")
    return l.filter(
        F.col("l_returnflag").isin("A", "R")
        & F.col("l_quantity").between(10, 20)
        & (F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        & ~((F.col("l_discount") > 0.08) | (F.col("l_tax") < 0.01))
        & F.col("l_linestatus").like("F%")
    ).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        "l_returnflag",
    )


@query(
    "filter_null_semantics",
    oracle="""
    SELECT
        COUNT(*) AS n_rows,
        COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS n_null_status,
        COUNT(CASE WHEN o_orderstatus IS NOT NULL THEN 1 END) AS n_not_null,
        COUNT(CASE WHEN NULLIF(o_orderstatus, 'P') IS NULL THEN 1 END) AS n_p_or_null
    FROM orders
    """,
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL / NULLIF three-valued-logic checks."""
    o = load(spark, sf_dir, "orders")
    status = F.col("o_orderstatus")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(status.isNull(), 1)).alias("n_null_status"),
        F.count(F.when(status.isNotNull(), 1)).alias("n_not_null"),
        F.count(F.when(F.nullif(status, F.lit("P")).isNull(), 1)).alias("n_p_or_null"),
    )


@query(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heap of k, then a k-sized merge on the driver; no global sort even at
    100 TB. Unique-key tiebreak keeps the k-set deterministic."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "setops_union_all",
    oracle="""
    SELECT nationkey, COUNT(*) AS n
    FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    )
    GROUP BY nationkey
    """,
)
def setops_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no shuffle) + count to keep output small."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "setops_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setops_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT = union + hash-dedup shuffle on the full row."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "setops_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setops_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — planned as an aggregate + semi join."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "setops_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setops_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — customers who ordered but never with status F.

    ``subtract`` is SQL EXCEPT's set semantics; ``exceptAll`` would be bag
    semantics (keeps surplus multiplicity) and give a different answer.
    """
    o = load(spark, sf_dir, "orders")
    all_c = o.select(F.col("o_custkey").alias("custkey"))
    f_c = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return all_c.subtract(f_c)


@query(
    "dedup_exact_rows",
    oracle="""
    SELECT DISTINCT o_custkey, o_orderstatus FROM orders
    """,
)
def dedup_exact_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a projection — `dropDuplicates` over the selected
    columns is deterministic here because the kept columns ARE the key."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_custkey", "o_orderstatus").dropDuplicates()


@query(
    "dedup_keep_first",
    oracle="""
    SELECT o_custkey, o_orderstatus, o_orderkey AS first_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderstatus, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderstatus
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keep-first dedup (DISTINCT ON equivalent): row_number
    over an explicit total order, rn=1. The deterministic alternative to
    dropDuplicates' arbitrary row choice."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "o_orderstatus").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderstatus",
            F.col("o_orderkey").alias("first_orderkey"),
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, val FROM (
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    )
    WHERE l_orderkey % 100 = 0
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt (the inverse of agg_pivot): rotate four measure columns
    into (measure, val) rows keyed by (orderkey, linenumber). Spark's native
    ``unpivot`` plans a single Expand over one scan — 4x rows from ONE pass,
    vs the oracle's portable 4-scan UNION ALL; values pass through untouched
    so no float stabilization is needed. The key filter keeps the
    differential row count at sample scale."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )


@query(
    "sample_hash_split",
    oracle="""
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT lang) AS n_langs,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM (
        SELECT doc_id, lang, n_chars,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
                   AS bucket,
               CASE
                   WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80 THEN 'train'
                   WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'val'
                   ELSE 'test'
               END AS split
        FROM documents
    )
    GROUP BY split
    """,
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test splitting by key hash — the
    reproducible-sampling primitive a training-data pipeline needs instead
    of RNG sampling: md5(doc_id) -> bucket 0..99 -> 80/10/10 split. The
    assignment is a pure per-row projection (no shuffle, no state, no seed
    coordination), so at 100 TB it runs map-side and composes with
    ``partitionBy("split")`` on write; the same hash gives the same split
    on ANY engine or cluster size, which is what makes held-out sets stable
    across reruns. Summary agg keeps the checked result compact; all
    output columns are integers/strings so the oracle diff is exact
    (md5 hex -> int via conv == DuckDB '0x' cast).

    Reference parity: [TGT] row (SURVEY.md §2.B); the reference has no
    sampling surface.
    """
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select("doc_id", "lang", "n_chars", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )
