"""Composite analytical queries — multi-join + aggregate + top-k pipelines.

The single-operator families (joins.py, aggregates.py, windows.py) prove
each §2.B row in isolation; these queries compose them into the classic
decision-support shapes (TPC-H Q3 / Q5 / Q10 analogues over the fixture
schema) so the engine demonstrates full-pipeline planning: join ordering
across 3-6 tables, selective-filter pushdown into every scan, broadcast
selection for dims, and a deterministic top-k cut on an aggregated measure.

Scale posture (100 TB): each query's joins shuffle only on the fact-table
keys that genuinely need co-location (orderkey / custkey); `nation`/`region`
are broadcast (no fact shuffle for them); date/segment filters are pushed to
the parquet scans so the shuffled volume is the *selected* subset, not the
table. Revenue sums use the decimal-stabilized helpers (functions/numeric.py)
so results are bit-reproducible regardless of partial-agg merge order —
which also makes the top-k cut deterministic (rounded measure + unique-key
tiebreak in BOTH plans, per the registry contract).

Reference parity: the reference implements no relational queries ([TGT]
rows; `SURVEY.md` §2.B composition requirement, driver harness north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.functions.numeric import lsum, sql_lsum
from broadway_kinesis_spark.operators.clustering import SQL_COMP_CTES
from broadway_kinesis_spark.operators.textops import SQL_QUALITY
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

_Q3_DATE = "1998-06-15"
_Q10_LO, _Q10_HI = "1997-01-01", "1997-07-01"


@query(
    "composite_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_lsum("l_extendedprice * (1 - l_discount)", "revenue")},
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '{_Q3_DATE}'
      AND l_shipdate  > TIMESTAMP '{_Q3_DATE}'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def composite_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, selective filters on all three tables,
    revenue aggregate per order, global top-10 by revenue.

    customer⋈orders shuffles on custkey, then ⋈lineitem on orderkey — two
    shuffles, each moving only filter-surviving rows (segment + both date
    predicates push to the scans). The top-10 runs as TakeOrderedAndProject:
    per-partition heaps, no global sort. Tiebreak: l_orderkey (unique per
    group) so the LIMIT cut is deterministic in both engines.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_DATE).cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_DATE).cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(lsum("l_extendedprice * (1 - l_discount)", "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "composite_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {sql_lsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def composite_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join where the supplier must be in the
    customer's nation ("local supplier") — an equi-join with a second,
    cross-table equality condition.

    region⋈nation is broadcast-on-broadcast (rows: 5 x 25); their result
    broadcasts into customer, so the only shuffles are the fact-side joins
    on custkey / orderkey / suppkey. The s_nationkey = c_nationkey condition
    rides on the supplier equi-join (one join, compound condition) rather
    than a post-join filter, so Catalyst keeps it in the hash-join key
    evaluation and non-local pairs never materialize.
    """
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    return (
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               F.col("c_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(lsum("l_extendedprice * (1 - l_discount)", "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "composite_user_retention",
    oracle="""
    WITH first AS (
        SELECT user_id, CAST(MIN(date_trunc('week', ts)) AS TIMESTAMP) AS cohort_week
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week FROM events
    ), ret AS (
        SELECT cohort_week,
               CAST(date_diff('day', cohort_week, week) / 7 AS INT) AS weeks_since,
               COUNT(*) AS n_active
        FROM activity JOIN first USING (user_id)
        GROUP BY 1, 2
    )
    SELECT cohort_week, weeks_since, n_active,
           n_active / MAX(CASE WHEN weeks_since = 0 THEN n_active END)
                          OVER (PARTITION BY cohort_week) AS retention_rate
    FROM ret
    """,
)
def composite_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix over the event stream: cohort = each
    user's first active week, cell = how many of that cohort were active k
    weeks later, plus the rate vs week 0 (every cohort member is active in
    week 0 by construction, so week 0 is the cohort size).

    Two shuffles on user_id (first-week agg + the distinct), one broadcast
    join (the per-user cohort table is |users| rows — small relative to
    events; at 100 TB it exceeds the broadcast threshold and AQE falls back
    to a shuffled join on user_id, which both sides already partition by),
    then a 2-key agg whose key space (weeks x cohorts) is tiny. The rate is
    an int/int -> double division — IEEE-exact in both engines.
    """
    e = load(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    first = e.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = e.select("user_id", week.alias("week")).distinct()
    from pyspark.sql import Window

    ret = (
        activity.join(first, "user_id")
        .select(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias("weeks_since"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    week0 = F.max(F.when(F.col("weeks_since") == 0, F.col("n_active"))).over(
        Window.partitionBy("cohort_week")
    )
    return ret.select(
        "cohort_week",
        "weeks_since",
        "n_active",
        (F.col("n_active") / week0).alias("retention_rate"),
    )


@query(
    "composite_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_lsum("l_extendedprice * (1 - l_discount)", "revenue")},
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '{_Q10_LO}'
      AND o_orderdate <  TIMESTAMP '{_Q10_HI}'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def composite_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: which customers returned the most revenue in a
    half-year window — 4-way join, two selective filters, per-customer
    aggregate, top-20.

    The returnflag filter pushes into the lineitem scan (cuts ~2/3 of the
    fact table before any shuffle); nation broadcasts; the top-20 cut uses
    c_custkey (unique per group) as tiebreak for a deterministic LIMIT.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q10_HI).cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(lsum("l_extendedprice * (1 - l_discount)", "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "pipeline_clean_corpus",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang, n_chars, text,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ), quality AS (
        SELECT * FROM scored WHERE n_tokens >= 20 AND n_chars >= 100
    ), dedup AS (
        SELECT doc_id, lang, n_tokens FROM (
            SELECT doc_id, lang, n_tokens,
                   ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM quality
        ) WHERE rn = 1
    ), split AS (
        SELECT doc_id, lang, n_tokens,
               CASE
                   WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80 THEN 'train'
                   WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'val'
                   ELSE 'test'
               END AS split
        FROM dedup
    )
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT lang) AS n_langs,
           MIN(doc_id) AS min_doc_id
    FROM split
    GROUP BY split
    """,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus cleaning pipeline in ONE declarative plan:
    quality gate (token/char floors) → exact dedup keep-first (md5 grouping,
    so only 16-byte hashes shuffle, never bodies) → deterministic 80/10/10
    hash split → per-split stats. The stages compose lazily: Catalyst fuses
    the quality filter into the scan, the dedup window and the final agg
    each take one shuffle, and the split assignment stays a map-side
    projection (relational.sample_hash_split). This is the composition
    story for the LLM-data operators: each stage is the same operator a
    user would run standalone, chained without materialization barriers —
    at 100 TB insert a checkpoint/write between dedup and split only if the
    lineage gets too deep to replay cheaply."""
    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "lang", "n_chars", "text",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    quality = scored.filter((F.col("n_tokens") >= 20) & (F.col("n_chars") >= 100))
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dedup = (
        quality.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
        % 100
    )
    split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    return (
        dedup.select("doc_id", "lang", "n_tokens", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


@query(
    "pipeline_clean_corpus_best",
    oracle=f"""
    WITH RECURSIVE {SQL_COMP_CTES},
    q AS ({SQL_QUALITY}),
    scored AS (
        SELECT doc_id, lang, n_chars,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ), gated AS (
        SELECT * FROM scored WHERE n_tokens >= 20 AND n_chars >= 100
    ), ranked AS (
        SELECT g.doc_id, g.lang, g.n_tokens,
               ROW_NUMBER() OVER (
                   PARTITION BY COALESCE(c.component_id, g.doc_id)
                   ORDER BY q.quality DESC, g.doc_id
               ) AS rn
        FROM gated g
        LEFT JOIN comp c ON c.doc_id = g.doc_id
        LEFT JOIN q ON q.doc_id = g.doc_id
    ), kept AS (
        SELECT doc_id, lang, n_tokens FROM ranked WHERE rn = 1
    ), split AS (
        SELECT doc_id, lang, n_tokens,
               CASE
                   WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80 THEN 'train'
                   WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'val'
                   ELSE 'test'
               END AS split
        FROM kept
    )
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT lang) AS n_langs,
           MIN(doc_id) AS min_doc_id
    FROM split
    GROUP BY split
    """,
)
def pipeline_clean_corpus_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaning pipeline with the dedup stage UPGRADED to keep-BEST
    (VERDICT r8 #2 — composing operators/clustering.py's ``dedup_keep_best``
    decision into the composed build): quality gate → near-dup cluster
    dedup keeping the HIGHEST-quality gated member per cluster (ties on
    doc_id; the two-channel components subsume exact dedup for gated docs —
    any two identical ≥20-token texts share every shingle, Jaccard 1) →
    deterministic 80/10/10 hash split → per-split stats. Where
    ``pipeline_clean_corpus`` keeps the first crawl of a page,
    this keeps the CLEAN copy regardless of crawl order — the decision a
    real corpus build ships.

    Scale posture: the gate is a scan-fused filter; cluster labels cover
    only evidence-edged docs, so the label join BROADCASTS and quality is
    scored only over clustered docs (the same structural semi-join bound
    as ``dedup_keep_best``); the argmax window partitions by cluster —
    unclustered docs are rank-1 singletons by construction, so no global
    sort exists anywhere in the plan."""
    from broadway_kinesis_spark.operators.clustering import (
        _two_channel_components,
    )
    from broadway_kinesis_spark.operators.textops import quality_scored
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "lang", "n_chars",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    gated = scored.filter((F.col("n_tokens") >= 20) & (F.col("n_chars") >= 100))
    comp = _two_channel_components(spark, sf_dir)
    q = quality_scored(
        d.join(F.broadcast(comp.select("doc_id")), "doc_id", "left_semi")
    ).select("doc_id", "quality")
    labeled = (
        gated.join(F.broadcast(comp), "doc_id", "left")
        .join(F.broadcast(q), "doc_id", "left")
    )
    rn = F.row_number().over(
        Window.partitionBy(
            F.coalesce(F.col("component_id"), F.col("doc_id"))
        ).orderBy(F.desc("quality"), F.asc("doc_id"))
    )
    kept = labeled.withColumn("rn", rn).filter(F.col("rn") == 1)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
        % 100
    )
    split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    return (
        kept.select("doc_id", "lang", "n_tokens", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )
