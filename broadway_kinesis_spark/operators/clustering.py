"""Duplicate-cluster construction: connected components over the near-dup
candidate-pair graph (SURVEY.md §2.B "LLM ops" extension; VERDICT r2 #6).

Pair-level dedup operators (dedup.py) emit EDGES — "doc A duplicates doc B"
under some evidence channel. A real cleaning pipeline must then pick ONE
representative per duplicate *group*, and groups are the connected
components of the union of all evidence channels (A~B by jaccard, B~C by
fuzzy prefix ⇒ {A,B,C} is one cluster even though A and C were never
directly compared). ``dedup_cluster_cc`` composes the existing ngram-jaccard
and fuzzy-prefix pair outputs into that clustering.

Algorithm: Hash-Min label propagation — every node starts labeled with its
own id; each round every node takes the min of its own label and its
neighbors' labels; fixpoint labels ARE the component ids (the min doc_id of
each component, which doubles as the canonical keep-this-one representative
under keep-first semantics).

Scale posture (100 TB): the graph is the CANDIDATE-PAIR graph, not the
corpus — nodes are only docs with at least one near-dup edge (a small
fraction of the corpus), edges come from the bounded/blocked candidate
generators in dedup.py. Each round is one hash-partitioned shuffle on node
id (groupBy-min + a left join), map-side combinable; rounds needed = max
component diameter, and duplicate clusters are near-cliques/stars (a source
document and its copies), so 2-4 rounds converge in practice. A defensive
iteration cap turns a pathological chain graph into a loud error rather
than silent wrong labels; graphs with genuinely large diameters call for
the O(log n)-round large-star/small-star variant (Kiveris et al.), which
swaps the per-round rule but keeps this exact shuffle shape.

Reference parity: the reference has no clustering surface ([TGT] rows —
`lib/` is a Kinesis source connector only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.operators.dedup import (
    _SQL_PAIR_VERIFY,
    _SQL_SHINGLES,
    DF_CAP,
    EDIT_T,
    PREFIX_N,
    dedup_fuzzy_prefix,
    dedup_ngram_jaccard,
)
from broadway_kinesis_spark.operators.textops import SQL_QUALITY
from broadway_kinesis_spark.registry import query

# Convergence cap: duplicate clusters are stars/near-cliques (diameter ≤ ~4).
# A graph still changing after this many Hash-Min rounds has a path-like
# component the operator was not designed for — fail loudly (see module doc).
MAX_CC_ITERS = 25


def connected_components(edges: DataFrame, max_iters: int = MAX_CC_ITERS) -> DataFrame:
    """Hash-Min connected components over an undirected edge list.

    ``edges`` must have two integer columns ``d1``/``d2`` (one row per
    undirected edge, either orientation). Returns (node, label) where label
    is the min node id of the node's component. Each iteration is one
    shuffle (groupBy node) + one broadcast-size join; iterations stop at the
    first fixpoint (checked with a cheap isEmpty action on the diff).
    """
    sym = (
        edges.select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
        .union(edges.select(F.col("d2").alias("src"), F.col("d1").alias("dst")))
        .distinct()
    )
    adj = sym.cache()
    labels = (
        adj.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .cache()
    )
    try:
        for _ in range(max_iters):
            nbr_min = (
                adj.join(labels, adj["src"] == labels["node"])
                .groupBy(adj["dst"].alias("node"))
                .agg(F.min("label").alias("nbr_label"))
            )
            new_labels = (
                labels.withColumnRenamed("label", "old_label")
                .join(nbr_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("old_label"), F.coalesce("nbr_label", "old_label")
                    ).alias("label"),
                    "old_label",
                )
                .cache()
            )
            converged = new_labels.filter(
                F.col("label") != F.col("old_label")
            ).isEmpty()
            old = labels
            labels = new_labels.drop("old_label")
            old.unpersist()
            if converged:
                return labels
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iters} Hash-Min "
            "rounds — component diameter exceeds the duplicate-cluster "
            "assumption; use a large-star/small-star variant for this graph"
        )
    finally:
        adj.unpersist()


#: CTE chain for the two DOCUMENT evidence channels: ``jp`` (exact
#: n-gram-Jaccard pairs) and ``fz`` (fuzzy prefix pairs), plus the shared
#: ``shingled``/``cand`` structure other channels reuse (containment's edge
#: CTEs in operators/containment.py join the same ``cand``/``shingled``).
SQL_CHANNEL_CTES = f"""
    shingled AS ({_SQL_SHINGLES}),
    idx AS (
        SELECT doc_id, shingle FROM (
            SELECT doc_id, UNNEST(shingles) AS shingle FROM shingled
        ) QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= {DF_CAP}
    ),
    cand AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2
        FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    jp AS (WITH {_SQL_PAIR_VERIFY}),
    p AS (
        SELECT doc_id, lang, n_chars // 50 AS size_bucket,
               substr(lower(text), 1, {PREFIX_N}) AS pfx
        FROM documents
    ),
    fz AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2
        FROM p a
        JOIN p b ON a.lang = b.lang AND a.size_bucket = b.size_bucket
                AND a.doc_id < b.doc_id
        WHERE levenshtein(a.pfx, b.pfx) <= {EDIT_T}
    )"""


def sql_cc_tail(edge_sql: str) -> str:
    """CTE tail running the Hash-Min fixpoint (as a recursive min-label
    reachability) over ``edge_sql`` — any SELECT producing undirected
    (d1, d2) rows — ending in ``comp(doc_id, component_id)``. The edge
    union is a parameter so the leakage-safe split (operators/splits.py)
    can widen it with containment + semantic channels while this module's
    two-channel clustering keeps its original oracle."""
    return f"""e AS ({edge_sql}),
    edges AS (SELECT d1 AS s, d2 AS t FROM e UNION ALL SELECT d2 AS s, d1 AS t FROM e),
    reach AS (
        SELECT DISTINCT s AS node, s AS lab FROM edges
        UNION
        SELECT e2.t AS node, r.lab FROM reach r JOIN edges e2 ON e2.s = r.node
    ),
    comp AS (SELECT node AS doc_id, MIN(lab) AS component_id FROM reach GROUP BY node)"""


#: oracle CTE chain ending in ``comp(doc_id, component_id)`` — the SQL twin
#: of ``connected_components`` over the two-channel evidence-edge union.
#: Must follow a ``WITH RECURSIVE`` head.
SQL_COMP_CTES = (
    SQL_CHANNEL_CTES
    + ",\n    "
    + sql_cc_tail("SELECT d1, d2 FROM jp UNION SELECT d1, d2 FROM fz")
)


@query(
    "dedup_cluster_cc",
    oracle=f"""
    WITH RECURSIVE {SQL_COMP_CTES}
    SELECT doc_id, component_id,
           COUNT(*) OVER (PARTITION BY component_id) AS cluster_size
    FROM comp
    """,
)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components duplicate clustering over the UNION of two
    evidence channels: exact n-gram-Jaccard pairs (dedup_ngram_jaccard) and
    fuzzy prefix-edit-distance pairs (dedup_fuzzy_prefix). Output: one row
    per clustered doc with its component id (= min doc_id of the cluster,
    the keep-first representative) and cluster size. The oracle runs the
    same Hash-Min fixpoint as a recursive CTE (min label reachable over the
    symmetric edge set); all ids/sizes are integers, so the diff is exact.
    """
    comp = _two_channel_components(spark, sf_dir)
    return comp.withColumn(
        "cluster_size", F.count(F.lit(1)).over(Window.partitionBy("component_id"))
    )


def _two_channel_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, component_id) over the ngram + fuzzy evidence union —
    shared by dedup_cluster_cc and dedup_keep_best."""
    jp = dedup_ngram_jaccard(spark, sf_dir).select("d1", "d2")
    fz = dedup_fuzzy_prefix(spark, sf_dir).select("d1", "d2")
    labels = connected_components(jp.union(fz).distinct())
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component_id")
    )


@query(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {SQL_COMP_CTES},
    q AS ({SQL_QUALITY}),
    ranked AS (
        SELECT c.doc_id, c.component_id, q.quality,
               ROW_NUMBER() OVER (PARTITION BY c.component_id
                                  ORDER BY q.quality DESC, c.doc_id) AS rn
        FROM comp c JOIN q ON q.doc_id = c.doc_id
    )
    SELECT doc_id, component_id, quality, rn = 1 AS keep FROM ranked
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-representative selection by QUALITY — the curation decision
    keep-first cannot make: within each duplicate cluster keep the
    highest-quality member (``text_quality_score``'s proven-bitwise-equal
    formula; ties break on doc_id), not the lowest id. A scraped page and
    its boilerplate-laden mirror dedup to the CLEAN copy regardless of
    crawl order. Output: one row per clustered doc with its component id,
    quality, and the keep flag.

    Scale posture: the quality projection runs only over CLUSTERED docs —
    an explicit LEFT-SEMI join by the label table sits between the scan
    and the scoring projection (Catalyst's semi-join pushdown keeps it
    below the projection; the plan fence in tests/test_round9_ops.py pins
    that shape), so the per-row quality arithmetic touches cluster docs ≪
    corpus, not every document. The argmax is a window partitioned by
    component id (cluster-sized groups, never global). Determinism:
    quality is float64 but the SAME formula both engines already
    hash-match on ``text_quality_score``; the window breaks quality ties
    on doc_id in both plans."""
    from broadway_kinesis_spark.operators.textops import quality_scored
    from broadway_kinesis_spark.session import load

    comp = _two_channel_components(spark, sf_dir)
    # The label table is the candidate-pair graph's node set — broadcast
    # it and semi-filter the docs BEFORE scoring. The bounding is
    # structural (filter below the projection by construction): Spark's
    # semi-join pushdown only crosses trivial alias projections, so
    # scoring-then-filtering would compute quality corpus-wide.
    docs = load(spark, sf_dir, "documents").join(
        F.broadcast(comp.select("doc_id")), "doc_id", "left_semi"
    )
    q = quality_scored(docs).select("doc_id", "quality")
    rn = F.row_number().over(
        Window.partitionBy("component_id").orderBy(
            F.desc("quality"), F.asc("doc_id")
        )
    )
    return (
        comp.join(q, "doc_id")
        .withColumn("rn", rn)
        .select(
            "doc_id", "component_id", "quality", (F.col("rn") == 1).alias("keep")
        )
    )
