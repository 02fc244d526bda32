"""Incremental leakage-safe split assignment for an arriving delta
(VERDICT r10 #4).

``dedup_split_leakage_safe_tiered_persisted`` serves the WHOLE corpus's
split from the persisted evidence edges, but it re-runs connected
components over the whole pair graph on every invocation. The step a
daily corpus build actually runs is smaller: version N's cluster labels
are already persisted; a delta arrives; each delta document must land on
a split side WITHOUT re-clustering version N — docs that join an
existing cluster inherit that cluster's side, genuinely-new clusters
hash fresh.

Mechanism (all existing machinery): the delta's evidence edges come out
of the persisted tiered edge table (``splits.ensure_split_edges`` —
``d2 >= boundary`` selects exactly the delta-touching rows, because
version-N ids all sit below every delta id and pairs are ``d1 < d2``);
each OLD endpoint collapses to its version-N component label (the
persisted label table this module adds, built once per corpus version
from the old-old edge rows); Hash-Min CC then runs over the collapsed
QUOTIENT graph only — delta nodes plus the handful of old labels they
touch — never over version N's full graph.

Why the quotient gives the from-scratch answer for every delta doc: a
full-graph component containing a delta doc decomposes into old
components O1..Ok (collapsed to their labels L1..Lk, each the MIN id of
Oi), old docs with only delta-facing edges, and delta docs; collapsing
connected subsets preserves connectivity, so the quotient component's
min node = min(L1..Lk, singleton old ids, delta ids) = the min doc id of
the full component — exactly the group key the from-scratch split
assigns. That holds even when the delta MERGES two old clusters (the
quotient connects both labels and the min wins), which is also the one
case where OLD docs' sides change under a full recompute — re-keying
version N is version N+1's full build, not the delta assignment's job.
The oracle therefore restricts the from-scratch tiered split to the
delta's rows, and the driver checks per-document equality.

Scale posture (100 TB): the edge probe is a filter on the persisted pair
table (pair tables track the duplicate population, not the corpus), the
version-N label table broadcasts whole but is bounded by the CLUSTERED
population (the same broadcast argument the full split's assignment
makes), and CC runs on the quotient graph only (delta near-dup pairs +
the labels they touch). Measured (BASELINE.md §round-11): parity with
the full-graph serving path at fresh x10 (~1.4 k edges — full CC is
already trivial), 2.7× at fresh x100, and the separation is structural
(quotient size tracks the delta's near-dup population, full-graph size
the corpus's).

Reference parity: [TGT] — engine extension (SURVEY §2.B sampling/dedup
family).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.functions.table_build import corpus_sig, ensure_table
from broadway_kinesis_spark.operators.clustering import (
    SQL_CHANNEL_CTES,
    connected_components,
    sql_cc_tail,
)
from broadway_kinesis_spark.operators.containment_bottomk import (
    SQL_BOTTOMK_EDGE_CTES,
)
from broadway_kinesis_spark.operators.incremental_batch import BOUNDARY
from broadway_kinesis_spark.operators.semantic import sql_sem_pair_ctes
from broadway_kinesis_spark.operators.splits import (
    _EDGE_POLICY,
    _SPLIT_EDGE_SQL_TIERED,
    _SQL_TIGHT_FUZZY_CTES,
    SPLIT_SEM_T,
    TRAIN_PCT,
    VAL_PCT,
    _bucket,
    ensure_split_edges,
)
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load


def ensure_split_labels(
    spark: SparkSession, sf_dir: str, boundary: int = BOUNDARY
) -> str:
    """Persist version N's cluster labels (doc_id, component_id) — CC over
    the OLD-OLD rows of the persisted tiered edge table (``d2 < boundary``
    implies both endpoints are version-N docs). Built once per corpus +
    edge policy + boundary through the shared build-lock protocol; the
    label table is the artifact a production split pipeline carries
    between corpus versions."""
    pol = hashlib.md5(
        f"{_EDGE_POLICY}:tiered:labels:v{boundary}".encode()
    ).hexdigest()[:8]
    sig = corpus_sig(sf_dir, ("documents", "embeddings"))
    name = f"_bks_split_labels_{pol}_{sig}"

    def build() -> DataFrame:
        edges = spark.table(ensure_split_edges(spark, sf_dir, tiered=True))
        old = edges.filter(F.col("d2") < boundary)
        return connected_components(old).select(
            F.col("node").alias("doc_id"), F.col("label").alias("component_id")
        )

    return ensure_table(spark, name, build)


def roll_forward_split_labels(
    spark: SparkSession,
    sf_dir: str,
    boundary_n: int,
    boundary_n1: int,
    src: str | None = None,
) -> str:
    """fold(N, delta) == build(N+1) for the split's LABEL artifact — the
    companion of incremental_batch's index roll-forward, completing the
    incremental split's production loop: after the delta
    ``[boundary_n, boundary_n1)`` is accepted, version N+1's label table
    comes from version N's labels plus the delta's quotient CC, never
    from re-clustering version N's graph.

    Construction (the quotient-min proof in the module doc): CC runs over
    the delta slice's collapsed quotient graph; old components TOUCHED by
    the delta remap their label to the quotient minimum (which may merge
    two old clusters — the one case where old docs' labels change, and
    the fold handles it exactly); untouched old components pass through;
    quotient nodes that are real doc ids (old singletons the delta
    clustered, and delta docs) append. Table-equality with the
    from-scratch ``ensure_split_labels(boundary_n1)`` build is pinned by
    tests/test_round11_ops.py."""
    # chained daily loop: ``src`` names the previous day's rolled label
    # table (fold-on-fold); default is the from-scratch version-N build.
    # This family REWRITES (touched components remap), so there is no
    # link-forward here — compaction is inherent to every fold.
    labels_n = spark.table(
        src if src is not None else ensure_split_labels(spark, sf_dir, boundary_n)
    )
    edges = spark.table(ensure_split_edges(spark, sf_dir, tiered=True))
    from broadway_kinesis_spark.functions.versioned_fold import fold_policy

    pol = fold_policy(
        f"{_EDGE_POLICY}:tiered:labels", boundary_n, boundary_n1, src
    )
    sig = corpus_sig(sf_dir, ("documents", "embeddings"))
    name = f"_bks_split_labels_{pol}_{sig}"

    def build() -> DataFrame:
        delta_edges = edges.filter(
            (F.col("d2") >= boundary_n) & (F.col("d2") < boundary_n1)
        )
        l1 = labels_n.select(
            F.col("doc_id").alias("d1"), F.col("component_id").alias("lab1")
        )
        quotient = delta_edges.join(F.broadcast(l1), "d1", "left").select(
            F.when(
                F.col("d1") < boundary_n, F.coalesce("lab1", "d1")
            ).otherwise(F.col("d1")).alias("d1"),
            "d2",
        )
        q = connected_components(quotient)
        # old docs: remap any component whose LABEL node the quotient
        # touched to the quotient minimum; untouched pass through
        remap = q.select(
            F.col("node").alias("component_id"), F.col("label").alias("qlab")
        )
        remapped = labels_n.join(F.broadcast(remap), "component_id", "left").select(
            "doc_id", F.coalesce("qlab", "component_id").alias("component_id")
        )
        # quotient nodes that are REAL doc ids, not collapsed labels:
        # delta docs and old singletons the delta clustered (collapsed
        # label nodes are exactly the quotient nodes present in
        # labels_n.doc_id — a label is its own component's member)
        fresh = q.join(
            labels_n.select(F.col("doc_id").alias("node")), "node", "left_anti"
        ).select(
            F.col("node").alias("doc_id"), F.col("label").alias("component_id")
        )
        return remapped.union(fresh)

    return ensure_table(spark, name, build)


def incremental_split_assignment(
    spark: SparkSession,
    sf_dir: str,
    boundary: int = BOUNDARY,
    labels_tbl: str | None = None,
) -> DataFrame:
    """Per-delta-document assignment (doc_id, grp, clustered, split) —
    the parameterized body of ``dedup_split_incremental_assign``; scale
    runs place ``boundary`` per corpus (the x10/x100 rows use 90/10).
    ``labels_tbl`` overrides the version-N label artifact with a table
    produced by :func:`roll_forward_split_labels`, so day D+1's delta
    assigns against day D's fold instead of a fresh boundary build."""
    docs = load(spark, sf_dir, "documents")
    edges = spark.table(ensure_split_edges(spark, sf_dir, tiered=True))
    labels_n = spark.table(
        labels_tbl
        if labels_tbl is not None
        else ensure_split_labels(spark, sf_dir, boundary)
    )
    delta_edges = edges.filter(F.col("d2") >= boundary)
    # collapse OLD endpoints (only d1 can be old under d1 < d2) to their
    # version-N label; unclustered old docs stand as themselves
    l1 = labels_n.select(
        F.col("doc_id").alias("d1"), F.col("component_id").alias("lab1")
    )
    quotient = delta_edges.join(F.broadcast(l1), "d1", "left").select(
        F.when(
            F.col("d1") < boundary, F.coalesce("lab1", "d1")
        ).otherwise(F.col("d1")).alias("d1"),
        "d2",
    )
    qlabels = connected_components(quotient).select(
        F.col("node").alias("doc_id"), F.col("label").alias("component_id")
    )
    delta = docs.filter(F.col("doc_id") >= boundary).select("doc_id")
    assigned = delta.join(F.broadcast(qlabels), "doc_id", "left")
    grp = F.coalesce(F.col("component_id"), F.col("doc_id"))
    bucket = _bucket(grp)
    return assigned.select(
        "doc_id",
        grp.alias("grp"),
        F.col("component_id").isNotNull().alias("clustered"),
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


#: from-scratch tiered split, RESTRICTED to the delta's per-doc rows —
#: the oracle VERDICT r10 #4 specifies. The CTE chain is the tiered split
#: oracle's (clustering channels + tight fuzzy + bottom-K containment +
#: semantic + CC tail); only the final select differs: per-document
#: assignment for ``doc_id >= {BOUNDARY}`` instead of the 3-group rollup.
_INCR_ASSIGN_ORACLE = f"""
    WITH RECURSIVE {SQL_CHANNEL_CTES},
    {_SQL_TIGHT_FUZZY_CTES},
    {SQL_BOTTOMK_EDGE_CTES},
    {sql_sem_pair_ctes(SPLIT_SEM_T)},
    {sql_cc_tail(_SPLIT_EDGE_SQL_TIERED)},
    assigned AS (
        SELECT d.doc_id,
               CAST(COALESCE(c.component_id, d.doc_id) AS BIGINT) AS grp,
               (c.doc_id IS NOT NULL) AS clustered,
               ('0x' || substr(md5(CAST(COALESCE(c.component_id, d.doc_id)
                                        AS VARCHAR)), 1, 8))::BIGINT % 100
                   AS bucket
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
        WHERE d.doc_id >= {BOUNDARY}
    )
    SELECT doc_id, grp, clustered,
           CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
                WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM assigned
    """


@query("dedup_split_incremental_assign", oracle=_INCR_ASSIGN_ORACLE)
def dedup_split_incremental_assign(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental split assignment for the arriving delta (docs with
    ``doc_id >= {BOUNDARY}``): probe the persisted tiered evidence edges,
    collapse old endpoints to version N's persisted cluster labels, run
    CC over the delta-bounded quotient graph, and bucket each delta doc
    by its inherited (or fresh) group key. The oracle recomputes the full
    tiered split from scratch and restricts to the delta's rows, so the
    driver checks per-document equality: inherit-the-cluster's-side and
    hash-fresh both land exactly where the full recompute lands them
    (module doc has the quotient-min proof)."""
    return incremental_split_assignment(spark, sf_dir)
