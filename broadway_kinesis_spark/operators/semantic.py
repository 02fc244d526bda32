"""Semantic (embedding-space) deduplication — SemDedup-style.

Complements the syntactic near-dup family in ``operators/dedup.py``: where
minhash/simhash/jaccard find documents that SHARE SURFACE TEXT, semantic
dedup finds documents that say the same thing in different words — the
embedding space is the blocking structure, and the blocking key is LEARNED
from the data (nearest seed centroid) instead of given (label, band, or
shingle). Lives in its own module so a change to the syntactic family never
stales this operator's driver row and vice versa (per-file staleness rule,
tests/test_registry_window.py).

Reference parity: [TGT] — the reference has no dedup surface; engine
extension per the BASELINE.json north star (SemDedup: Abbas et al. 2023,
public literature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

_SQL_DOT = "list_sum(list_transform(list_zip({a}, {b}), x -> x[1]*x[2]))"

SEM_K = 8       # semantic-dedup coarse clusters (seed centroids)
SEM_T = 0.35    # within-cluster near-dup cosine threshold

def sql_sem_pair_ctes(threshold: float = SEM_T) -> str:
    """CTE chain ending in ``sm(d1, d2)`` — the verified within-cluster
    semantic near-dup pairs (d1 < d2) at the given cosine threshold.
    Names are ``sm``-prefixed so the chain composes with the document
    channels' CTEs (clustering.py / containment.py) inside one WITH
    without collisions; shared by this module's oracle and the
    leakage-safe split's (operators/splits.py), which passes its own
    paraphrase-level threshold."""
    return f"""
    sme AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt({_SQL_DOT.format(a='embedding::DOUBLE[]', b='embedding::DOUBLE[]')}) AS nrm
        FROM embeddings
    ), smc AS (
        SELECT vec_id AS cid, v AS cv FROM sme ORDER BY vec_id LIMIT {SEM_K}
    ), smasg AS (
        SELECT vec_id, v, nrm, cid FROM (
            SELECT sme.vec_id, sme.v, sme.nrm, smc.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY sme.vec_id
                       ORDER BY list_sum(list_transform(list_zip(sme.v, smc.cv),
                                         x -> (x[1]-x[2])*(x[1]-x[2]))), smc.cid
                   ) AS rn
            FROM sme, smc
        ) WHERE rn = 1
    ), sm AS (
        SELECT a.vec_id AS d1, b.vec_id AS d2
        FROM smasg a JOIN smasg b
          ON a.cid = b.cid AND a.vec_id < b.vec_id
         AND {_SQL_DOT.format(a='a.v', b='b.v')} / (a.nrm * b.nrm) >= {threshold}
    )"""


SQL_SEM_PAIR_CTES = sql_sem_pair_ctes()


@query(
    "dedup_semantic",
    oracle=f"""
    WITH {SQL_SEM_PAIR_CTES}
    SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster,
           d.vec_id IS NULL AS keep
    FROM smasg a
    LEFT JOIN (SELECT DISTINCT d2 AS vec_id FROM sm) d ON a.vec_id = d.vec_id
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup-style semantic deduplication (Abbas et al. 2023, public):
    coarsely cluster the embedding space, then drop all but one member of
    every within-cluster near-duplicate group. Differs from
    ``dedup_embedding_cosine`` (given label blocks, pair OUTPUT) in both
    halves: the blocking key is LEARNED from the data (nearest of
    {SEM_K} seed centroids — the ids-first seeding is deterministic so
    both engines build the identical partition), and the output is a
    per-vector keep/drop decision (greedy keep-lowest-id within each
    near-dup neighborhood), i.e. the curation decision a corpus build
    actually materializes.

    Exactness: distances and the verify-tier cosines use the same
    sequential-fold float64 dot as the rest of the similarity family
    (bitwise-equal to DuckDB's ``list_sum``/``list_transform``); the
    argmin window breaks distance ties on centroid id, so assignment is
    deterministic in both engines. Candidate generation runs a numpy
    matmul per cluster with a 1e-9 slack below {SEM_T} (matmul and fold
    agree to ~1e-15 relative, so no true duplicate can be missed), and
    the exact fold re-scores only the candidates — the same two-tier
    shape as ``dedup_embedding_cosine``, which is what keeps the
    quadratic-in-cluster-size work at memory bandwidth instead of in the
    interpreted expression evaluator (the fold-only form measured 18x at
    the x10 corpus; this form is matmul-bound).

    Scale posture: assignment is a broadcast nested-loop over {SEM_K}
    centroid rows (a projection — no shuffle of the vectors); candidate
    pairs come from a per-cluster Arrow batch, so pair work is bounded
    by cluster size, never corpus-wide; the final keep flag is a left
    join against the (small) duplicate-id set. At 100 TB the seeds come
    from the persisted k-means index (operators/ann_persist.py) and the
    cluster count scales WITH corpus size (K ∝ N) so cluster sizes — and
    with them the per-task matmul — stay constant; the fixed {SEM_K}
    here is fixture-sized, not the deployment setting."""
    asg = _assignments(spark, sf_dir)
    dup = (
        semantic_dup_pairs(spark, sf_dir, asg=asg)
        .select(F.col("d2").alias("dup_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        asg.join(dup, asg.vec_id == dup.dup_id, "left")
        .select(
            "vec_id",
            F.col("cid").cast("long").alias("cluster"),
            F.col("is_dup").isNull().alias("keep"),
        )
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v, nrm, cid) — each vector with its nearest seed centroid
    (deterministic: sq-distance ties break on centroid id)."""
    e = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    e = e.select("vec_id", v.alias("v"), F.sqrt(_dot(v, v)).alias("nrm"))
    c = (
        e.orderBy("vec_id")
        .limit(SEM_K)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    sqdist = F.aggregate(
        F.zip_with(F.col("v"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rn = F.row_number().over(
        Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cid"))
    )
    return (
        e.crossJoin(F.broadcast(c))
        .withColumn("dist", sqdist)
        .withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "nrm", "cid")
    )


def semantic_dup_pairs(
    spark: SparkSession,
    sf_dir: str,
    asg: DataFrame | None = None,
    threshold: float = SEM_T,
) -> DataFrame:
    """Verified within-cluster semantic near-dup pairs (d1, d2), d1 < d2 —
    the SQL twin is ``sql_sem_pair_ctes(threshold)``'s ``sm``. Two-tier as
    in the module docstring: per-cluster matmul candidates at a 1e-9
    slack, then the exact sequential-fold cosine as the emit filter, so
    the pair set is defined by the fold (bitwise-equal to DuckDB) in both
    engines. Shared with the leakage-safe split's evidence union
    (splits.py), which passes a paraphrase-level threshold: the cosine
    that means "near-duplicate" is a PER-CORPUS property — {SEM_T} is
    tuned for the near-orthogonal fixture tail and, measured on the
    label-clustered fresh x10 corpus, emits 14.68 M within-cluster pairs
    (ball density / topic membership, not dup structure — the round-6
    fingerprint lesson in embedding space)."""
    import numpy as np
    import pandas as pd

    if asg is None:
        asg = _assignments(spark, sf_dir)
    slack = threshold - 1e-9

    def block_candidates(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        m = np.stack(pdf["v"].to_numpy())
        u = m / pdf["nrm"].to_numpy()[:, None]
        sim = u @ u.T
        i, j = np.triu_indices(len(pdf), k=1)
        keep = sim[i, j] >= slack
        ids = pdf["vec_id"].to_numpy()
        a, b = ids[i[keep]], ids[j[keep]]
        return pd.DataFrame({"id_a": np.minimum(a, b), "id_b": np.maximum(a, b)})

    cand = asg.groupBy("cid").applyInPandas(block_candidates, "id_a long, id_b long")
    va = asg.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("v_a"),
        F.col("nrm").alias("nrm_a"),
    )
    vb = asg.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("v_b"),
        F.col("nrm").alias("nrm_b"),
    )
    cos = _dot(F.col("v_a"), F.col("v_b")) / (F.col("nrm_a") * F.col("nrm_b"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .filter(cos >= threshold)
        .select(F.col("id_a").alias("d1"), F.col("id_b").alias("d2"))
    )
