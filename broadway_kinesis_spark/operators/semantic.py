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


@query(
    "dedup_semantic",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt({_SQL_DOT.format(a='embedding::DOUBLE[]', b='embedding::DOUBLE[]')}) AS nrm
        FROM embeddings
    ), c AS (
        SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT {SEM_K}
    ), asg AS (
        SELECT vec_id, v, nrm, cid FROM (
            SELECT e.vec_id, e.v, e.nrm, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_sum(list_transform(list_zip(e.v, c.cv),
                                         x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid
                   ) AS rn
            FROM e, c
        ) WHERE rn = 1
    ), dup AS (
        SELECT DISTINCT b.vec_id
        FROM asg a JOIN asg b
          ON a.cid = b.cid AND a.vec_id < b.vec_id
         AND {_SQL_DOT.format(a='a.v', b='b.v')} / (a.nrm * b.nrm) >= {SEM_T}
    )
    SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster,
           d.vec_id IS NULL AS keep
    FROM asg a LEFT JOIN dup d ON a.vec_id = d.vec_id
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
    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    e = e.select("vec_id", v.alias("v"), F.sqrt(dot(v, v)).alias("nrm"))
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
    asg = (
        e.crossJoin(F.broadcast(c))
        .withColumn("dist", sqdist)
        .withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "nrm", "cid")
    )
    slack = SEM_T - 1e-9

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
    cos = dot(F.col("v_a"), F.col("v_b")) / (F.col("nrm_a") * F.col("nrm_b"))
    dup = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .filter(cos >= SEM_T)
        .select(F.col("id_b").alias("dup_id"))
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
