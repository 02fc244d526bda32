"""ANN recall report — the similarity-family twin of
``composite_dedup_recall``.

Swapping brute-force top-k for IVF probing trades recall for the
O(N·nprobe/k) per-query cost, and the honest number is recall measured
ON YOUR CORPUS, not the paper curve: a query whose true neighbors
straddle a centroid boundary loses them no matter how good the index
looks on average. Both channels are registered, oracle-verified
operators (`similarity_topk_cosine` exact, `similarity_ann_ivf_probe`
{N_PROBE}-probe IVF) with IDENTICAL scoring and tie-breaks, so the
per-query overlap of their top-{K} id sets isolates exactly what the
coarse quantizer loses.

Output: one row per query — exact-neighbor count, probe hits, and
recall in integer micro-units (overlap counting uses ids only, so no
float crosses the oracle hash despite the float scores inside both
channels).

Scale posture (100 TB): both inputs are top-k outputs (N_QUERIES × K
rows); the report joins and aggregates them — negligible against either
channel. Run it on a sampled query set whenever the index parameters
(k, nprobe, training sample) change.

Reference parity: [TGT] — engine extension (SURVEY §2.B similarity
family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.operators.similarity import (
    K,
    N_PROBE,
    SQL_TOPK_EXACT,
    SQL_TOPK_IVF_PROBE,
    similarity_ann_ivf_probe,
    similarity_topk_cosine,
)
from broadway_kinesis_spark.registry import query

MICRO = 1_000_000


@query(
    "composite_ann_recall",
    oracle=f"""
    WITH ex AS ({SQL_TOPK_EXACT}),
    pr AS ({SQL_TOPK_IVF_PROBE}),
    base AS (
        SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM ex GROUP BY query_id
    ),
    hits AS (
        SELECT ex.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM ex JOIN pr
          ON ex.query_id = pr.query_id AND ex.cand_id = pr.cand_id
        GROUP BY ex.query_id
    )
    SELECT base.query_id, base.n_exact,
           COALESCE(hits.n_hits, CAST(0 AS BIGINT)) AS n_hits,
           CAST(COALESCE(hits.n_hits, 0) * {MICRO} // base.n_exact AS BIGINT)
               AS recall_micro
    FROM base LEFT JOIN hits ON base.query_id = hits.query_id
    """,
)
def composite_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query IVF recall: overlap of the exact and {N_PROBE}-probe
    top-{K} neighbor id sets, in integer micro-units."""
    ex = similarity_topk_cosine(spark, sf_dir).select("query_id", "cand_id")
    pr = similarity_ann_ivf_probe(spark, sf_dir).select("query_id", "cand_id")
    base = ex.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    hits = (
        ex.join(pr, ["query_id", "cand_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        base.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
            F.expr(f"coalesce(n_hits, 0) * {MICRO} div n_exact").alias(
                "recall_micro"
            ),
        )
    )
