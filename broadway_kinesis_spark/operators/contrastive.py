"""Contrastive-training data mining: hard negatives from embedding space.

The similarity family (operators/similarity.py) answers "what is nearest";
this module answers the training-data question built on top of it: for
each anchor vector, which vectors of a DIFFERENT label are most similar —
the hard negatives a contrastive/embedding-training pipeline mines to
make batches informative (the highest-loss negatives, not random ones).
Own module per the per-file staleness rule (tests/test_registry_window.py).

Reference parity: [TGT] — BASELINE.json north star; no processing
surface in the reference (hard-negative mining per Robinson et al. 2021,
public literature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

_SQL_DOT = "list_sum(list_transform(list_zip({a}, {b}), x -> x[1]*x[2]))"

N_ANCHORS = 16  # anchor batch: lowest vec_ids (deterministic in both engines)
TOP_NEG = 4     # hard negatives mined per anchor


@query(
    "mine_hard_negatives",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v,
               sqrt({_SQL_DOT.format(a='embedding::DOUBLE[]', b='embedding::DOUBLE[]')}) AS nrm
        FROM embeddings
    ), a AS (
        SELECT vec_id AS anchor_id, label AS anchor_label, v AS av, nrm AS anrm
        FROM e ORDER BY vec_id LIMIT {N_ANCHORS}
    ), scored AS (
        SELECT a.anchor_id, a.anchor_label, e.vec_id AS neg_id,
               e.label AS neg_label,
               {_SQL_DOT.format(a='a.av', b='e.v')} / (a.anrm * e.nrm) AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY a.anchor_id
                   ORDER BY {_SQL_DOT.format(a='a.av', b='e.v')}
                            / (a.anrm * e.nrm) DESC, e.vec_id) AS rank
        FROM a JOIN e ON e.label <> a.anchor_label
    )
    SELECT anchor_id, anchor_label, rank, neg_id, neg_label,
           CAST(floor(cos * 1e6 + 0.5) AS BIGINT) AS cos_micro
    FROM scored WHERE rank <= {TOP_NEG}
    """,
)
def mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-TOP_NEG (4) hard negatives per anchor: the most-cosine-similar
    vectors whose label DIFFERS from the anchor's. Anchors are the
    N_ANCHORS (16) lowest vec_ids — a deterministic stand-in for the
    query batch a training loop would hand in.

    Exactness: cosines use the family's sequential-fold float64 dot
    (bitwise-equal to DuckDB's list_sum/list_transform), ranking runs on
    the raw double with vec_id tie-break, and the reported score is an
    integer micro-unit floor(x*1e6+0.5) — no float round crosses the
    hash.

    Scale posture: the anchor batch is broadcast (it is a batch, not a
    corpus), so scoring is a map-side nested loop over corpus partitions
    — the corpus never shuffles; only (anchor x corpus) SCORE rows, not
    vectors, reach the per-anchor top-k window, and that window
    partitions on anchor_id so the batch parallelizes across executors.
    At 100 TB the scoring tier swaps the per-row fold for the
    per-partition Arrow matmul exactly as similarity_topk_cosine_pandas
    does (same two-tier contract: matmul candidates, fold verify), and
    the corpus side pre-prunes through the persisted IVF index
    (operators/ann_persist.py) so each anchor only scores its probed
    clusters."""
    e = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    base = e.select(
        "vec_id", "label", v.alias("v"), F.sqrt(dot(v, v)).alias("nrm")
    )
    anchors = (
        base.orderBy("vec_id")
        .limit(N_ANCHORS)
        .select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("anchor_label"),
            F.col("v").alias("av"),
            F.col("nrm").alias("anrm"),
        )
    )
    cos = dot(F.col("av"), F.col("v")) / (F.col("anrm") * F.col("nrm"))
    scored = (
        base.join(
            F.broadcast(anchors),
            F.col("label") != F.col("anchor_label"),
        )
        .withColumn("cos", cos)
    )
    rank = F.row_number().over(
        Window.partitionBy("anchor_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    )
    return (
        scored.withColumn("rank", rank)
        .filter(F.col("rank") <= TOP_NEG)
        .select(
            "anchor_id", "anchor_label", "rank",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.expr("CAST(floor(cos * 1e6 + 0.5) AS BIGINT)").alias("cos_micro"),
        )
    )
