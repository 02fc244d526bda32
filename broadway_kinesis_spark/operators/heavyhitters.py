"""Exact heavy hitters with a pigeonhole-lossless per-shard pre-gate.

"Which tokens exceed θ of the corpus?" — the frequent-items question
behind stop-word lists, boilerplate phrase detection, and n-gram
blocklists. The naive plan aggregates the full vocabulary and filters;
at 100 TB the interesting part is pruning BEFORE the global aggregation
without losing exactness. This operator is the Misra-Gries/Space-Saving
idea made exact by a pigeonhole bound:

    global_count(t) >= θ·N  ⟹  max_shard_count(t) >= θ·N / S

(the max over S shards is at least the mean, regardless of shard-size
skew). So tokens whose count reaches θ·N/S in AT LEAST ONE shard form a
PROVABLY COMPLETE candidate set — the same lossless-rewrite shape as
``dedup_decontaminate_bloom``, and the oracle is therefore the plain
one-aggregation HAVING query, verbatim: hash equality proves the gate
drops nothing.

Plan shape: one corpus explode -> per-(shard, token) counts (map-side
combinable; the only corpus-sized exchange) -> the candidate set is
bounded by construction (at most S/θ tokens can clear the bound in a
shard) -> candidates semi-join the shard-count table and re-sum to exact
global counts (vocabulary-sized work). N itself is a 1-row scalar
aggregate broadcast onto the gate.

Reference parity: [TGT] — engine extension (SURVEY §2.B agg family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

N_SHARDS = 16
THETA_NUM, THETA_DEN = 1, 200  # θ = 0.5% of all tokens


@query(
    "agg_heavy_hitters",
    oracle=f"""
    WITH tok AS (
        SELECT UNNEST(string_split(lower(text), ' ')) AS token FROM documents
    ), n AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tok
    )
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt,
           (SELECT total FROM n) AS total_tokens
    FROM tok
    GROUP BY token
    HAVING COUNT(*) * {THETA_DEN} >= (SELECT total FROM n) * {THETA_NUM}
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every token with count >= θ·N (θ = {THETA_NUM}/{THETA_DEN}), with
    its exact count and the corpus token total — computed through the
    shard pre-gate, hash-equal to the ungated HAVING oracle."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        F.pmod(F.col("doc_id"), F.lit(N_SHARDS)).cast("int").alias("shard"),
        F.explode(F.split(F.lower("text"), " ")).alias("token"),
    )
    # the one corpus-sized exchange, map-side combined to (shard, token)
    level1 = tok.groupBy("shard", "token").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    total = level1.agg(F.sum("cnt").cast("long").alias("total"))
    # pigeonhole gate: integer cross-multiplication, no float threshold.
    # cnt >= θ·N/S  <=>  cnt · DEN · S >= N · NUM
    gated = level1.crossJoin(F.broadcast(total)).filter(
        F.col("cnt") * (THETA_DEN * N_SHARDS) >= F.col("total") * THETA_NUM
    )
    candidates = gated.select("token").distinct()
    return (
        level1.join(candidates, "token")
        .groupBy("token")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * THETA_DEN >= F.col("total") * THETA_NUM)
        .select("token", "cnt", F.col("total").alias("total_tokens"))
    )
