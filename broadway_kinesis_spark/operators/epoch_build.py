"""End-to-end epoch build: curate -> epoch-shuffle -> pack (VERDICT r3 #6).

The composed pipeline a training run actually executes before writing an
epoch to disk, chaining three stages this engine already provides as
individual operators into one plan:

1. **curate** — the repetition/length gate (a minimum-token filter here;
   the full Gopher-style gates are ``text_repetition_score``);
2. **shuffle** — :func:`curation.epoch_shuffle`: deterministic epoch-keyed
   md5 shard + within-shard order (the shard-parallel training-order
   shuffle, never a global sort);
3. **pack** — ``pack_sequences``-style concat-then-chunk IN THE SHUFFLED
   ORDER: within each shard, documents lie end-to-end by ``pos_in_shard``
   and each lands in the context window its first token falls into.

That ordering dependency is why the composition matters: packing consumes
the shuffle's output order, so the stages cannot be reordered or run
independently — the composed plan is one pipeline with exactly one
exchange (the shard hash), one window pass, and one map-side-combinable
aggregation riding the same partitioning. At 100 TB each shard packs
independently; raising the shard count (a parameter since this round) is
the whole scaling story.

Reference parity: [TGT] — no curation surface in the reference
(lib/broadway_kinesis/producer.ex:1-37); engine extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.operators.curation import (
    _epoch_key_sql,
    _shard_sql,
    epoch_shuffle,
)
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

MIN_TOKENS = 5  # curation gate: drop degenerate shreds
BUILD_BUDGET = 512  # tokens per packed context window (= pipeline_ops.PACK_BUDGET)
BUILD_SHARDS = 8  # pinned for the oracle; production callers scale it

_TOK_SQL = "len(string_split(lower(text), ' '))"


@query(
    "pipeline_epoch_build",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               {_TOK_SQL} AS n_tok,
               {_epoch_key_sql("doc_id", 0)} AS ekey,
               {_shard_sql("doc_id", 0, BUILD_SHARDS)} AS shard_id
        FROM documents
        WHERE {_TOK_SQL} >= {MIN_TOKENS}
    ), c AS (
        SELECT shard_id, n_tok,
               SUM(n_tok) OVER (PARTITION BY shard_id ORDER BY ekey, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM t
    )
    SELECT shard_id,
           CAST((cum - n_tok) // {BUILD_BUDGET} AS BIGINT) AS chunk_id,
           COUNT(*)::BIGINT AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS chunk_tokens
    FROM c GROUP BY shard_id, chunk_id
    """,
)
def pipeline_epoch_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curate -> shuffle -> pack at a pinned {BUILD_SHARDS}-shard layout:
    token-gate the corpus, epoch-shuffle it (shard + in-shard order from
    the epoch-keyed md5), then pack each shard's stream into
    {BUILD_BUDGET}-token context windows in that order, reporting per-
    window doc counts and token totals. The window and the aggregation
    both key on shard_id, so the shard hash exchange is the plan's only
    shuffle; a new epoch (new salt) re-shuffles and re-packs with zero
    code change."""
    d = load(spark, sf_dir, "documents")
    gated = d.select(
        "doc_id", F.size(F.split(F.lower("text"), " ")).alias("n_tok")
    ).filter(F.col("n_tok") >= MIN_TOKENS)
    shuffled = epoch_shuffle(gated, key_col="doc_id", epoch=0, n_shards=BUILD_SHARDS)
    w = (
        Window.partitionBy("shard_id")
        .orderBy("pos_in_shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = shuffled.withColumn("cum", F.sum("n_tok").over(w))
    chunk = F.expr(f"(cum - n_tok) div {BUILD_BUDGET}")
    return (
        c.select("shard_id", chunk.alias("chunk_id"), "n_tok")
        .groupBy("shard_id", "chunk_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("chunk_tokens"))
    )
