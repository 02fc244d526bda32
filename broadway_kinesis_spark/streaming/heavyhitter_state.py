"""Streaming heavy-hitter state — live frequent-items on the shared fence.

The streaming twin of ``operators/heavyhitters.py``: micro-batches of
text fold into a persistent (token -> count) table, and "which tokens
exceed θ of everything seen so far" is served from the merged state at
any time — the live stop-word/boilerplate-phrase monitor a streaming
curation pipeline keeps.

Token counts are COUNTS, so like the histogram sink they have no
semantic replay idempotency — a replayed batch would double-count. This
sink is the second consumer of the shared batch-id fence
(``snapshot_store.commit_snapshot_version(meta=...)``): the micro-batch
high-water mark commits inside the version's ``_META`` before the
pointer flips, and replays at or below it fold nothing. One shared
implementation, two sinks — exactly what the round-6 extraction of
``streaming/snapshot_store.py`` was for.

Scale posture: the batch aggregates map-side to (token, cnt) partials
and outer-merges with the vocabulary-sized state; state I/O per batch is
O(vocabulary), never O(stream). Serving applies the θ filter against
the state's own total (derived, not separately tracked — one fewer
invariant to corrupt).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from broadway_kinesis_spark.operators.heavyhitters import THETA_DEN, THETA_NUM
from broadway_kinesis_spark.streaming.snapshot_store import (
    commit_snapshot_version,
    committed_batch_id,
    current_version,
    read_snapshot,
)


def fold_batch_into_heavy_hitters(
    batch_df: DataFrame, state_dir: str, batch_id: int
) -> int:
    """Fold one micro-batch's token counts into state; returns the
    committed version (unchanged on a fenced replay or an empty batch).
    ``batch_df`` needs a ``text`` column."""
    spark = batch_df.sparkSession
    os.makedirs(state_dir, exist_ok=True)
    v = current_version(state_dir)
    if batch_id <= committed_batch_id(state_dir):
        return v  # at-least-once replay of an already-committed batch

    partial = (
        batch_df.select(
            F.explode(F.split(F.lower("text"), " ")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    ).persist()
    try:
        if partial.isEmpty():
            return v  # idle trigger: no watermark advance, no state rewrite
        prev = read_snapshot(spark, state_dir)
        merged = (
            prev.unionByName(partial)
            .groupBy("token")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            if prev is not None
            else partial
        )
        return commit_snapshot_version(
            merged, state_dir, v, meta={"last_batch_id": batch_id}
        )
    finally:
        partial.unpersist()


def heavy_hitter_sink(state_dir: str):
    """``foreachBatch`` callable — forwards Spark's batch_id into the fence."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch_into_heavy_hitters(batch_df, state_dir, batch_id)

    return sink


def serve_heavy_hitters(spark, state_dir: str) -> DataFrame:
    """Tokens with count >= θ·total over EVERYTHING folded so far — the
    same integer cross-multiplied threshold as the batch operator, against
    the state's own derived total."""
    state = read_snapshot(spark, state_dir)
    if state is None:
        raise FileNotFoundError(f"no heavy-hitter state at {state_dir}")
    total = state.agg(F.sum("cnt").cast("long").alias("total"))
    return (
        state.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * THETA_DEN >= F.col("total") * THETA_NUM)
        .select("token", "cnt", F.col("total").alias("total_tokens"))
    )
