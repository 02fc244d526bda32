"""Streaming mergeable-histogram state — counts with a batch-id fence.

The streaming twin of ``operators/quantiles.py``: micro-batches of events
fold into a persistent (bucket -> count) histogram, and any quantile is
served from the merged summary at any time — the live-p99 dashboard shape,
with state that is a few dozen integers regardless of stream volume.

The new protocol piece here is the EXACTLY-ONCE FENCE. The other three
snapshot sinks survive at-least-once replay by SEMANTIC idempotency:
HLL inserts re-absorb duplicates (rolling_sketch), latest-wins re-picks
the same maxima (upsert), digest anti-joins re-reject (incremental).
COUNTS have no such property — folding a replayed batch twice
double-counts — so this sink commits the micro-batch id WITH the state
and refuses batches at or below the committed high-water mark:

1. each version directory carries a ``_META`` json (``last_batch_id``)
   written BEFORE the pointer flips to that version;
2. ``foreachBatch`` replays a batch only with its ORIGINAL batch id and
   content (Spark's checkpoint contract), so on replay the current
   version's watermark already covers it -> the fold is skipped.

Crash anywhere keeps the invariant: before the flip, ``_CURRENT`` names
the old version whose watermark is one batch behind — the replayed batch
folds onto it exactly once; after the flip, the watermark covers the
batch and the replay is a no-op. This is the standard transactional
recipe for non-idempotent foreachBatch sinks, kept hermetic on the shared
versioned-snapshot/atomic-pointer protocol (streaming/snapshot_store.py).

Scale posture: the per-batch fold aggregates the BATCH map-side to
(bucket, cnt) partials and outer-merges them with the summary-sized state
(dozens of rows); state I/O per batch is O(buckets), never O(stream).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from broadway_kinesis_spark.operators.quantiles import W
from broadway_kinesis_spark.streaming.snapshot_store import (  # noqa: F401
    commit_snapshot_version,
    committed_batch_id,  # re-exported: the fence's public read side
    current_version,
    read_snapshot,
)


def fold_batch_into_histogram(
    batch_df: DataFrame, state_dir: str, batch_id: int
) -> int:
    """Fold one micro-batch's value histogram into state; returns the
    committed version (unchanged if the fence skipped a replay or the
    batch was empty). ``batch_df`` needs a ``value`` column."""
    spark = batch_df.sparkSession
    os.makedirs(state_dir, exist_ok=True)
    v = current_version(state_dir)
    if batch_id <= committed_batch_id(state_dir):
        return v  # at-least-once replay of an already-committed batch

    # persist: the emptiness probe and the snapshot write would otherwise
    # each re-run the batch aggregation (code-review finding — two full
    # batch scans on the hot path)
    partial = (
        batch_df.select(F.floor(F.col("value") / W).cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    ).persist()
    try:
        if partial.isEmpty():
            # an idle trigger advances NO watermark: an empty replay of
            # batch N must not fence out the real batch N's later replay
            # with rows — Spark replays a batch with identical content, so
            # if THIS run saw it empty, every replay will; skipping the
            # commit is safe and avoids a state rewrite per idle tick.
            return v
        prev = read_snapshot(spark, state_dir)
        merged = (
            prev.unionByName(partial)
            .groupBy("bucket")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            if prev is not None
            else partial.select("bucket", F.col("cnt").cast("long").alias("cnt"))
        )
        # commit_snapshot_version stamps _META (fsynced) BEFORE the pointer
        # flip — the ordering the fence invariant rests on.
        return commit_snapshot_version(
            merged, state_dir, v, meta={"last_batch_id": batch_id}
        )
    finally:
        partial.unpersist()


def histogram_state_sink(state_dir: str):
    """``foreachBatch`` callable — forwards Spark's batch_id into the fence."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch_into_histogram(batch_df, state_dir, batch_id)

    return sink


def serve_quantiles(spark, state_dir: str, quantiles=(50, 90, 99)) -> DataFrame:
    """Answer quantiles from the live histogram state — THE SAME
    implementation as the batch operator (quantiles_from_histogram), so
    the threshold rule can never diverge between batch and streaming."""
    from broadway_kinesis_spark.operators.quantiles import quantiles_from_histogram

    hist = read_snapshot(spark, state_dir)
    if hist is None:
        raise FileNotFoundError(f"no histogram state at {state_dir}")
    return quantiles_from_histogram(hist, quantiles)
