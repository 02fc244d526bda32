"""Streaming rolling-distinct state — the streaming twin of
``window_rolling_distinct`` (operators/rolling.py).

The batch operator proves the shape (raw events collapse ONCE into
per-day HLL sketches; any rolling window is a union over blobs); this
sink makes the sketch table LIVE: each micro-batch folds its events into
a persistent per-day sketch snapshot, and rolling distinct counts are
served from the stored blobs alone — zero raw-event re-reads, at any
window width, across query restarts.

State layout and crash posture are inherited from streaming/snapshot_store.py's
versioned-snapshot/atomic-pointer protocol (``commit_snapshot_version``):
each batch writes a NEW version of the (day_id, sk) table and flips
``_CURRENT``; a crash at any point leaves a complete version, and replay
re-merges the same events — which HLL absorbs EXACTLY, because sketch
insertion is idempotent (re-adding a user to a day's sketch is a no-op on
its registers). That makes this sink effectively-once in the estimate
domain without any dedup bookkeeping at all — the strongest replay story
of the three sinks, bought purely by the state type's algebra.

Scale posture: per batch, the map-side-combinable ``hll_sketch_agg``
reduces arbitrary event volume to one blob per touched day; the merge
with stored state unions blobs per day (a #days-row job); serving is a
range-self-join over the same #days rows. At 100 TB the only
event-volume-proportional work is the per-batch partial sketch — exactly
the cost floor of reading the batch at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from broadway_kinesis_spark.streaming.snapshot_store import (
    commit_snapshot_version,
    current_version,
    read_snapshot,
)

US_PER_DAY = 86_400_000_000
LG_K = 12


def fold_batch_into_day_sketches(batch_df: DataFrame, state_dir: str) -> int:
    """Fold one micro-batch of (ts, user_id) events into the persistent
    per-day sketch snapshot; returns the committed version (current
    version unchanged for an empty batch)."""
    import os

    spark = batch_df.sparkSession
    os.makedirs(state_dir, exist_ok=True)
    v = current_version(state_dir)

    partial = (
        batch_df.select(
            F.expr(f"unix_micros(ts) div {US_PER_DAY}").alias("day_id"),
            "user_id",
        )
        .groupBy("day_id")
        .agg(F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("sk"))
    )
    if partial.isEmpty():
        return v
    prev = read_snapshot(spark, state_dir)
    merged = (
        prev.unionByName(partial)
        .groupBy("day_id")
        .agg(F.hll_union_agg("sk").alias("sk"))
        if prev is not None
        else partial
    )
    return commit_snapshot_version(merged, state_dir, v)


def rolling_sketch_sink(state_dir: str):
    """``foreachBatch`` callable running :func:`fold_batch_into_day_sketches`."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch_into_day_sketches(batch_df, state_dir)

    return sink


def serve_rolling_distinct(spark, state_dir: str, window_days: int) -> DataFrame:
    """(day_id, est_users): trailing-``window_days`` distinct-user estimate
    per observed day, computed ONLY from the stored day sketches — no raw
    events are touched; any window width is a re-union over blobs."""
    sk = read_snapshot(spark, state_dir)
    if sk is None:
        raise FileNotFoundError(f"no sketch state committed under {state_dir}")
    anchor = sk.select(F.col("day_id").alias("d"))
    return (
        anchor.join(
            sk,
            (F.col("day_id") >= F.col("d") - (window_days - 1))
            & (F.col("day_id") <= F.col("d")),
        )
        .groupBy("d")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est_users")
        )
        .select(F.col("d").alias("day_id"), "est_users")
    )
