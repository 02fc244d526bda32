"""Streaming CDC upsert — `cdc_merge_upsert` as a sink.

The streaming twin of the batch MERGE classification (operators/cdc.py):
a keyed change stream is folded, micro-batch by micro-batch, into a
persistent LATEST-WINS SNAPSHOT table — the materialized "current state"
every lakehouse upsert pipeline (Delta/Iceberg/Hudi MERGE INTO) maintains.
A key's row reflects the change with the highest (ts, seq) seen in ANY
batch of ANY run, so late/out-of-order arrivals never regress the
snapshot.

Commit protocol — versioned snapshot + atomic pointer, NOT the
marker/self-heal protocol of streaming/incremental.py, and deliberately
so: that protocol fits APPEND-ONLY state (heal = re-derive missing
appends), while an upsert REWRITES rows, which plain parquet cannot do in
place. Each batch therefore:

1. reads the snapshot version named by the ``_CURRENT`` pointer file;
2. merges the batch (latest-per-key window over union; snapshot rows
   carry their original (ts, seq) so ordering is global, not per-batch);
3. writes the merged snapshot to a NEW version directory ``v=<n+1>``;
4. atomically flips ``_CURRENT`` to it (``os.replace`` of a temp file —
   atomic on POSIX) and best-effort deletes versions older than the
   previous one.

A crash at ANY point leaves ``_CURRENT`` naming a complete, consistent
version: before the flip the half-written ``v=<n+1>`` is invisible and
the replayed batch rebuilds it; after the flip the replayed batch merges
the same changes AGAIN, which latest-wins makes idempotent (same (ts,
seq) maxima -> same rows). Effectively-once snapshot state on top of the
source's A14 at-least-once replay, without a transaction log.

Scale posture — incremental by key bucket (VERDICT r4 #5): every
snapshot version is hive-partitioned on ``kb = user_id mod N_KB``, and a
batch only REWRITES the buckets its keys touch:

- the previous version is read partition-PRUNED to the touched buckets
  (the merge window never sees untouched state);
- untouched bucket directories are HARD-LINKED from the previous version
  into the new one — zero data I/O, byte-identical files by construction
  (link fallback: copy, for cross-device dirs);
- the pointer flip is unchanged, so crash semantics are exactly the old
  protocol's: ``_CURRENT`` always names a complete version, and replay
  is latest-wins idempotent. GC unlink only drops link refcounts, so
  removing an old version never disturbs the files a newer version
  shares with it.

Per-batch cost therefore scales with touched-bucket volume, not snapshot
size — the moral core of what Delta/Iceberg/Hudi MERGE INTO does with
file-level rewrite + commit log, kept hermetic on plain parquet. At
100 TB you raise N_KB so a bucket approximates a task-sized file set.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.streaming.snapshot_store import (  # noqa: F401
    commit_snapshot_version,  # re-exported: rolling_sketch-era public name
    current_version,
    flip_pointer_and_gc as _flip_pointer_and_gc,
    link_tree as _link_tree,
    prepare_version_dir as _prepare_version_dir,
    read_snapshot,
    read_snapshot_raw as _read_snapshot_raw,
)


#: columns a change row must carry: key -> (user_id, event_type),
#: ordering -> (ts, seq), payload -> value.
KEY_COLS = ["user_id", "event_type"]
ORDER_COLS = ["ts", "seq"]
VALUE_COL = "value"
_ALL = KEY_COLS + ORDER_COLS + [VALUE_COL]

#: key buckets per snapshot version (kb = user_id mod N_KB — a pure
#: function of the key's first column, so every key lives in exactly one
#: bucket and bucket membership survives restarts). Raise at real scale so
#: one bucket ~ a task-sized file set.
N_KB = 8


def _kb(col: str = "user_id"):
    return F.pmod(F.col(col), F.lit(N_KB)).cast("int")


def _latest_per_key(df: DataFrame) -> DataFrame:
    w = Window.partitionBy(*KEY_COLS).orderBy(
        *[F.desc(c) for c in ORDER_COLS]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def upsert_batch_into_snapshot(batch_df: DataFrame, snapshot_dir: str) -> int:
    """Fold one micro-batch of changes into the snapshot; returns the new
    version number. ``batch_df`` needs columns ``user_id, event_type, ts,
    seq, value``. (Deliberately NOT the snapshot row count: that would
    re-scan the entire just-written version every batch — state-sized I/O
    for a diagnostic; count via :func:`read_snapshot` when actually
    needed.)"""
    spark = batch_df.sparkSession
    os.makedirs(snapshot_dir, exist_ok=True)
    v = current_version(snapshot_dir)

    batch_latest = _latest_per_key(batch_df.select(*_ALL)).withColumn("kb", _kb())
    # Touched buckets: bounded collect (<= N_KB ints) — it IS the
    # partition-pruning mechanism, same pattern as ann_persist's probed
    # cluster labels.
    touched = sorted(r.kb for r in batch_latest.select("kb").distinct().collect())
    if not touched:
        # An empty micro-batch (idle trigger) must not rewrite state-sized
        # data for zero information — the current version stays current.
        return v

    prev = _read_snapshot_raw(spark, snapshot_dir)
    if prev is not None:
        if "kb" not in prev.columns:  # pre-bucketing flat version: migrate
            prev = prev.withColumn("kb", _kb())
            prev_touched = prev.filter(F.col("kb").isin(touched))
            untouched_src = None
            prev_untouched = prev.filter(~F.col("kb").isin(touched))
        else:
            # partition-pruned read: untouched buckets never enter the plan
            prev_touched = prev.filter(F.col("kb").isin(touched))
            untouched_src = os.path.join(snapshot_dir, f"v={v}")
            prev_untouched = None
        merged = _latest_per_key(
            prev_touched.select(*_ALL, "kb").unionByName(batch_latest)
        )
    else:
        merged, untouched_src, prev_untouched = batch_latest, None, None

    new_v = v + 1
    new_dir = _prepare_version_dir(snapshot_dir, new_v)
    if prev_untouched is not None:  # one-time migration of a flat version
        merged = merged.unionByName(prev_untouched.select(*_ALL, "kb"))
    merged.write.partitionBy("kb").parquet(new_dir)
    if untouched_src is not None:
        touched_set = set(touched)
        for name in os.listdir(untouched_src):
            if name.startswith("kb=") and int(name[3:]) not in touched_set:
                _link_tree(
                    os.path.join(untouched_src, name), os.path.join(new_dir, name)
                )
    return _flip_pointer_and_gc(snapshot_dir, v, new_v)


def cdc_upsert_sink(snapshot_dir: str):
    """``foreachBatch`` callable running :func:`upsert_batch_into_snapshot`."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch_into_snapshot(batch_df, snapshot_dir)

    return sink
