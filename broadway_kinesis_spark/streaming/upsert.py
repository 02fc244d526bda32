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

Scale posture: the merge is ONE window over (previous snapshot UNION
batch latest) — the batch side collapses to one row per touched key
map-side before the union, so shuffle volume is snapshot + touched keys.
Rewriting the full snapshot per batch is the plain-parquet cost of
rewrite semantics; at 100 TB the snapshot lives in a transactional table
whose MERGE rewrites only the files containing touched keys (the
pointer-flip protocol here is exactly the moral core of what those
formats' commit logs do — this module keeps it hermetic).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_CURRENT = "_CURRENT"

#: columns a change row must carry: key -> (user_id, event_type),
#: ordering -> (ts, seq), payload -> value.
KEY_COLS = ["user_id", "event_type"]
ORDER_COLS = ["ts", "seq"]
VALUE_COL = "value"
_ALL = KEY_COLS + ORDER_COLS + [VALUE_COL]


def current_version(snapshot_dir: str) -> int:
    """Version named by the pointer; -1 when no snapshot exists yet.

    Only a MISSING pointer means bootstrap. An unparsable pointer is
    corruption (e.g. a non-atomic copy/restore of the directory) and must
    fail loudly — treating it as -1 would silently rebuild the snapshot
    from the next batch alone, discarding all accumulated state."""
    try:
        with open(os.path.join(snapshot_dir, _CURRENT), encoding="utf-8") as f:
            raw = f.read().strip()
    except FileNotFoundError:
        return -1
    try:
        return int(raw)
    except ValueError as exc:
        raise RuntimeError(
            f"corrupted snapshot pointer {snapshot_dir}/{_CURRENT}: {raw!r} "
            "(refusing to reset state; restore the pointer or remove the "
            "snapshot directory deliberately)"
        ) from exc


def read_snapshot(spark, snapshot_dir: str) -> DataFrame | None:
    """The rows of the current snapshot version (None before any commit)."""
    v = current_version(snapshot_dir)
    if v < 0:
        return None
    return spark.read.parquet(os.path.join(snapshot_dir, f"v={v}"))


def _latest_per_key(df: DataFrame) -> DataFrame:
    w = Window.partitionBy(*KEY_COLS).orderBy(
        *[F.desc(c) for c in ORDER_COLS]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def commit_snapshot_version(merged: DataFrame, snapshot_dir: str, v: int) -> int:
    """Write ``merged`` as version ``v+1`` and atomically flip the pointer
    (steps 3-4 of the module protocol, shared with the day-sketch sink in
    streaming/rolling_sketch.py). Returns the new version number; GCs
    versions older than the immediately previous one."""
    new_v = v + 1
    new_dir = os.path.join(snapshot_dir, f"v={new_v}")
    if os.path.exists(new_dir):  # leftover from a crash before the flip
        shutil.rmtree(new_dir)
    merged.write.parquet(new_dir)

    tmp = os.path.join(snapshot_dir, _CURRENT + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(str(new_v))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(snapshot_dir, _CURRENT))
    for name in os.listdir(snapshot_dir):
        if name.startswith("v="):
            try:
                old = int(name[2:])
            except ValueError:
                continue
            if old < v:
                shutil.rmtree(os.path.join(snapshot_dir, name), ignore_errors=True)
    return new_v


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

    batch_latest = _latest_per_key(batch_df.select(*_ALL))
    if batch_latest.isEmpty():
        # An empty micro-batch (idle trigger) must not rewrite state-sized
        # data for zero information — the current version stays current.
        return v
    prev = read_snapshot(spark, snapshot_dir)
    merged = (
        _latest_per_key(prev.select(*_ALL).unionByName(batch_latest))
        if prev is not None
        else batch_latest
    )
    # commit_snapshot_version flips the pointer atomically and GCs versions
    # < v (keeping the immediately previous one so a concurrent reader of
    # the old pointer value never loses its files mid-read).
    return commit_snapshot_version(merged, snapshot_dir, v)


def cdc_upsert_sink(snapshot_dir: str):
    """``foreachBatch`` callable running :func:`upsert_batch_into_snapshot`."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch_into_snapshot(batch_df, snapshot_dir)

    return sink
