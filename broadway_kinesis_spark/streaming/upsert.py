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

#: key buckets per snapshot version (kb = user_id mod N_KB — a pure
#: function of the key's first column, so every key lives in exactly one
#: bucket and bucket membership survives restarts). Raise at real scale so
#: one bucket ~ a task-sized file set.
N_KB = 8


def _kb(col: str = "user_id"):
    return F.pmod(F.col(col), F.lit(N_KB)).cast("int")


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
    """The rows of the current snapshot version (None before any commit).
    Drops the ``kb`` partition column when present, so callers see the
    logical schema whether the version is bucketed (this sink) or flat
    (rolling_sketch.py shares the pointer protocol, not the layout)."""
    df = _read_snapshot_raw(spark, snapshot_dir)
    if df is not None and "kb" in df.columns:
        df = df.drop("kb")
    return df


def _read_snapshot_raw(spark, snapshot_dir: str) -> DataFrame | None:
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


def _flip_pointer_and_gc(snapshot_dir: str, v: int, new_v: int) -> int:
    """Steps 3-4 of the module protocol: atomically point ``_CURRENT`` at
    ``new_v``, then GC versions older than the immediately previous one
    (kept so a concurrent reader of the old pointer value never loses its
    files mid-read). Under the bucketed layout GC is just unlink —
    hard-linked files shared with newer versions only drop a refcount."""
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


def commit_snapshot_version(merged: DataFrame, snapshot_dir: str, v: int) -> int:
    """Write ``merged`` as version ``v+1`` (flat layout) and flip the
    pointer — the form streaming/rolling_sketch.py shares. Returns the new
    version number."""
    new_v = v + 1
    new_dir = os.path.join(snapshot_dir, f"v={new_v}")
    if os.path.exists(new_dir):  # leftover from a crash before the flip
        shutil.rmtree(new_dir)
    merged.write.parquet(new_dir)
    return _flip_pointer_and_gc(snapshot_dir, v, new_v)


def _link_tree(src: str, dst: str) -> None:
    """Mirror ``src`` into ``dst`` via hard links (copy fallback for
    filesystems without link support). Links make untouched buckets
    byte-identical across versions at zero data I/O."""
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        s, d = os.path.join(src, name), os.path.join(dst, name)
        if os.path.isdir(s):
            _link_tree(s, d)
        else:
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)


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
    new_dir = os.path.join(snapshot_dir, f"v={new_v}")
    if os.path.exists(new_dir):  # leftover from a crash before the flip
        shutil.rmtree(new_dir)
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
