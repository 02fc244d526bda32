"""Versioned-snapshot store: the shared commit protocol of the state sinks.

Four streaming sinks persist state as plain parquet with effectively-once
semantics on top of the source's at-least-once replay. Two commit
protocols exist (VERDICT r5 #6 asked for the shared one to live in ONE
place, the ``table_build.py``/``candidate_gen.py`` lesson applied to
``streaming/``):

- marker/self-heal (streaming/incremental.py) — fits APPEND-ONLY state,
  where healing is re-deriving missing appends; NOT this module;
- versioned snapshot + atomic pointer (THIS module) — fits state that is
  REWRITTEN per batch: each commit writes a complete new ``v=<n>``
  directory, then atomically flips the ``_CURRENT`` pointer file
  (``os.replace`` of a tmp — atomic on POSIX) and GCs versions older
  than the immediately previous one (kept so a concurrent reader of the
  old pointer never loses files mid-read).

A crash at ANY point leaves ``_CURRENT`` naming a complete, consistent
version; the replayed batch rebuilds the half-written successor. What
makes the REPLAY itself safe is per-sink, layered on top:

- semantic idempotency: latest-wins re-picks the same maxima
  (upsert.py), HLL inserts re-absorb duplicates (rolling_sketch.py);
- the batch-id FENCE for non-idempotent folds (histogram_state.py):
  ``meta={"last_batch_id": N}`` rides in the version directory's
  ``_META`` json, written and fsynced BEFORE the pointer flips, so a
  replayed batch at or below the committed high-water mark is skipped.

``link_tree`` supports the incremental layout (upsert.py's bucketed
versions): untouched subtrees hard-link forward at zero data I/O, and GC
unlink just drops refcounts, so removing an old version never disturbs
files a newer version shares with it.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame

_CURRENT = "_CURRENT"
_META = "_META"


def current_version(state_dir: str) -> int:
    """Version named by the pointer; -1 when no snapshot exists yet.

    Only a MISSING pointer means bootstrap. An unparsable pointer is
    corruption (e.g. a non-atomic copy/restore of the directory) and must
    fail loudly — treating it as -1 would silently rebuild the snapshot
    from the next batch alone, discarding all accumulated state."""
    try:
        with open(os.path.join(state_dir, _CURRENT), encoding="utf-8") as f:
            raw = f.read().strip()
    except FileNotFoundError:
        return -1
    try:
        return int(raw)
    except ValueError as exc:
        raise RuntimeError(
            f"corrupted snapshot pointer {state_dir}/{_CURRENT}: {raw!r} "
            "(refusing to reset state; restore the pointer or remove the "
            "snapshot directory deliberately)"
        ) from exc


def version_dir(state_dir: str, v: int) -> str:
    return os.path.join(state_dir, f"v={v}")


def read_snapshot_raw(spark, state_dir: str) -> DataFrame | None:
    """The current version's rows with its physical layout (partition
    columns included); None before any commit."""
    v = current_version(state_dir)
    if v < 0:
        return None
    return spark.read.parquet(version_dir(state_dir, v))


def read_snapshot(spark, state_dir: str) -> DataFrame | None:
    """The current version's LOGICAL rows (drops the ``kb`` bucket column
    when the version is bucketed), or None before any commit."""
    df = read_snapshot_raw(spark, state_dir)
    if df is not None and "kb" in df.columns:
        df = df.drop("kb")
    return df


def committed_batch_id(state_dir: str) -> int:
    """Fence high-water mark of the current version (-1 before any commit,
    or for versions committed without a ``meta``)."""
    v = current_version(state_dir)
    if v < 0:
        return -1
    try:
        with open(
            os.path.join(version_dir(state_dir, v), _META), encoding="utf-8"
        ) as f:
            return int(json.load(f)["last_batch_id"])
    except FileNotFoundError:
        return -1


def write_meta(new_dir: str, meta: dict) -> None:
    """Write the version's ``_META`` json durably (fsync) — must happen
    BEFORE the pointer flip for the fence invariant to hold."""
    with open(os.path.join(new_dir, _META), "w", encoding="utf-8") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())


def flip_pointer_and_gc(state_dir: str, v: int, new_v: int) -> int:
    """Atomically point ``_CURRENT`` at ``new_v``, then GC versions older
    than ``v`` (the immediately previous one survives for concurrent
    readers of the old pointer value). Under a hard-linked layout GC is
    just unlink — shared files only drop a refcount."""
    tmp = os.path.join(state_dir, _CURRENT + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(str(new_v))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(state_dir, _CURRENT))
    for name in os.listdir(state_dir):
        if name.startswith("v="):
            try:
                old = int(name[2:])
            except ValueError:
                continue
            if old < v:
                shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)
    return new_v


def prepare_version_dir(state_dir: str, new_v: int) -> str:
    """Path for the next version; clears a half-written leftover from a
    crash before the previous attempt's flip."""
    new_dir = version_dir(state_dir, new_v)
    if os.path.exists(new_dir):
        shutil.rmtree(new_dir)
    return new_dir


def commit_snapshot_version(
    merged: DataFrame,
    state_dir: str,
    v: int,
    *,
    partition_by: str | None = None,
    meta: dict | None = None,
) -> int:
    """The whole protocol in one call: write ``merged`` as version ``v+1``
    (optionally hive-partitioned), stamp ``meta`` into ``_META`` before
    the flip, flip the pointer, GC. Returns the new version number."""
    new_v = v + 1
    new_dir = prepare_version_dir(state_dir, new_v)
    writer = merged.write
    if partition_by is not None:
        writer = writer.partitionBy(partition_by)
    writer.parquet(new_dir)
    if meta is not None:
        write_meta(new_dir, meta)
    return flip_pointer_and_gc(state_dir, v, new_v)


def link_tree(src: str, dst: str, exclusive: bool = False) -> None:
    """Mirror ``src`` into ``dst`` via hard links (copy fallback for
    filesystems without link support). Links make untouched subtrees
    byte-identical across versions at zero data I/O.

    ``exclusive=True`` re-raises ``FileExistsError`` instead of letting it
    fall through to the overwrite-capable ``copy2`` fallback (ADVICE r12):
    callers merging a base version's files into a directory that already
    holds freshly written delta files (the IVF posting-partition fold) must
    fail loudly on a name collision rather than silently drop delta rows.
    """
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        s, d = os.path.join(src, name), os.path.join(dst, name)
        if os.path.isdir(s):
            link_tree(s, d, exclusive=exclusive)
        else:
            try:
                os.link(s, d)
            except FileExistsError:
                if exclusive:
                    raise
                shutil.copy2(s, d)
            except OSError:
                shutil.copy2(s, d)
