"""Maintenance for the streaming sinks' parquet-backed state stores.

The incremental-dedup sinks (streaming/incremental.py) append one parquet
file per non-empty micro-batch to their digest/band/signature indexes and
accepted stores. Appends are the right write shape for the hot path, but
over thousands of batches the directory degenerates into thousands of tiny
files — and at 100 TB the file LISTING, not the data, becomes the scan
cost. This module is the compaction side of that trade: rewrite a store
into few right-sized files, atomically, with crash healing.

Protocol (same family as streaming/upsert.py's pointer flip, adapted to
an in-place directory swap):

1. write the compacted copy to ``<path>.compact_tmp`` (Spark's own job
   commit gives the directory a ``_SUCCESS`` marker only when complete);
2. rename ``<path>`` -> ``<path>.compact_old``;
3. rename ``<path>.compact_tmp`` -> ``<path>``;
4. delete ``<path>.compact_old``.

A crash at any point is recoverable from the directory states alone, and
:func:`heal_interrupted_compaction` performs that recovery:

- tmp incomplete (no ``_SUCCESS``), store present  -> drop tmp;
- store missing, tmp complete                      -> promote tmp;
- store missing, tmp incomplete/absent, old present -> restore old.

The streaming sinks call the heal at every batch start (three ``stat``
calls in the common case), so an interrupted compaction self-heals even
if the next process to touch the store is the stream, not the compactor.
Compaction itself must run BETWEEN batches — either offline, or through
the sinks' built-in fragmentation trigger, which runs it at batch start
inside ``foreachBatch`` (bodies execute serially, so no reader races the
swap).
"""

from __future__ import annotations

import os
import shutil

_TMP = ".compact_tmp"
_OLD = ".compact_old"

#: sink-side trigger: compact a store once it fragments past this many files
DEFAULT_MAX_FILES = 64


def _complete(d: str) -> bool:
    return os.path.isfile(os.path.join(d, "_SUCCESS"))


def heal_interrupted_compaction(path: str) -> str | None:
    """Restore ``path`` to a consistent state after a compaction crash.
    Returns the action taken (for tests/observability) or None if clean."""
    tmp, old = path + _TMP, path + _OLD
    if os.path.exists(path):
        # store intact: any leftover tmp/old is garbage from a crash
        actions = []
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
            actions.append("dropped_tmp")
        if os.path.exists(old):
            shutil.rmtree(old)
            actions.append("dropped_old")
        return "+".join(actions) or None
    if os.path.exists(tmp) and _complete(tmp):
        os.rename(tmp, path)  # crash between the two renames, tmp complete
        if os.path.exists(old):
            shutil.rmtree(old)
        return "promoted_tmp"
    if os.path.exists(old):
        if os.path.exists(tmp):  # incomplete tmp is worthless
            shutil.rmtree(tmp)
        os.rename(old, path)  # roll back to the pre-compaction store
        return "restored_old"
    return None  # store never existed — nothing to heal


def parquet_file_count(path: str) -> int:
    if not os.path.isdir(path):
        return 0
    return sum(1 for n in os.listdir(path) if n.endswith(".parquet"))


def compact_parquet_dir(
    spark,
    path: str,
    dedup_cols: list[str] | None = None,
    target_files: int = 4,
) -> int:
    """Rewrite ``path`` into ``target_files`` files (optionally dropping
    duplicate rows on ``dedup_cols`` — digest indexes only ever need one
    row per digest). Atomic per the module protocol; returns the parquet
    file count of the compacted store. (Deliberately NOT the row count:
    that would re-scan the entire just-written store per compaction for a
    diagnostic — the same state-sized-I/O-for-a-return-value trap
    upsert.py documents.) Caller contract: no concurrent reader/writer of
    ``path`` (run between batches)."""
    heal_interrupted_compaction(path)
    if not os.path.exists(path):
        return 0
    tmp, old = path + _TMP, path + _OLD
    df = spark.read.parquet(path)
    if dedup_cols:
        df = df.dropDuplicates(dedup_cols)
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return parquet_file_count(path)


def compact_if_fragmented(
    spark,
    path: str,
    dedup_cols: list[str] | None = None,
    max_files: int | None = None,
) -> bool:
    """Sink-side trigger: heal, then compact when the store has fragmented
    past ``max_files`` parquet files (default: the module's
    ``DEFAULT_MAX_FILES``, resolved at CALL time so tests/operators can
    tune the fleet-wide trigger in one place). Returns True if a
    compaction ran."""
    if max_files is None:
        max_files = DEFAULT_MAX_FILES
    heal_interrupted_compaction(path)
    if parquet_file_count(path) <= max_files:
        return False
    compact_parquet_dir(spark, path, dedup_cols=dedup_cols)
    return True
