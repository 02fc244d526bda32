"""Streaming incremental corpus dedup — `dedup_incremental` as a sink.

Ties the §2.A source surface to the §2.B dedup surface (VERDICT r2 #6): a
document stream (e.g. the replay / kinesis_efo source) is deduplicated
batch-by-batch against a PERSISTENT content-digest index, so a document seen
in any earlier micro-batch — or any earlier run of the query — is dropped.
Per micro-batch, inside ``foreachBatch``:

1. digest:        incoming docs -> (doc_id, md5(text))           [map-side]
2. keep-first:    one row per digest within the batch (window)   [1 shuffle]
3. anti-join:     drop digests already in the index              [hash join]
4. append:        survivors -> accepted parquet; their digests -> index

``foreachBatch`` bodies run serially per query, so the read-index /
append-index cycle never races itself. Crash safety: the two appends
(accepted, then index) are not one transaction, so a crash between them
would leave accepted ahead of the index and a replayed batch would accept
the same content twice. The sink closes that window with an in-flight
marker + self-heal protocol:

1. if a marker from an interrupted batch exists, HEAL first — append any
   digest present in accepted but missing from the index, then clear the
   marker (idempotent; normally a no-op that costs one ``os.listdir``);
2. anti-join the batch against the (now complete) index;
3. marker up -> append accepted -> append index -> marker down.

A crash at ANY point now yields effectively-once accepted output on
replay: before the accepted append the batch replays cleanly; between the
appends (or mid-append — parquet task files commit per-file) the heal step
re-derives the missing digests from accepted itself before the anti-join
runs. This is the hermetic stand-in for what a transactional table gives
you natively; the offset commit still lands after the sink returns, same
A14 at-least-once posture as the source.

Scale posture: the index holds 16-byte digests, not documents — the same
"shuffle hashes, never bodies" rule as dedup.py. The steady-state
anti-join reads only the compact index (broadcast while small,
shuffle-hash after AQE flips it); the heal scan of accepted's pruned
digest column runs ONLY after an unclean stop. At production scale the
index lives in a transactional table (Delta/Iceberg) for atomic append +
compaction, which replaces the marker protocol outright; plain
parquet-dir append keeps this hermetic here and preserves the identical
plan shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _heal_index(spark, index_path: str, accepted_path: str) -> None:
    """Append to the index any digest that reached accepted but not the
    index (the crash window between the two appends). Idempotent."""
    if not os.path.exists(accepted_path):
        return
    acc = spark.read.parquet(accepted_path).select("text_md5")
    if os.path.exists(index_path):
        idx = spark.read.parquet(index_path).select("text_md5")
        missing = acc.join(idx, "text_md5", "left_anti").distinct()
    else:
        missing = acc.distinct()
    missing = missing.persist()
    try:
        if missing.count():
            missing.write.mode("append").parquet(index_path)
    finally:
        missing.unpersist()


def dedup_batch_against_index(
    batch_df: DataFrame, index_path: str, accepted_path: str
) -> int:
    """One micro-batch of incremental dedup; returns #accepted docs.

    ``batch_df`` needs columns ``doc_id`` (orderable id; keep-first winner)
    and ``text``. Survivors are appended to ``accepted_path``; their digests
    to ``index_path`` under the marker/heal protocol (module docstring).
    """
    spark = batch_df.sparkSession
    marker_dir = accepted_path + "_inflight"
    os.makedirs(marker_dir, exist_ok=True)
    if os.listdir(marker_dir):  # unclean stop mid-append: re-sync first
        _heal_index(spark, index_path, accepted_path)
        for m in os.listdir(marker_dir):
            os.remove(os.path.join(marker_dir, m))

    incoming = batch_df.select("doc_id", F.md5("text").alias("text_md5"))
    w = Window.partitionBy("text_md5").orderBy("doc_id")
    first = (
        incoming.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    if os.path.exists(index_path):
        index = spark.read.parquet(index_path).select("text_md5")
        fresh = first.join(index, "text_md5", "left_anti")
    else:
        fresh = first
    # Materialize BEFORE appending to the index: the `fresh` plan reads
    # index_path, and executing it lazily during the index append would
    # re-list the directory mid-write.
    fresh = fresh.persist()
    try:
        n = fresh.count()
        if n:
            marker = os.path.join(marker_dir, "batch")
            with open(marker, "w", encoding="utf-8"):
                pass
            fresh.write.mode("append").parquet(accepted_path)
            fresh.select("text_md5").write.mode("append").parquet(index_path)
            os.remove(marker)
        return n
    finally:
        fresh.unpersist()


def incremental_dedup_sink(index_path: str, accepted_path: str):
    """``foreachBatch`` callable running :func:`dedup_batch_against_index`."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        dedup_batch_against_index(batch_df, index_path, accepted_path)

    return sink
