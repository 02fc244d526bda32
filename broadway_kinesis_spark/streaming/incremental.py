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
append-index cycle never races itself; the index append lands before the
batch's offset commit, so a crash between them replays the batch and the
anti-join drops the already-indexed rows — at-least-once delivery degrades
to effectively-once output (same A14 posture as the source itself).

Scale posture: the index holds 16-byte digests, not documents — the same
"shuffle hashes, never bodies" rule as dedup.py. The anti-join is a hash
join on the digest (broadcast while the index is small, shuffle-hash after
AQE flips it). At production scale the index lives in a transactional table
(Delta/Iceberg) for atomic append + compaction; plain parquet-dir append
keeps this hermetic here and preserves the identical plan shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_batch_against_index(
    batch_df: DataFrame, index_path: str, accepted_path: str
) -> int:
    """One micro-batch of incremental dedup; returns #accepted docs.

    ``batch_df`` needs columns ``doc_id`` (orderable id; keep-first winner)
    and ``text``. Survivors are appended to ``accepted_path``; their digests
    to ``index_path``.
    """
    spark = batch_df.sparkSession
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
            fresh.write.mode("append").parquet(accepted_path)
            fresh.select("text_md5").write.mode("append").parquet(index_path)
        return n
    finally:
        fresh.unpersist()


def incremental_dedup_sink(index_path: str, accepted_path: str):
    """``foreachBatch`` callable running :func:`dedup_batch_against_index`."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        dedup_batch_against_index(batch_df, index_path, accepted_path)

    return sink
