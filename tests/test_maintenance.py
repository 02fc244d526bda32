"""Compaction + crash-healing for the streaming sinks' parquet stores
(streaming/maintenance.py): atomic swap semantics, every crash state of
the protocol, the sink-side fragmentation trigger, and behavior
preservation of the dedup sink across a compaction."""

from __future__ import annotations

import os

import pandas as pd

from broadway_kinesis_spark.streaming.incremental import (
    dedup_batch_against_index,
)
from broadway_kinesis_spark.streaming.maintenance import (
    compact_if_fragmented,
    compact_parquet_dir,
    heal_interrupted_compaction,
    parquet_file_count,
)


def _write_appends(spark, path: str, n_appends: int, rows_per: int = 2) -> None:
    for i in range(n_appends):
        pdf = pd.DataFrame(
            {"k": [i * rows_per + j for j in range(rows_per)], "v": ["x"] * rows_per}
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)


def test_compaction_preserves_rows_and_shrinks_files(spark, tmp_path):
    path = str(tmp_path / "store")
    _write_appends(spark, path, n_appends=10)
    before = {r.k for r in spark.read.parquet(path).collect()}
    assert parquet_file_count(path) == 10
    n_files = compact_parquet_dir(spark, path, target_files=2)
    assert n_files <= 2
    assert parquet_file_count(path) == n_files
    assert {r.k for r in spark.read.parquet(path).collect()} == before
    assert spark.read.parquet(path).count() == 20


def test_compaction_dedup_cols_collapses_duplicates(spark, tmp_path):
    path = str(tmp_path / "idx")
    df = spark.createDataFrame(pd.DataFrame({"text_md5": ["a", "b"]}))
    df.write.mode("append").parquet(path)
    df.write.mode("append").parquet(path)  # duplicate append
    assert spark.read.parquet(path).count() == 4
    compact_parquet_dir(spark, path, dedup_cols=["text_md5"])
    assert spark.read.parquet(path).count() == 2


def test_heal_every_crash_state(spark, tmp_path):
    path = str(tmp_path / "store")
    _write_appends(spark, path, 2)
    rows = {r.k for r in spark.read.parquet(path).collect()}

    # state: store intact, incomplete tmp left behind -> dropped
    os.makedirs(path + ".compact_tmp")
    open(os.path.join(path + ".compact_tmp", "part-0.parquet"), "w").close()
    assert heal_interrupted_compaction(path) == "dropped_tmp"
    assert not os.path.exists(path + ".compact_tmp")

    # state: crash between renames with COMPLETE tmp -> promoted
    spark.read.parquet(path).coalesce(1).write.parquet(path + ".compact_tmp")
    os.rename(path, path + ".compact_old")
    assert heal_interrupted_compaction(path) == "promoted_tmp"
    assert {r.k for r in spark.read.parquet(path).collect()} == rows
    assert not os.path.exists(path + ".compact_old")

    # state: crash after rename-away with INCOMPLETE tmp -> old restored
    os.rename(path, path + ".compact_old")
    os.makedirs(path + ".compact_tmp")
    assert heal_interrupted_compaction(path) == "restored_old"
    assert {r.k for r in spark.read.parquet(path).collect()} == rows

    # clean state -> no-op
    assert heal_interrupted_compaction(path) is None


def test_fragmentation_trigger_fires_only_past_threshold(spark, tmp_path):
    path = str(tmp_path / "store")
    _write_appends(spark, path, 5)
    assert not compact_if_fragmented(spark, path, max_files=5)
    assert parquet_file_count(path) == 5
    assert compact_if_fragmented(spark, path, max_files=4)
    assert parquet_file_count(path) <= 4


def test_dedup_sink_behavior_survives_compaction(spark, tmp_path):
    """Compaction between batches must not change what the sink rejects:
    a duplicate of pre-compaction content is still refused afterward."""
    index = str(tmp_path / "index")
    accepted = str(tmp_path / "accepted")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    for i in range(6):  # 6 batches -> 6 index fragments
        dedup_batch_against_index(mk([(i, f"doc-{i}")]), index, accepted)
    assert parquet_file_count(index) >= 6  # at least one fragment per batch
    compact_parquet_dir(spark, index, dedup_cols=["text_md5"])
    assert parquet_file_count(index) <= 4
    # duplicate of batch-0 content + one new doc
    n = dedup_batch_against_index(mk([(100, "doc-0"), (101, "new")]), index, accepted)
    assert n == 1
    ids = {r.doc_id for r in spark.read.parquet(accepted).collect()}
    assert 101 in ids and 100 not in ids
