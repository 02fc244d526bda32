"""Direct protocol fences for streaming/snapshot_store.py (round 6).

The sink e2e suites exercise the protocol through upsert/histogram/
rolling-sketch behavior; these tests pin the HELPER's own contract so a
future sink can't mis-compose it: version numbering, leftover clearing,
meta stamping before the flip, GC keeping exactly the previous version,
and the bucketed + fenced commit combination no current sink uses
together.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from broadway_kinesis_spark.streaming.snapshot_store import (
    commit_snapshot_version,
    committed_batch_id,
    current_version,
    prepare_version_dir,
    read_snapshot,
    read_snapshot_raw,
    version_dir,
)


def test_commit_flat_then_partitioned_with_meta(spark, tmp_path):
    d = str(tmp_path / "store")
    os.makedirs(d)
    df = spark.range(4).withColumn("kb", (F.col("id") % 2).cast("int"))

    v = commit_snapshot_version(df, d, current_version(d))
    assert v == 0 and current_version(d) == 0
    assert committed_batch_id(d) == -1  # meta-less version: no fence mark

    v = commit_snapshot_version(
        df, d, v, partition_by="kb", meta={"last_batch_id": 7}
    )
    assert v == 1 and current_version(d) == 1
    assert committed_batch_id(d) == 7
    # hive layout present and _META rides inside the version dir
    names = os.listdir(version_dir(d, 1))
    assert any(n.startswith("kb=") for n in names) and "_META" in names
    # logical read drops the bucket column; raw read keeps it
    assert "kb" not in read_snapshot(spark, d).columns
    assert "kb" in read_snapshot_raw(spark, d).columns
    assert read_snapshot(spark, d).count() == 4


def test_gc_keeps_exactly_previous_version(spark, tmp_path):
    d = str(tmp_path / "store")
    os.makedirs(d)
    df = spark.range(3)
    v = -1
    for _ in range(4):  # v=0..3
        v = commit_snapshot_version(df, d, v)
    vers = sorted(
        int(n[2:]) for n in os.listdir(d) if n.startswith("v=")
    )
    # v (=3) and the immediately previous (2) survive; older are GC'd
    assert vers == [2, 3]


def test_prepare_version_dir_clears_crash_leftover(spark, tmp_path):
    d = str(tmp_path / "store")
    os.makedirs(d)
    leftover = version_dir(d, 0)
    os.makedirs(leftover)
    with open(os.path.join(leftover, "junk"), "w") as f:
        f.write("half-written")
    new_dir = prepare_version_dir(d, 0)
    assert new_dir == leftover and not os.path.exists(new_dir)
    # and a full commit over the same slot works
    v = commit_snapshot_version(spark.range(2), d, -1)
    assert v == 0 and read_snapshot(spark, d).count() == 2


def test_meta_is_present_before_pointer_names_version(spark, tmp_path):
    """The fence invariant: by the time _CURRENT names a version, its
    _META must already be durable. Simulated by reading _META straight
    after commit and asserting the pointer's version carries it."""
    d = str(tmp_path / "store")
    os.makedirs(d)
    v = commit_snapshot_version(
        spark.range(2), d, -1, meta={"last_batch_id": 42}
    )
    with open(os.path.join(version_dir(d, v), "_META")) as f:
        assert json.load(f)["last_batch_id"] == 42
    assert committed_batch_id(d) == 42
