"""End-to-end: streaming CDC upsert as a foreachBatch sink over the replay
source — a keyed change stream folds into a persistent latest-wins snapshot
WITHIN a run, ACROSS query restarts, and under out-of-order arrival; the
versioned-snapshot/atomic-pointer commit protocol survives a simulated
crash between the snapshot write and the pointer flip."""

from __future__ import annotations

import base64
import json
import os

from pyspark.sql import functions as F

from broadway_kinesis_spark.sources.replay import ReplayDataSource
from broadway_kinesis_spark.streaming.upsert import (
    cdc_upsert_sink,
    current_version,
    read_snapshot,
    upsert_batch_into_snapshot,
)

CHANGE_SCHEMA = "user_id long, event_type string, ts long, seq long, value double"


def _write_changes(d: str, changes: list[tuple], append: bool = False) -> None:
    """changes: (user_id, event_type, ts, seq, value) tuples."""
    os.makedirs(d, exist_ok=True)
    mode = "a" if append else "w"
    start = 1
    if append:
        with open(os.path.join(d, "shard-0001.jsonl"), encoding="utf-8") as f:
            start = sum(1 for _ in f) + 1
    with open(os.path.join(d, "shard-0001.jsonl"), mode, encoding="utf-8") as f:
        for i, (uid, et, ts, seq, value) in enumerate(changes, start=start):
            payload = {
                "user_id": uid, "event_type": et, "ts": ts, "seq": seq,
                "value": value,
            }
            ev = {
                "ContinuationSequenceNumber": str(i),
                "MillisBehindLatest": 0,
                "Records": [
                    {
                        "SequenceNumber": str(i),
                        "PartitionKey": str(uid),
                        "ApproximateArrivalTimestamp": 1.7e9 + i,
                        "Data": base64.b64encode(
                            json.dumps(payload).encode()
                        ).decode(),
                    }
                ],
            }
            f.write(json.dumps(ev) + "\n")


def _run_available_now(spark, src_dir: str, ck: str, snap: str) -> None:
    q = (
        spark.readStream.format("kinesis_replay")
        .option("path", src_dir)
        .option("startingPosition", "trim_horizon")
        .load()
        .select(F.from_json(F.col("data").cast("string"), CHANGE_SCHEMA).alias("j"))
        .select("j.*")
        .writeStream.foreachBatch(cdc_upsert_sink(snap))
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)


def _state(spark, snap: str) -> dict[tuple, tuple]:
    df = read_snapshot(spark, snap)
    assert df is not None
    return {
        (r.user_id, r.event_type): (r.ts, r.seq, r.value) for r in df.collect()
    }


def test_upsert_latest_wins_across_restarts_and_late_data(spark, tmp_path):
    spark.dataSource.register(ReplayDataSource)
    src = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    snap = str(tmp_path / "snap")

    # run 1: two keys; key (1, click) updated twice within the run
    _write_changes(
        src,
        [
            (1, "click", 100, 1, 1.0),
            (2, "view", 100, 2, 5.0),
            (1, "click", 200, 3, 2.0),
        ],
    )
    _run_available_now(spark, src, ck, snap)
    assert _state(spark, snap) == {
        (1, "click"): (200, 3, 2.0),
        (2, "view"): (100, 2, 5.0),
    }

    # run 2 (restart from checkpoint): an update, an insert, and a LATE
    # arrival for (1, click) with ts=150 < 200 — must NOT regress the value.
    _write_changes(
        src,
        [
            (2, "view", 300, 4, 6.0),
            (3, "buy", 300, 5, 9.0),
            (1, "click", 150, 6, 99.0),
        ],
        append=True,
    )
    _run_available_now(spark, src, ck, snap)
    assert _state(spark, snap) == {
        (1, "click"): (200, 3, 2.0),  # late data lost to the newer row
        (2, "view"): (300, 4, 6.0),
        (3, "buy"): (300, 5, 9.0),
    }


def test_ts_ties_break_on_seq_and_gc_keeps_two_versions(spark, tmp_path):
    import pandas as pd

    snap = str(tmp_path / "snap")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        pd.DataFrame(rows, columns=["user_id", "event_type", "ts", "seq", "value"])
    )
    upsert_batch_into_snapshot(mk([(1, "a", 100, 1, 1.0)]), snap)
    upsert_batch_into_snapshot(mk([(1, "a", 100, 2, 2.0)]), snap)  # tie on ts
    upsert_batch_into_snapshot(mk([(1, "a", 100, 0, 0.5)]), snap)  # stale seq
    assert _state(spark, snap) == {(1, "a"): (100, 2, 2.0)}
    # pointer at v=2; GC keeps only the current + immediately previous
    assert current_version(snap) == 2
    versions = sorted(n for n in os.listdir(snap) if n.startswith("v="))
    assert versions == ["v=1", "v=2"]


def test_crash_before_pointer_flip_replays_cleanly(spark, tmp_path):
    """Crash window: the new version directory was (partially) written but
    _CURRENT never flipped. The pointer still names the old complete
    version, and the replayed batch rebuilds the new version from it."""
    import pandas as pd

    snap = str(tmp_path / "snap")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        pd.DataFrame(rows, columns=["user_id", "event_type", "ts", "seq", "value"])
    )
    upsert_batch_into_snapshot(mk([(1, "a", 100, 1, 1.0)]), snap)
    # simulate the crash: stale half-written v=1 left behind, pointer at v=0
    os.makedirs(os.path.join(snap, "v=1"))
    open(os.path.join(snap, "v=1", "part-junk.parquet"), "w").close()
    assert current_version(snap) == 0

    upsert_batch_into_snapshot(mk([(2, "b", 100, 2, 2.0)]), snap)  # the replay
    assert current_version(snap) == 1
    assert _state(spark, snap) == {
        (1, "a"): (100, 1, 1.0),
        (2, "b"): (100, 2, 2.0),
    }


def test_replay_after_flip_is_idempotent(spark, tmp_path):
    """At-least-once replay AFTER a successful commit: folding the same
    batch twice must produce the identical snapshot rows (latest-wins is
    idempotent), just under a newer version number."""
    import pandas as pd

    snap = str(tmp_path / "snap")
    batch = spark.createDataFrame(
        pd.DataFrame(
            [(1, "a", 100, 1, 1.0), (2, "b", 200, 2, 5.0)],
            columns=["user_id", "event_type", "ts", "seq", "value"],
        )
    )
    upsert_batch_into_snapshot(batch, snap)
    before = _state(spark, snap)
    upsert_batch_into_snapshot(batch, snap)  # the replayed duplicate
    assert _state(spark, snap) == before
    assert current_version(snap) == 1


def test_corrupted_pointer_fails_loudly_instead_of_resetting_state(spark, tmp_path):
    import pandas as pd
    import pytest

    snap = str(tmp_path / "snap")
    batch = spark.createDataFrame(
        pd.DataFrame(
            [(1, "a", 100, 1, 1.0)],
            columns=["user_id", "event_type", "ts", "seq", "value"],
        )
    )
    upsert_batch_into_snapshot(batch, snap)
    with open(os.path.join(snap, "_CURRENT"), "w", encoding="utf-8") as f:
        f.write("garbage")  # e.g. a truncated/non-atomic external restore
    with pytest.raises(RuntimeError, match="corrupted snapshot pointer"):
        upsert_batch_into_snapshot(batch, snap)


def test_empty_batch_does_not_rewrite_the_snapshot(spark, tmp_path):
    import pandas as pd

    snap = str(tmp_path / "snap")
    batch = spark.createDataFrame(
        pd.DataFrame(
            [(1, "a", 100, 1, 1.0)],
            columns=["user_id", "event_type", "ts", "seq", "value"],
        )
    )
    upsert_batch_into_snapshot(batch, snap)
    assert current_version(snap) == 0
    empty = batch.filter("user_id < 0")
    assert upsert_batch_into_snapshot(empty, snap) == 0  # returns CURRENT
    assert current_version(snap) == 0  # no version bump, no rewrite
    assert _state(spark, snap) == {(1, "a"): (100, 1, 1.0)}


def test_upsert_paced_multi_batch_folds_incrementally(spark, tmp_path):
    """Paced run (2 records/batch -> 3 micro-batches in ONE query): the
    snapshot must fold batch by batch — multiple committed versions, and
    the final state reflects every change with latest-wins order."""
    import time

    spark.dataSource.register(ReplayDataSource)
    src = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    snap = str(tmp_path / "snap")
    _write_changes(
        src,
        [
            (1, "click", 100, 1, 1.0),
            (2, "view", 100, 2, 5.0),
            (1, "click", 300, 3, 3.0),
            (3, "buy", 100, 4, 9.0),
            (1, "click", 200, 5, 99.0),  # late: loses to ts=300
            (2, "view", 400, 6, 7.0),
        ],
    )
    q = (
        spark.readStream.format("kinesis_replay")
        .option("path", src)
        .option("startingPosition", "trim_horizon")
        .option("maxRecordsPerBatch", "2")
        .load()
        .select(F.from_json(F.col("data").cast("string"), CHANGE_SCHEMA).alias("j"))
        .select("j.*")
        .writeStream.foreachBatch(cdc_upsert_sink(snap))
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        want = {
            (1, "click"): (300, 3, 3.0),
            (2, "view"): (400, 6, 7.0),
            (3, "buy"): (100, 4, 9.0),
        }
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if _state(spark, snap) == want:
                    break
            except AssertionError:
                pass  # snapshot not written yet
            time.sleep(0.5)
        assert _state(spark, snap) == want
        assert current_version(snap) >= 2  # folded over >= 3 non-empty batches
    finally:
        q.stop()


def test_untouched_buckets_are_hard_linked_byte_identical(spark, tmp_path):
    """The incremental contract (VERDICT r4 #5): a batch touching only
    bucket kb=1 must carry every OTHER bucket of the previous version into
    the new one as hard links — same bytes, same inodes, zero data I/O —
    while the touched bucket is rewritten (new inode, merged content)."""
    import pandas as pd

    from broadway_kinesis_spark.streaming.upsert import N_KB

    snap = str(tmp_path / "snap")
    # seed: one key in every bucket (user_id i -> kb = i % N_KB = i)
    seed = spark.createDataFrame(
        pd.DataFrame(
            [(i, "a", 100, i, float(i)) for i in range(N_KB)],
            columns=["user_id", "event_type", "ts", "seq", "value"],
        )
    )
    upsert_batch_into_snapshot(seed, snap)
    v0 = os.path.join(snap, "v=0")
    inodes_before = {}
    for kb in range(N_KB):
        d = os.path.join(v0, f"kb={kb}")
        inodes_before[kb] = {
            n: os.stat(os.path.join(d, n)).st_ino
            for n in os.listdir(d)
            if n.endswith(".parquet")
        }

    # batch 2 touches ONLY user_id=1 -> kb=1
    batch = spark.createDataFrame(
        pd.DataFrame(
            [(1, "a", 200, 99, 42.0)],
            columns=["user_id", "event_type", "ts", "seq", "value"],
        )
    )
    upsert_batch_into_snapshot(batch, snap)
    v1 = os.path.join(snap, "v=1")
    for kb in range(N_KB):
        d = os.path.join(v1, f"kb={kb}")
        inodes_after = {
            n: os.stat(os.path.join(d, n)).st_ino
            for n in os.listdir(d)
            if n.endswith(".parquet")
        }
        if kb == 1:
            assert set(inodes_after.values()).isdisjoint(
                set(inodes_before[kb].values())
            ), "touched bucket must be rewritten, not linked"
        else:
            assert inodes_after == inodes_before[kb], (
                f"untouched bucket kb={kb} must be hard-linked file-for-file"
            )
    assert _state(spark, snap)[(1, "a")] == (200, 99, 42.0)
    assert _state(spark, snap)[(2, "a")] == (100, 2, 2.0)


def test_gc_of_old_version_keeps_linked_buckets_readable(spark, tmp_path):
    """Three single-bucket batches: GC removes v=0 (only v1/v2 stay), and
    every row — including ones living solely in buckets last REWRITTEN two
    versions ago and linked forward since — must still read back."""
    import pandas as pd

    snap = str(tmp_path / "snap")

    def push(uid, ts, val):
        b = spark.createDataFrame(
            pd.DataFrame(
                [(uid, "a", ts, ts, val)],
                columns=["user_id", "event_type", "ts", "seq", "value"],
            )
        )
        upsert_batch_into_snapshot(b, snap)

    push(0, 100, 1.0)
    push(1, 200, 2.0)
    push(2, 300, 3.0)
    assert current_version(snap) == 2
    assert not os.path.exists(os.path.join(snap, "v=0"))  # GC'd
    assert _state(spark, snap) == {
        (0, "a"): (100, 100, 1.0),
        (1, "a"): (200, 200, 2.0),
        (2, "a"): (300, 300, 3.0),
    }


def test_flat_pre_bucketing_snapshot_migrates_on_next_batch(spark, tmp_path):
    """A snapshot written by the pre-bucketing sink (flat version dir, no
    kb= partitions) must migrate losslessly: the next batch folds in AND
    rewrites the whole thing bucketed; subsequent batches are incremental."""
    import pandas as pd

    from broadway_kinesis_spark.streaming.upsert import (
        commit_snapshot_version,
    )

    snap = str(tmp_path / "snap")
    os.makedirs(snap)
    flat = spark.createDataFrame(
        pd.DataFrame(
            [(1, "a", 100, 1, 1.0), (2, "b", 100, 2, 2.0)],
            columns=["user_id", "event_type", "ts", "seq", "value"],
        )
    )
    commit_snapshot_version(flat, snap, -1)  # old-layout v=0
    assert not any(
        n.startswith("kb=") for n in os.listdir(os.path.join(snap, "v=0"))
    )
    batch = spark.createDataFrame(
        pd.DataFrame(
            [(3, "c", 200, 3, 3.0)],
            columns=["user_id", "event_type", "ts", "seq", "value"],
        )
    )
    upsert_batch_into_snapshot(batch, snap)
    v1 = os.path.join(snap, "v=1")
    assert any(n.startswith("kb=") for n in os.listdir(v1))  # now bucketed
    assert _state(spark, snap) == {
        (1, "a"): (100, 1, 1.0),
        (2, "b"): (100, 2, 2.0),
        (3, "c"): (200, 3, 3.0),
    }
