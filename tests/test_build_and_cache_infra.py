"""Unit fences for round-5 infrastructure: table_build and the fake-client
parse cache.

Both are cross-cutting (three layout operators ride table_build; every
source e2e rides the lazy fake client), and both have behavior that only
shows under specific sequences — an orphaned warehouse directory from a
dead session, a fixture file rewritten in place — that the operator-level
tests hit rarely or never.
"""

from __future__ import annotations

import json
import os

import pandas as pd

from broadway_kinesis_spark.functions.table_build import corpus_sig, ensure_table


def test_ensure_table_is_idempotent_and_heals_orphan_location(spark, tmp_path):
    name = "_bks_test_tbl_infra"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    builds = []

    def build():
        builds.append(1)
        return spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3]}))

    # orphan: a warehouse dir with no catalog entry (dead session leftover)
    wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    loc = os.path.join(wh, name)
    os.makedirs(loc, exist_ok=True)
    open(os.path.join(loc, "junk.parquet"), "w").close()

    try:
        assert ensure_table(spark, name, build, bucket_by=(4, "k")) == name
        assert len(builds) == 1  # built once, orphan cleared first
        assert spark.table(name).count() == 3
        ensure_table(spark, name, build, bucket_by=(4, "k"))
        assert len(builds) == 1  # catalog hit: no rebuild
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _spawn_live_pid():
    """A process that stays alive for the test's duration."""
    import subprocess

    return subprocess.Popen(["sleep", "60"])


def _dead_pid() -> int:
    import subprocess

    p = subprocess.Popen(["true"])
    p.wait()
    return p.pid


def test_build_lock_diverts_around_a_live_sibling(spark, monkeypatch):
    """Two LIVE sessions racing one ensure_table (VERDICT r7 #3): while a
    sibling holds the build lock, this session must neither wait forever
    nor touch the sibling's in-progress location — it diverts to a
    pid-scoped name, exactly like the live-owner marker path."""
    from broadway_kinesis_spark.functions import table_build

    name = "_bks_test_lock_live"
    pidname = f"{name}_p{os.getpid()}"
    wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    loc = os.path.join(wh, name)
    os.makedirs(loc, exist_ok=True)
    in_progress = os.path.join(loc, "part-00000.parquet")  # marker-less build
    open(in_progress, "w").close()
    sibling = _spawn_live_pid()
    lock = loc + table_build._LOCK_SUFFIX
    with open(lock, "w", encoding="ascii") as f:
        f.write(str(sibling.pid))
    monkeypatch.setattr(table_build, "_LOCK_WAIT_S", 1.0)
    spark.sql(f"DROP TABLE IF EXISTS {pidname}")
    try:
        got = ensure_table(
            spark,
            name,
            lambda: spark.createDataFrame(pd.DataFrame({"k": [1]})),
        )
        assert got == pidname  # diverted, not stolen
        assert os.path.exists(in_progress)  # sibling's build untouched
        assert os.path.exists(lock)  # sibling still owns its lock
        assert spark.table(got).count() == 1
    finally:
        sibling.kill()
        sibling.wait()
        os.unlink(lock)
        import shutil

        shutil.rmtree(loc, ignore_errors=True)
        spark.sql(f"DROP TABLE IF EXISTS {pidname}")


def test_build_lock_breaks_a_dead_builders_lock_and_releases_its_own(spark):
    """A lock whose holder died mid-build is stale: it must be broken, the
    half-written location cleared, the table built under the ORIGINAL
    name, and the lock released afterwards."""
    from broadway_kinesis_spark.functions import table_build

    name = "_bks_test_lock_stale"
    wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    loc = os.path.join(wh, name)
    os.makedirs(loc, exist_ok=True)
    open(os.path.join(loc, "junk.parquet"), "w").close()
    lock = loc + table_build._LOCK_SUFFIX
    with open(lock, "w", encoding="ascii") as f:
        f.write(str(_dead_pid()))
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    try:
        got = ensure_table(
            spark,
            name,
            lambda: spark.createDataFrame(pd.DataFrame({"k": [1, 2]})),
        )
        assert got == name
        assert spark.table(name).count() == 2
        assert not os.path.exists(lock)  # released after the build
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_corpus_sig_tracks_file_identity_and_version(tmp_path):
    d = str(tmp_path)
    p = os.path.join(d, "events.parquet")
    with open(p, "w") as f:
        f.write("v1")
    s1 = corpus_sig(d, ("events",))
    assert s1 == corpus_sig(d, ("events",))  # stable
    with open(p, "w") as f:
        f.write("v2-longer")  # size changes
    assert corpus_sig(d, ("events",)) != s1  # new version -> new table name
    assert corpus_sig(d, ("events", "missing")) != corpus_sig(d, ("events",))


def test_fake_client_cache_invalidates_on_rewrite(tmp_path):
    from tests.fake_kinesis_service import FileBackedKinesisClient

    d = str(tmp_path)

    def write(n):
        with open(os.path.join(d, "shard-0001.json"), "w", encoding="utf-8") as f:
            json.dump(
                [
                    {
                        "SequenceNumber": str(i),
                        "PartitionKey": "k",
                        "Data": "aGk=",  # "hi"
                        "ApproximateArrivalTimestamp": 1000.0 + i,
                    }
                    for i in range(n)
                ],
                f,
            )

    write(2)
    c1 = FileBackedKinesisClient(d)
    assert len(c1.shards["shard-0001"]) == 2
    # second client in the same process: served from the parse cache
    c2 = FileBackedKinesisClient(d)
    assert c2.shards["shard-0001"] is c1.shards["shard-0001"]
    # rewritten fixture (different size) must invalidate
    write(5)
    c3 = FileBackedKinesisClient(d)
    recs = c3.shards["shard-0001"]
    assert len(recs) == 5
    assert recs[0]["Data"] == b"hi"  # decode still applied on fresh parse
    # lazy: a shard file that appears AFTER construction is visible
    with open(os.path.join(d, "shard-0002.json"), "w", encoding="utf-8") as f:
        json.dump([], f)
    assert "shard-0002" in list(c3.shards)
