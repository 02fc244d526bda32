"""Custom stateful operator (applyInPandasWithState): running totals must
accumulate ACROSS micro-batches (state persistence) and emit updates per
batch."""

from __future__ import annotations

import time

import pytest

from broadway_kinesis_spark.sources.replay import ReplayDataSource
from broadway_kinesis_spark.streaming.stateful import running_totals
from tests.test_streaming_windows import payload, write_stream_file


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    from pyspark.sql import functions as F

    spark.dataSource.register(ReplayDataSource)
    d = str(tmp_path)
    write_stream_file(
        d,
        [
            # batch 1 (pacing=2)
            payload(1, "c", 10.0, "2024-01-01 10:00:00"),
            payload(2, "c", 5.0, "2024-01-01 10:00:10"),
            # batch 2: uid 1 again -> state must carry the earlier 10.0
            payload(1, "c", 7.0, "2024-01-01 10:01:00"),
            payload(1, "c", 3.0, "2024-01-01 10:01:30"),
        ],
    )
    stream = (
        spark.readStream.format("kinesis_replay")
        .option("path", d)
        .option("startingPosition", "trim_horizon")
        .option("maxRecordsPerBatch", "2")
        .load()
        .select(
            F.from_json(
                F.col("data").cast("string"),
                "uid long, etype string, value double, ets timestamp",
            ).alias("j")
        )
        .select("j.uid", "j.value")
    )
    out = running_totals(stream, idle_timeout_ms=3_600_000)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_sink")
        .outputMode("update")
        .start()
    )
    try:
        deadline = time.monotonic() + 120
        want = {(1, 3, 20.0), (2, 1, 5.0)}
        while time.monotonic() < deadline:
            rows = {
                (r.key, r.cnt, r.total)
                for r in spark.sql("SELECT * FROM stateful_sink").collect()
            }
            if want <= rows:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM stateful_sink ORDER BY key, cnt").collect()
    got = [(r.key, r.cnt, r.total, r.final) for r in rows]
    # uid1: first batch update (1, 10.0), second batch update (3, 20.0)
    assert (1, 1, 10.0, False) in got
    assert (1, 3, 20.0, False) in got, f"state did not persist across batches: {got}"
    assert (2, 1, 5.0, False) in got
