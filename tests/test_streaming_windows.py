"""Live Structured-Streaming semantics over the replay source: watermarks,
late-data drops, streaming dedup, session windows — the streaming halves of
the batch twins in streaming/batch_twins.py (SURVEY.md §5 item 3)."""

from __future__ import annotations

import base64
import json
import os
import time

import pytest

from broadway_kinesis_spark.sources.replay import ReplayDataSource

GAP = "10 minutes"
_QN = 0


def payload(uid: int, etype: str, value: float, ets: str) -> dict:
    return {"uid": uid, "etype": etype, "value": value, "ets": ets}


def write_stream_file(d: str, payloads: list[dict]) -> None:
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "shard-0001.jsonl"), "w", encoding="utf-8") as f:
        for i, p in enumerate(payloads, start=1):
            ev = {
                "ContinuationSequenceNumber": str(i),
                "MillisBehindLatest": 0,
                "Records": [
                    {
                        "SequenceNumber": str(i),
                        "PartitionKey": str(p["uid"]),
                        "ApproximateArrivalTimestamp": 1.7e9 + i,
                        "Data": base64.b64encode(json.dumps(p).encode()).decode(),
                    }
                ],
            }
            f.write(json.dumps(ev) + "\n")


@pytest.fixture(scope="module")
def sparkr(spark):
    spark.dataSource.register(ReplayDataSource)
    return spark


def parsed_stream(spark, d: str, max_per_batch: int):
    """replay envelope -> schema-on-read event rows (the from_json pattern
    that mirrors the reference's decode-then-pattern-match)."""
    from pyspark.sql import functions as F

    return (
        spark.readStream.format("kinesis_replay")
        .option("path", d)
        .option("startingPosition", "trim_horizon")
        .option("maxRecordsPerBatch", str(max_per_batch))
        .load()
        .select(
            F.from_json(
                F.col("data").cast("string"),
                "uid long, etype string, value double, ets timestamp",
            ).alias("j")
        )
        .select("j.uid", "j.etype", "j.value", F.col("j.ets").alias("ets"))
    )


def run_until(spark, q, name: str, predicate, timeout_s: int = 120):
    deadline = time.monotonic() + timeout_s
    try:
        while time.monotonic() < deadline:
            rows = spark.sql(f"SELECT * FROM {name}").collect()
            if predicate(rows):
                return rows
            time.sleep(0.5)
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        assert predicate(rows), f"timed out; sink rows: {rows}"
        return rows
    finally:
        q.stop()


def test_tumbling_window_watermark_drops_late_data(sparkr, tmp_path):
    """Watermark finality: once a window has been EMITTED (watermark passed
    its end in a prior batch), a late row for it is dropped and the window is
    never re-emitted. (Spark's documented guarantee is exactly this —
    emitted-window finality; a late row landing in the same batch where the
    watermark first passes may still be merged, empirically verified on 4.1.)
    Batch pacing (2 events/batch) forces watermark advances between
    deliveries."""
    from pyspark.sql import functions as F

    global _QN
    _QN += 1
    name = f"wm_sink_{_QN}"
    d = str(tmp_path)
    write_stream_file(
        d,
        [
            # batch 0: watermark after batch = 10:20 - 10min = 10:10
            payload(1, "click", 1.0, "2024-01-01 10:00:00"),
            payload(1, "click", 2.0, "2024-01-01 10:20:00"),
            # batch 1 (wm 10:10): window [10:00,10:05) emitted with 1.0;
            # watermark advances to 10:30
            payload(1, "click", 3.0, "2024-01-01 10:40:00"),
            payload(1, "click", 3.5, "2024-01-01 10:40:00"),
            # batch 2 (wm 10:30): 10:04 targets an already-emitted window
            # -> MUST be dropped (finality), never re-emitted
            payload(1, "click", 100.0, "2024-01-01 10:04:00"),
            payload(1, "click", 4.0, "2024-01-01 11:30:00"),
            # batch 3: flush remaining windows
            payload(1, "click", 8.0, "2024-01-01 12:30:00"),
            payload(1, "click", 16.0, "2024-01-01 12:30:00"),
        ],
    )
    agg = (
        parsed_stream(sparkr, d, max_per_batch=2)
        .withWatermark("ets", GAP)
        .groupBy(F.window("ets", "5 minutes"))
        .agg(F.sum("value").alias("sum_value"))
        .select(F.col("window.start").cast("string").alias("ws"), "sum_value")
    )
    q = agg.writeStream.format("memory").queryName(name).outputMode("append").start()
    rows = run_until(sparkr, q, name, lambda rs: len(rs) >= 4)
    got = {}
    for r in rows:
        assert r.ws not in got, f"window {r.ws} emitted twice: append finality violated"
        got[r.ws] = r.sum_value
    assert got["2024-01-01 10:00:00"] == 1.0  # late 100.0 NOT included
    assert got["2024-01-01 10:20:00"] == 2.0
    assert got["2024-01-01 10:40:00"] == 6.5
    assert got["2024-01-01 11:30:00"] == 4.0


def test_streaming_dedup_within_watermark(sparkr, tmp_path):
    """dropDuplicatesWithinWatermark keeps one row per key across batches."""
    global _QN
    _QN += 1
    name = f"dd_sink_{_QN}"
    d = str(tmp_path)
    write_stream_file(
        d,
        [
            payload(1, "click", 1.0, "2024-01-01 10:00:00"),
            payload(1, "click", 1.0, "2024-01-01 10:00:30"),  # dup key, batch 1
            payload(1, "click", 1.0, "2024-01-01 10:01:00"),  # dup key, batch 2
            payload(2, "view", 5.0, "2024-01-01 10:02:00"),
        ],
    )
    dedup = (
        parsed_stream(sparkr, d, max_per_batch=2)
        .withWatermark("ets", GAP)
        .dropDuplicatesWithinWatermark(["uid", "etype"])
        .select("uid", "etype", "value")
    )
    q = dedup.writeStream.format("memory").queryName(name).outputMode("append").start()
    rows = run_until(sparkr, q, name, lambda rs: len(rs) >= 2)
    assert sorted((r.uid, r.etype) for r in rows) == [(1, "click"), (2, "view")]
    assert len(rows) == 2  # cross-batch duplicate also suppressed (state)


def test_streaming_session_window(sparkr, tmp_path):
    """session_window in a real stream: two sessions split by a > gap pause,
    finalized when the watermark passes their close."""
    from pyspark.sql import functions as F

    global _QN
    _QN += 1
    name = f"sess_sink_{_QN}"
    d = str(tmp_path)
    write_stream_file(
        d,
        [
            payload(7, "click", 1.0, "2024-01-01 10:00:00"),
            payload(7, "click", 2.0, "2024-01-01 10:05:00"),  # same session (gap 5m < 10m)
            payload(7, "click", 4.0, "2024-01-01 10:30:00"),  # new session (gap 25m >= 10m)
            payload(7, "click", 8.0, "2024-01-01 13:00:00"),  # flushes both via watermark
        ],
    )
    agg = (
        parsed_stream(sparkr, d, max_per_batch=2)
        .withWatermark("ets", GAP)
        .groupBy(F.session_window("ets", GAP), "uid")
        .agg(F.sum("value").alias("sum_value"), F.count(F.lit(1)).alias("n"))
        .select(
            F.col("session_window.start").cast("string").alias("ss"),
            F.col("session_window.end").cast("string").alias("se"),
            "uid",
            "sum_value",
            "n",
        )
    )
    q = agg.writeStream.format("memory").queryName(name).outputMode("append").start()
    rows = run_until(sparkr, q, name, lambda rs: len(rs) >= 2)
    got = {(r.ss, r.se): (r.sum_value, r.n) for r in rows}
    assert got[("2024-01-01 10:00:00", "2024-01-01 10:15:00")] == (3.0, 2)
    assert got[("2024-01-01 10:30:00", "2024-01-01 10:40:00")] == (4.0, 1)
