"""Windowed-aggregation state must survive query restarts: a window fed in
run 1 and run 2 emits ONCE with the combined sum — Spark's checkpoint
(offsets + state store) is the engine's durable cursor (A6/A15 generalized
to stateful operators)."""

from __future__ import annotations

import json
import os

import pytest

from broadway_kinesis_spark.sources.replay import ReplayDataSource
from tests.test_streaming_windows import payload, write_stream_file

RESULTS: list[tuple] = []


def test_window_state_survives_restart(spark, tmp_path):
    from pyspark.sql import functions as F

    spark.dataSource.register(ReplayDataSource)
    d = str(tmp_path / "in")
    ck = str(tmp_path / "ck")

    def run_once():
        stream = (
            spark.readStream.format("kinesis_replay")
            .option("path", d)
            .option("startingPosition", "trim_horizon")
            .load()
            .select(
                F.from_json(
                    F.col("data").cast("string"),
                    "uid long, etype string, value double, ets timestamp",
                ).alias("j")
            )
            .select("j.uid", "j.value", F.col("j.ets").alias("ets"))
            .withWatermark("ets", "10 minutes")
            .groupBy(F.window("ets", "5 minutes"))
            .agg(F.sum("value").alias("sum_value"))
            .select(F.col("window.start").cast("string").alias("ws"), "sum_value")
        )

        def sink(batch_df, batch_id):
            RESULTS.extend((r.ws, r.sum_value) for r in batch_df.collect())

        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    RESULTS.clear()
    # run 1: one open window (state persisted, nothing finalized)
    write_stream_file(
        d,
        [
            payload(1, "c", 1.0, "2024-01-01 10:00:00"),
            payload(1, "c", 2.0, "2024-01-01 10:02:00"),
        ],
    )
    run_once()
    assert RESULTS == [], f"window emitted before watermark passed: {RESULTS}"

    # run 2 (restart): more rows INTO THE SAME WINDOW + watermark pushers
    with open(os.path.join(d, "shard-0001.jsonl"), "a", encoding="utf-8") as f:
        for i, p in enumerate(
            [
                payload(1, "c", 4.0, "2024-01-01 10:03:00"),
                payload(1, "c", 8.0, "2024-01-01 11:00:00"),
            ],
            start=3,
        ):
            f.write(
                json.dumps(
                    {
                        "ContinuationSequenceNumber": str(i),
                        "MillisBehindLatest": 0,
                        "Records": [
                            {
                                "SequenceNumber": str(i),
                                "PartitionKey": "1",
                                "ApproximateArrivalTimestamp": 1.7e9 + i,
                                "Data": __import__("base64").b64encode(
                                    json.dumps(p).encode()
                                ).decode(),
                            }
                        ],
                    }
                )
                + "\n"
            )
    run_once()

    # run 3 (restart again): flush event finalizes everything pending
    with open(os.path.join(d, "shard-0001.jsonl"), "a", encoding="utf-8") as f:
        p = payload(1, "c", 16.0, "2024-01-01 12:00:00")
        f.write(
            json.dumps(
                {
                    "ContinuationSequenceNumber": "5",
                    "MillisBehindLatest": 0,
                    "Records": [
                        {
                            "SequenceNumber": "5",
                            "PartitionKey": "1",
                            "ApproximateArrivalTimestamp": 1.7e9 + 5,
                            "Data": __import__("base64").b64encode(
                                json.dumps(p).encode()
                            ).decode(),
                        }
                    ],
                }
            )
            + "\n"
        )
    run_once()

    got: dict[str, float] = {}
    for ws, sv in RESULTS:
        assert ws not in got, f"window {ws} emitted twice across restarts: {RESULTS}"
        got[ws] = sv
    # 1.0 + 2.0 from run 1's state + 4.0 from run 2 — state carried across
    # restarts and the window still emitted exactly once. (The 11:00 window
    # stays pending: emission uses the start-of-batch watermark, so it needs
    # one more batch — not the property under test.)
    assert got["2024-01-01 10:00:00"] == 7.0, got
