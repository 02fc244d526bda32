"""Stream-stream interval join over two replay shards: clicks joined to
purchases within 60 s by the same user, with watermarks bounding both join
states — the streaming twin of `join_range_interval`."""

from __future__ import annotations

import time

import pytest

from broadway_kinesis_spark.sources.replay import ReplayDataSource
from tests.test_streaming_windows import payload, write_stream_file


def test_stream_stream_interval_join(spark, tmp_path):
    from pyspark.sql import functions as F

    spark.dataSource.register(ReplayDataSource)
    d_click = str(tmp_path / "clicks")
    d_buy = str(tmp_path / "buys")
    write_stream_file(
        d_click,
        [
            payload(1, "click", 1.0, "2024-01-01 10:00:00"),
            payload(2, "click", 2.0, "2024-01-01 10:05:00"),
            payload(1, "click", 3.0, "2024-01-01 11:00:00"),  # no purchase follows
        ],
    )
    write_stream_file(
        d_buy,
        [
            payload(1, "purchase", 10.0, "2024-01-01 10:00:30"),  # 30s after click 1
            payload(2, "purchase", 20.0, "2024-01-01 10:07:00"),  # 120s after click 2: NO
            payload(1, "purchase", 30.0, "2024-01-01 12:00:00"),  # flushes watermarks
        ],
    )

    def parsed(path, alias):
        return (
            spark.readStream.format("kinesis_replay")
            .option("path", path)
            .option("startingPosition", "trim_horizon")
            .load()
            .select(
                F.from_json(
                    F.col("data").cast("string"),
                    "uid long, etype string, value double, ets timestamp",
                ).alias("j")
            )
            .select(
                F.col("j.uid").alias(f"{alias}_uid"),
                F.col("j.value").alias(f"{alias}_value"),
                F.col("j.ets").alias(f"{alias}_ts"),
            )
            .withWatermark(f"{alias}_ts", "10 minutes")
        )

    clicks = parsed(d_click, "c")
    buys = parsed(d_buy, "b")
    joined = clicks.join(
        buys,
        F.expr(
            "c_uid = b_uid AND b_ts > c_ts AND b_ts <= c_ts + interval 60 seconds"
        ),
    ).select("c_uid", "c_value", "b_value")

    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_sink")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            rows = spark.sql("SELECT * FROM ssj_sink").collect()
            if len(rows) >= 1:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = sorted((r.c_uid, r.c_value, r.b_value) for r in rows)
    assert got == [(1, 1.0, 10.0)], got  # only the within-60s pair joins
