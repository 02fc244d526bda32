"""Stream/batch parity on the REAL fixture data: the events table replayed
through the kinesis_replay source and aggregated with streaming windows
must produce exactly the batch twin's result — Structured Streaming's
core promise (incremental evaluation of the same logical plan), verified
end-to-end through the engine's own source."""

from __future__ import annotations

import sys

import pytest

from broadway_kinesis_spark.sources.replay import ReplayDataSource

sys.path.insert(0, "/root/repo/tools")
from make_replay_fixture import write_replay_fixture  # noqa: E402


def test_tumbling_window_stream_equals_batch(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    spark.dataSource.register(ReplayDataSource)
    d = str(tmp_path / "replay")
    counts = write_replay_fixture(sf_dir, d, n_shards=4)
    assert sum(counts.values()) == 1000  # sf0.001 events

    stream = (
        spark.readStream.format("kinesis_replay")
        .option("path", d)
        .option("startingPosition", "trim_horizon")
        .load()
        .select(
            F.from_json(
                F.col("data").cast("string"),
                "event_id long, ts_us long, user_id long, event_type string, "
                "value double, props string",
            ).alias("j")
        )
        .select("j.event_id", "j.ts_us", "j.event_type", "j.value")
        .withColumn("ets", F.timestamp_micros("ts_us"))
        .withWatermark("ets", "10 minutes")
        .groupBy(F.window("ets", "5 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(38,8)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_micros("window.start").alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("parity_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    streamed = {
        (r.window_start_us, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM parity_sink").collect()
    }

    from broadway_kinesis_spark.session import load

    batch_rows = (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(38,8)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_micros("window.start").alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .collect()
    )
    batch = {(r.window_start_us, r.event_type): (r.n_events, r.sum_value) for r in batch_rows}
    assert streamed == batch
