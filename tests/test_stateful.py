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


def _protobuf_available() -> bool:
    # transformWithState's state-server protocol needs google.protobuf at
    # RUNTIME (pyspark declares it optional); absent here -> operator is
    # cluster-only, plumbing still validated by the plan-only test below.
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_funnel_progress_plan_builds_without_protobuf(spark):
    """The funnel operator must at least ANALYZE on any build: schema and
    grouping are checked at plan time, protobuf only matters at run time."""
    from broadway_kinesis_spark.streaming.stateful_v2 import funnel_progress

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "1")
        .load()
        .selectExpr(
            "value AS uid",
            "CASE WHEN value % 2 = 0 THEN 'signup' ELSE 'click' END AS etype",
            "timestamp AS ets",
        )
    )
    out = funnel_progress(stream)
    assert [f.name for f in out.schema.fields] == ["uid", "stage", "stage_name", "reached_at"]
    assert out.isStreaming


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState needs google.protobuf at runtime (not in this container)",
)
def test_funnel_progress_state_machine_across_batches(spark, tmp_path):
    """transformWithStateInPandas funnel: stage must persist across batches
    (signup+click in batch 1, purchase lands in batch 2 only because the
    ValueState carried stage=2), and stages cannot be skipped (a user whose
    first event is a click never progresses)."""
    from pyspark.sql import functions as F

    from broadway_kinesis_spark.streaming.stateful_v2 import funnel_progress

    spark.dataSource.register(ReplayDataSource)
    d = str(tmp_path)
    write_stream_file(
        d,
        [
            # batch 1 (pacing=3): uid1 signup+click (out of event-time order
            # on purpose — the processor sorts by ets); uid2 click only
            payload(1, "click", 1.0, "2024-01-01 10:00:10"),
            payload(1, "signup", 1.0, "2024-01-01 10:00:00"),
            payload(2, "click", 1.0, "2024-01-01 10:00:05"),
            # batch 2: uid1 purchase -> stage 3 iff state carried stage 2;
            # uid2 purchase -> still stuck (never signed up)
            payload(1, "purchase", 1.0, "2024-01-01 10:01:00"),
            payload(2, "purchase", 1.0, "2024-01-01 10:01:05"),
        ],
    )
    stream = (
        spark.readStream.format("kinesis_replay")
        .option("path", d)
        .option("startingPosition", "trim_horizon")
        .option("maxRecordsPerBatch", "3")
        .load()
        .select(
            F.from_json(
                F.col("data").cast("string"),
                "uid long, etype string, value double, ets timestamp",
            ).alias("j")
        )
        .select("j.uid", "j.etype", "j.ets")
    )
    out = funnel_progress(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_sink")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.monotonic() + 120
        want = {(1, 1, "signup"), (1, 2, "click"), (1, 3, "purchase")}
        while time.monotonic() < deadline:
            rows = {
                (r.uid, r.stage, r.stage_name)
                for r in spark.sql("SELECT * FROM funnel_sink").collect()
            }
            if want <= rows:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM funnel_sink").collect()
    got = {(r.uid, r.stage, r.stage_name) for r in rows}
    assert want <= got, f"funnel progression missing: {got}"
    assert not any(r.uid == 2 for r in rows), f"uid2 skipped signup: {got}"
