"""Streaming histogram state: exactly-once counts via the batch-id fence.

Counts are the one state shape with NO semantic replay idempotency, so
these tests drive the fence through every replay/crash path: a replayed
batch id must fold zero additional counts, a crash before the pointer
flip must replay onto the old watermark exactly once, and a real
Structured Streaming run with a mid-stream restart must end bit-equal to
an exact recount of the input.
"""

from __future__ import annotations

import base64
import json
import os

import pandas as pd
from pyspark.sql import functions as F

from broadway_kinesis_spark.operators.quantiles import W
from broadway_kinesis_spark.sources.replay import ReplayDataSource
from broadway_kinesis_spark.streaming.histogram_state import (
    committed_batch_id,
    fold_batch_into_histogram,
    histogram_state_sink,
    serve_quantiles,
)
from broadway_kinesis_spark.streaming.upsert import current_version, read_snapshot


def _hist(spark, state: str) -> dict[int, int]:
    df = read_snapshot(spark, state)
    assert df is not None
    return {r.bucket: r.cnt for r in df.collect()}


def _batch(spark, values):
    return spark.createDataFrame(pd.DataFrame({"value": values}))


def test_replayed_batch_id_folds_nothing(spark, tmp_path):
    state = str(tmp_path / "h")
    fold_batch_into_histogram(_batch(spark, [1.0, 11.0]), state, 0)
    fold_batch_into_histogram(_batch(spark, [11.0, 21.0]), state, 1)
    assert _hist(spark, state) == {0: 1, 1: 2, 2: 1}
    assert committed_batch_id(state) == 1
    v = current_version(state)
    # at-least-once replay: same batch id, same content — must be a no-op
    fold_batch_into_histogram(_batch(spark, [11.0, 21.0]), state, 1)
    assert current_version(state) == v
    assert _hist(spark, state) == {0: 1, 1: 2, 2: 1}


def test_crash_before_flip_then_replay_counts_once(spark, tmp_path):
    state = str(tmp_path / "h")
    fold_batch_into_histogram(_batch(spark, [5.0]), state, 0)
    # crash window: half-written v=1, pointer still at v=0 (watermark 0)
    os.makedirs(os.path.join(state, "v=1"))
    open(os.path.join(state, "v=1", "part-junk.parquet"), "w").close()
    assert committed_batch_id(state) == 0
    fold_batch_into_histogram(_batch(spark, [15.0]), state, 1)  # the replay
    assert _hist(spark, state) == {0: 1, 1: 1}
    assert committed_batch_id(state) == 1


def test_empty_batch_commits_nothing(spark, tmp_path):
    state = str(tmp_path / "h")
    fold_batch_into_histogram(_batch(spark, [5.0]), state, 0)
    v = current_version(state)
    empty = _batch(spark, [5.0]).filter("value < 0")
    fold_batch_into_histogram(empty, state, 1)
    assert current_version(state) == v
    assert committed_batch_id(state) == 0  # idle ticks advance no watermark


def test_streaming_restart_ends_bit_equal_to_exact_recount(spark, tmp_path):
    """Full path: replay source -> foreachBatch fence sink, paced so the
    run spans several micro-batches; stop mid-stream, append more data,
    restart on the SAME checkpoint. Final histogram == exact recount of
    every value, and the served quantiles bracket the exact ones."""
    import time

    spark.dataSource.register(ReplayDataSource)
    src = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    state = str(tmp_path / "h")
    os.makedirs(src)

    def write_events(values, append=False):
        mode = "a" if append else "w"
        start = 1
        path = os.path.join(src, "shard-0001.jsonl")
        if append:
            with open(path, encoding="utf-8") as f:
                start = sum(1 for _ in f) + 1
        with open(path, mode, encoding="utf-8") as f:
            for i, v in enumerate(values, start=start):
                ev = {
                    "ContinuationSequenceNumber": str(i),
                    "MillisBehindLatest": 0,
                    "Records": [
                        {
                            "SequenceNumber": str(i),
                            "PartitionKey": "k",
                            "ApproximateArrivalTimestamp": 1.7e9 + i,
                            "Data": base64.b64encode(
                                json.dumps({"value": v}).encode()
                            ).decode(),
                        }
                    ],
                }
                f.write(json.dumps(ev) + "\n")

    first = [1.0, 12.5, 23.0, 34.9, 47.1, 5.5]
    second = [12.5, 99.0, 3.3]

    def expect(values):
        out: dict[int, int] = {}
        for v in values:
            b = int(v // W)
            out[b] = out.get(b, 0) + 1
        return out

    def run_until(target: dict[int, int]):
        # paced trigger (the replay source caps availableNow runs at one
        # batch per maxRecordsPerBatch window — same pattern as the paced
        # upsert e2e): poll the state until it converges, then stop.
        q = (
            spark.readStream.format("kinesis_replay")
            .option("path", src)
            .option("startingPosition", "trim_horizon")
            .option("maxRecordsPerBatch", "2")  # force several micro-batches
            .load()
            .select(
                F.from_json(F.col("data").cast("string"), "value double").alias("j")
            )
            .select("j.*")
            .writeStream.foreachBatch(histogram_state_sink(state))
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(processingTime="300 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                try:
                    if _hist(spark, state) == target:
                        break
                except AssertionError:
                    pass  # no snapshot committed yet
                time.sleep(0.5)
            assert _hist(spark, state) == target
        finally:
            q.stop()
            q.awaitTermination()

    write_events(first)
    run_until(expect(first))
    write_events(second, append=True)
    run_until(expect(first + second))  # restart on the same checkpoint

    exact = expect(first + second)
    assert _hist(spark, state) == exact

    served = {r.q: r for r in serve_quantiles(spark, state, (50, 99)).collect()}
    vals = sorted(first + second)
    n = len(vals)
    for q, r in served.items():
        true_q = vals[(q * n + 99) // 100 - 1]
        assert r.est_upper - W < true_q <= r.est_upper, (q, true_q, r.est_upper)
        assert r.total_count == n
