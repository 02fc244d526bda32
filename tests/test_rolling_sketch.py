"""Streaming rolling-distinct state (streaming/rolling_sketch.py): per-day
HLL sketches folded across micro-batches and restarts, served with zero
raw re-reads; replay is absorbed by sketch-union idempotency."""

from __future__ import annotations

import base64
import json
import os

import pandas as pd
from pyspark.sql import functions as F

from broadway_kinesis_spark.sources.replay import ReplayDataSource
from broadway_kinesis_spark.streaming.rolling_sketch import (
    US_PER_DAY,
    fold_batch_into_day_sketches,
    rolling_sketch_sink,
    serve_rolling_distinct,
)
from broadway_kinesis_spark.streaming.upsert import current_version

EVENT_SCHEMA = "ts timestamp, user_id long"


def _batch(spark, rows: list[tuple[str, int]]):
    pdf = pd.DataFrame(rows, columns=["ts", "user_id"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf)


def _exact_rolling(rows: list[tuple[str, int]], window_days: int) -> dict[int, int]:
    from collections import defaultdict

    by_day: dict[int, set] = defaultdict(set)
    for ts, uid in rows:
        day = int(pd.Timestamp(ts).value // 1000 // US_PER_DAY)
        by_day[day].add(uid)
    out = {}
    for d in by_day:
        users = set().union(
            *(by_day.get(x, set()) for x in range(d - window_days + 1, d + 1))
        )
        out[d] = len(users)
    return out


def _assert_close(served: dict[int, int], exact: dict[int, int]) -> None:
    assert set(served) == set(exact)
    for d, n in exact.items():
        assert abs(served[d] - n) <= max(1, int(0.05 * n)), (d, served[d], n)


def test_fold_serve_across_batches_and_replay_idempotency(spark, tmp_path):
    state = str(tmp_path / "state")
    rows1 = [("2024-01-01 10:00", 1), ("2024-01-01 11:00", 2), ("2024-01-02 10:00", 2)]
    rows2 = [("2024-01-02 12:00", 3), ("2024-01-05 09:00", 4), ("2024-01-05 10:00", 1)]

    fold_batch_into_day_sketches(_batch(spark, rows1), state)
    fold_batch_into_day_sketches(_batch(spark, rows2), state)
    served = {
        r.day_id: r.est_users
        for r in serve_rolling_distinct(spark, state, 3).collect()
    }
    _assert_close(served, _exact_rolling(rows1 + rows2, 3))

    # at-least-once replay: re-folding batch 2 must not change any count —
    # HLL union is idempotent, so no dedup bookkeeping is needed at all
    v_before = current_version(state)
    fold_batch_into_day_sketches(_batch(spark, rows2), state)
    assert current_version(state) == v_before + 1  # a new version commits...
    replayed = {
        r.day_id: r.est_users
        for r in serve_rolling_distinct(spark, state, 3).collect()
    }
    assert replayed == served  # ...with identical estimates

    # empty batch: no rewrite
    fold_batch_into_day_sketches(_batch(spark, rows1).filter("user_id < 0"), state)
    assert current_version(state) == v_before + 1

    # serving never touches raw events: different widths from the same blobs
    wide = {
        r.day_id: r.est_users
        for r in serve_rolling_distinct(spark, state, 7).collect()
    }
    _assert_close(wide, _exact_rolling(rows1 + rows2, 7))


def test_crash_before_flip_heals_on_next_fold(spark, tmp_path):
    state = str(tmp_path / "state")
    rows = [("2024-01-01 10:00", 1)]
    fold_batch_into_day_sketches(_batch(spark, rows), state)
    # simulate crash: half-written v=1 without a pointer flip
    os.makedirs(os.path.join(state, "v=1"))
    open(os.path.join(state, "v=1", "part-junk.parquet"), "w").close()
    assert current_version(state) == 0
    fold_batch_into_day_sketches(_batch(spark, [("2024-01-02 10:00", 2)]), state)
    assert current_version(state) == 1
    served = {
        r.day_id: r.est_users
        for r in serve_rolling_distinct(spark, state, 7).collect()
    }
    _assert_close(served, _exact_rolling(rows + [("2024-01-02 10:00", 2)], 7))


def test_streaming_e2e_sink_builds_servable_state(spark, tmp_path):
    spark.dataSource.register(ReplayDataSource)
    src = str(tmp_path / "in")
    os.makedirs(src)
    rows = [
        ("2024-01-01 10:00:00", 1),
        ("2024-01-01 11:00:00", 2),
        ("2024-01-02 10:00:00", 2),
        ("2024-01-03 10:00:00", 3),
    ]
    with open(os.path.join(src, "shard-0001.jsonl"), "w", encoding="utf-8") as f:
        for i, (ts, uid) in enumerate(rows, start=1):
            ev = {
                "ContinuationSequenceNumber": str(i),
                "MillisBehindLatest": 0,
                "Records": [
                    {
                        "SequenceNumber": str(i),
                        "PartitionKey": str(uid),
                        "ApproximateArrivalTimestamp": 1.7e9 + i,
                        "Data": base64.b64encode(
                            json.dumps({"ts": ts, "user_id": uid}).encode()
                        ).decode(),
                    }
                ],
            }
            f.write(json.dumps(ev) + "\n")
    state = str(tmp_path / "state")
    q = (
        spark.readStream.format("kinesis_replay")
        .option("path", src)
        .option("startingPosition", "trim_horizon")
        .load()
        .select(F.from_json(F.col("data").cast("string"), EVENT_SCHEMA).alias("j"))
        .select("j.*")
        .writeStream.foreachBatch(rolling_sketch_sink(state))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    served = {
        r.day_id: r.est_users
        for r in serve_rolling_distinct(spark, state, 2).collect()
    }
    _assert_close(served, _exact_rolling(rows, 2))
