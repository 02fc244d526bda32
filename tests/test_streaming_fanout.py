"""Integration e2e: ONE stream fanning out to all four stateful sinks.

Production streaming topologies rarely run one sink per query — a single
``foreachBatch`` body routes each micro-batch into several state stores
(dedup index, upsert snapshot, metric summaries). Every sink has its own
e2e suite; this test drives the COMPOSED topology: one replay stream of
composite records, one foreachBatch calling all four sink bodies, paced
into several micro-batches, stopped mid-stream, and restarted on the same
checkpoint. Afterwards every store must equal an independent recompute
from the raw records — which exercises the four DIFFERENT replay-safety
mechanisms side by side on the same batch ids (digest anti-join,
latest-wins, HLL union idempotency, and the histogram batch-id fence).
"""

from __future__ import annotations

import base64
import json
import os
import time

from pyspark.sql import functions as F

from broadway_kinesis_spark.operators.quantiles import W
from broadway_kinesis_spark.sources.replay import ReplayDataSource
from broadway_kinesis_spark.streaming.histogram_state import (
    fold_batch_into_histogram,
)
from broadway_kinesis_spark.streaming.incremental import dedup_batch_against_index
from broadway_kinesis_spark.streaming.rolling_sketch import (
    fold_batch_into_day_sketches,
)
from broadway_kinesis_spark.streaming.upsert import (
    read_snapshot,
    upsert_batch_into_snapshot,
)

SCHEMA = (
    "doc_id long, text string, user_id long, event_type string, "
    "ts timestamp, seq long, value double"
)


def _write(src, recs, append=False):
    os.makedirs(src, exist_ok=True)
    path = os.path.join(src, "shard-0001.jsonl")
    start = 1
    if append:
        with open(path, encoding="utf-8") as f:
            start = sum(1 for _ in f) + 1
    with open(path, "a" if append else "w", encoding="utf-8") as f:
        for i, r in enumerate(recs, start=start):
            ev = {
                "ContinuationSequenceNumber": str(i),
                "MillisBehindLatest": 0,
                "Records": [
                    {
                        "SequenceNumber": str(i),
                        "PartitionKey": str(r["user_id"]),
                        "ApproximateArrivalTimestamp": 1.7e9 + i,
                        "Data": base64.b64encode(json.dumps(r).encode()).decode(),
                    }
                ],
            }
            f.write(json.dumps(ev) + "\n")


def _rec(i, text, user, et, day, value):
    return {
        "doc_id": i,
        "text": text,
        "user_id": user,
        "event_type": et,
        "ts": f"2024-01-{day:02d} 00:00:{i % 60:02d}",
        "seq": i,
        "value": value,
    }


def test_fanout_topology_survives_restart_and_matches_recompute(spark, tmp_path):
    spark.dataSource.register(ReplayDataSource)
    src = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    dd_idx = str(tmp_path / "dd_idx")
    dd_acc = str(tmp_path / "dd_acc")
    snap = str(tmp_path / "snap")
    hist = str(tmp_path / "hist")
    sketch = str(tmp_path / "sketch")

    first = [
        _rec(0, "alpha beta gamma", 1, "a", 1, 5.0),
        _rec(1, "alpha beta gamma", 2, "a", 1, 15.0),  # dup text
        _rec(2, "unique one", 1, "a", 2, 25.0),  # later change for (1, a)
        _rec(3, "unique two", 3, "b", 2, 35.0),
    ]
    second = [
        _rec(4, "alpha beta gamma", 1, "a", 3, 45.0),  # dup text, newer (1, a)
        _rec(5, "unique three", 2, "a", 3, 55.0),
    ]

    def sink(batch_df, batch_id):
        batch_df.persist()
        try:
            dedup_batch_against_index(
                batch_df.select("doc_id", "text"), dd_idx, dd_acc
            )
            upsert_batch_into_snapshot(
                batch_df.select("user_id", "event_type", "ts", "seq", "value"),
                snap,
            )
            fold_batch_into_histogram(
                batch_df.select("value"), hist, batch_id
            )
            fold_batch_into_day_sketches(
                batch_df.select("ts", "user_id"), sketch
            )
        finally:
            batch_df.unpersist()

    def converged(recs):
        """True once EVERY sink reflects all of ``recs`` — stopping on the
        first sink's state alone would interrupt the later sinks of the
        final batch mid-fold (at-least-once would heal it on the NEXT
        restart, but the assertion phase runs before any)."""
        try:
            seen, keep = set(), set()
            for r in recs:
                if r["text"] not in seen:
                    seen.add(r["text"])
                    keep.add(r["doc_id"])
            if {r.doc_id for r in spark.read.parquet(dd_acc).collect()} != keep:
                return False
            h = read_snapshot(spark, hist)
            if h is None or sum(r.cnt for r in h.collect()) != len(recs):
                return False
            s = read_snapshot(spark, snap)
            if s is None or s.count() != len(
                {(r["user_id"], r["event_type"]) for r in recs}
            ):
                return False
            sk = read_snapshot(spark, sketch)
            if sk is None or sk.count() != len({r["ts"][8:10] for r in recs}):
                return False
            return True
        except Exception:
            return False

    def run(recs):
        q = (
            spark.readStream.format("kinesis_replay")
            .option("path", src)
            .option("startingPosition", "trim_horizon")
            .option("maxRecordsPerBatch", "2")
            .load()
            .select(F.from_json(F.col("data").cast("string"), SCHEMA).alias("j"))
            .select("j.*")
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(processingTime="300 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 120
            while time.time() < deadline and not converged(recs):
                time.sleep(0.5)
            assert converged(recs), "fan-out sinks never converged"
        finally:
            q.stop()
            q.awaitTermination()

    _write(src, first)
    run(first)  # doc 1 is a text-dup of doc 0
    _write(src, second, append=True)
    run(first + second)  # doc 4 dups doc 0 ACROSS batches and the restart

    all_recs = first + second
    # 1. dedup: keep-first per distinct text
    seen, keep = set(), set()
    for r in all_recs:
        if r["text"] not in seen:
            seen.add(r["text"])
            keep.add(r["doc_id"])
    acc = {r.doc_id for r in spark.read.parquet(dd_acc).collect()}
    assert acc == keep

    # 2. upsert: latest (ts, seq) per (user_id, event_type)
    latest = {}
    for r in all_recs:
        k = (r["user_id"], r["event_type"])
        v = (r["ts"], r["seq"], r["value"])
        if k not in latest or v[:2] > latest[k][:2]:
            latest[k] = v
    snap_df = read_snapshot(spark, snap)
    got_latest = {
        (r.user_id, r.event_type): (str(r.ts), r.seq, r.value)
        for r in snap_df.collect()
    }
    assert got_latest == latest

    # 3. histogram: exact recount (the batch-id fence absorbed the replay)
    expect_hist = {}
    for r in all_recs:
        b = int(r["value"] // W)
        expect_hist[b] = expect_hist.get(b, 0) + 1
    got_hist = {
        r.bucket: r.cnt for r in read_snapshot(spark, hist).collect()
    }
    assert got_hist == expect_hist

    # 4. rolling sketch: one day-sketch row per distinct day, estimates
    # equal to exact per-day distincts at this tiny cardinality
    from pyspark.sql import functions as SF

    sk = read_snapshot(spark, sketch)
    est = {
        r.day_id: r.est
        for r in sk.select(
            "day_id", SF.expr("hll_sketch_estimate(sk)").alias("est")
        ).collect()
    }
    days = {}
    for r in all_recs:
        day = int(r["ts"][8:10])
        days.setdefault(day, set()).add(r["user_id"])
    # day_id is days-since-epoch; compare by cardinality multiset
    assert sorted(est.values()) == sorted(len(v) for v in days.values())
    assert len(est) == len(days)
