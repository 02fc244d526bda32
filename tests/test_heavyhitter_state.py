"""Streaming heavy-hitter state: the shared fence's second consumer.

Token counts double-count on replay like histogram counts do; these
tests prove the extracted ``snapshot_store`` fence protects a brand-new
sink with zero sink-local protocol code: fenced replays fold nothing, a
crash before the flip replays exactly once, and the served result equals
the BATCH operator's answer over the concatenation of all batches
(cross-surface consistency)."""

from __future__ import annotations

import os

from broadway_kinesis_spark.streaming.heavyhitter_state import (
    fold_batch_into_heavy_hitters,
    serve_heavy_hitters,
)
from broadway_kinesis_spark.streaming.snapshot_store import (
    committed_batch_id,
    current_version,
    read_snapshot,
)


def _batch(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], ["text"])


def _counts(spark, state):
    return {r.token: r.cnt for r in read_snapshot(spark, state).collect()}


def test_replayed_batch_folds_nothing(spark, tmp_path):
    state = str(tmp_path / "hh")
    fold_batch_into_heavy_hitters(_batch(spark, ["a b a", "b c"]), state, 0)
    fold_batch_into_heavy_hitters(_batch(spark, ["a a"]), state, 1)
    assert _counts(spark, state) == {"a": 4, "b": 2, "c": 1}
    v = current_version(state)
    fold_batch_into_heavy_hitters(_batch(spark, ["a a"]), state, 1)  # replay
    assert current_version(state) == v
    assert _counts(spark, state) == {"a": 4, "b": 2, "c": 1}
    assert committed_batch_id(state) == 1


def test_crash_before_flip_replays_once(spark, tmp_path):
    state = str(tmp_path / "hh")
    fold_batch_into_heavy_hitters(_batch(spark, ["x y"]), state, 0)
    # crash window: half-written v=1, pointer still names v=0
    os.makedirs(os.path.join(state, "v=1"))
    open(os.path.join(state, "v=1", "part-junk.parquet"), "w").close()
    assert committed_batch_id(state) == 0
    fold_batch_into_heavy_hitters(_batch(spark, ["x z"]), state, 1)  # replay
    assert _counts(spark, state) == {"x": 2, "y": 1, "z": 1}
    assert committed_batch_id(state) == 1


def test_serve_matches_batch_operator_over_all_batches(spark, tmp_path):
    import tempfile

    from broadway_kinesis_spark.operators.heavyhitters import (
        THETA_DEN,
        THETA_NUM,
    )

    state = str(tmp_path / "hh")
    batches = [
        ["hot hot hot warm", "hot cold"],
        ["hot warm warm", "mild mild"],
        ["hot hot"],
    ]
    for i, texts in enumerate(batches):
        fold_batch_into_heavy_hitters(_batch(spark, texts), state, i)
    got = {
        r.token: (r.cnt, r.total_tokens)
        for r in serve_heavy_hitters(spark, state).collect()
    }
    # batch-side answer over the concatenated corpus
    import collections

    counts = collections.Counter()
    for texts in batches:
        for t in texts:
            counts.update(t.split(" "))
    total = sum(counts.values())
    want = {
        t: (c, total)
        for t, c in counts.items()
        if c * THETA_DEN >= total * THETA_NUM
    }
    # at this toy total the theta threshold is < 1 so every token
    # qualifies on both sides — the assertion pins serve == batch answer
    # (counts AND totals), which is the cross-surface property under test
    assert got == want and got
