"""End-to-end: the streaming ingest gate (round 11 session 3) — the
daily-increment composite as a foreachBatch sink over the replay source.

Fences: per-batch dispositions (exact gate, near-dup gate, quotient-CC
split side with within-batch chains), cross-RUN gating (a later run's
docs reject against the first run's accepted state and INHERIT its split
side — the zero-straddle property, streaming form), and the marker/heal
crash-window protocol (an index store lost between appends re-derives
from the dispositions store before the next batch gates)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from broadway_kinesis_spark.streaming.ingest_gate import (
    BANDS,
    DIGESTS,
    LABELS,
    ingest_gate_sink,
)
from tests.test_streaming_incremental_dedup import DOC_SCHEMA, _write_docs


def _stream(spark, src_dir: str):
    from broadway_kinesis_spark.sources.replay import ReplayDataSource

    spark.dataSource.register(ReplayDataSource)
    return (
        spark.readStream.format("kinesis_replay")
        .option("path", src_dir)
        .option("startingPosition", "trim_horizon")
        .load()
        .select(F.from_json(F.col("data").cast("string"), DOC_SCHEMA).alias("j"))
        .select("j.doc_id", "j.text")
    )


def _run(spark, src_dir: str, ck: str, state: str) -> None:
    q = (
        _stream(spark, src_dir)
        .writeStream.foreachBatch(ingest_gate_sink(state))
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)


def _disp(spark, state: str) -> dict[int, dict]:
    return {
        r.doc_id: r.asDict()
        for r in spark.read.parquet(
            os.path.join(state, "dispositions.parquet")
        ).collect()
    }


BASE = (
    "the fast key order sort table scan merge part window small hash "
    "join batch stream spark dup query plan data row col agg disk mem"
)
NEAR = BASE.replace("window", "curtain")  # one word of ~24 -> high overlap
CHAIN = NEAR.replace("disk", "platter")  # near-dup of NEAR (2 edits off BASE)
OTHER = "completely different words in every position " + " ".join(
    f"tok{i}" for i in range(20)
)


def test_gate_batch_dispositions_and_chain(spark, tmp_path):
    """Batch 1: exact dup flagged + inherits the winner's group; a
    near-dup CHAIN (A~B, B~C) lands in ONE component with one split side;
    only chain-free, dup-free docs accept."""
    src, ck, state = (
        str(tmp_path / "src"),
        str(tmp_path / "ck"),
        str(tmp_path / "state"),
    )
    _write_docs(
        src,
        [(1, BASE), (2, NEAR), (3, CHAIN), (4, OTHER), (5, BASE)],
    )
    _run(spark, src, ck, state)
    d = _disp(spark, state)
    assert set(d) == {1, 2, 3, 4, 5}
    # doc 5 is an exact dup of doc 1 (same digest, larger id)
    assert d[5]["is_exact_dup"] and not d[5]["accepted"]
    assert not d[1]["is_exact_dup"]
    # the chain: 2 and 3 are near-dups (of 1 and 2 resp.) -> rejected
    assert d[2]["n_near_dups"] >= 1 and not d[2]["accepted"]
    assert d[3]["n_near_dups"] >= 1 and not d[3]["accepted"]
    # one component: every chain member (and the exact dup) shares doc 1's
    # group and split side — the zero-straddle property within a batch
    assert d[1]["accepted"] and d[4]["accepted"]
    for i in (2, 3, 5):
        assert d[i]["grp"] == d[1]["grp"]
        assert d[i]["split"] == d[1]["split"]
    assert d[4]["grp"] != d[1]["grp"]
    # only accepted docs entered the stores
    labels = spark.read.parquet(os.path.join(state, LABELS))
    assert {r.doc_id for r in labels.collect()} == {1, 4}


def test_gate_across_runs_inherits_split(spark, tmp_path):
    """Run 2's docs gate against run 1's persisted state: an exact
    re-arrival rejects, a near-dup of run-1 content rejects AND inherits
    run 1's group/split (the streaming zero-straddle), and fresh content
    accepts."""
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    _write_docs(src, [(1, BASE), (2, OTHER)])
    _run(spark, src, str(tmp_path / "ck1"), state)
    d1 = _disp(spark, state)
    assert d1[1]["accepted"] and d1[2]["accepted"]

    fresh = "entirely new content " + " ".join(f"w{i}" for i in range(25))
    _write_docs(src, [(10, BASE), (11, NEAR), (12, fresh)], append=True)
    _run(spark, src, str(tmp_path / "ck2"), state)
    d = _disp(spark, state)
    assert d[10]["is_exact_dup"] and not d[10]["accepted"]
    assert d[11]["n_near_dups"] >= 1 and not d[11]["accepted"]
    assert d[12]["accepted"]
    # inheritance: both rejected docs carry run-1 doc 1's group + side
    for i in (10, 11):
        assert d[i]["grp"] == d1[1]["grp"]
        assert d[i]["split"] == d1[1]["split"]
    # digests store grew only by the accepted doc
    digests = spark.read.parquet(os.path.join(state, DIGESTS))
    assert digests.distinct().count() == 3  # BASE, OTHER, fresh


def test_gate_heals_lost_index_from_dispositions(spark, tmp_path):
    """Crash window: the band index is lost after dispositions committed
    (marker left up). The next batch heals it from dispositions BEFORE
    gating, so a near-dup of the earlier accepted content still rejects."""
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    _write_docs(src, [(1, BASE)])
    _run(spark, src, str(tmp_path / "ck1"), state)
    # simulate the crash: bands store gone, marker up
    shutil.rmtree(os.path.join(state, BANDS))
    marker_dir = os.path.join(state, "_inflight")
    os.makedirs(marker_dir, exist_ok=True)
    with open(os.path.join(marker_dir, "batch"), "w", encoding="utf-8"):
        pass
    _write_docs(src, [(20, NEAR)], append=True)
    _run(spark, src, str(tmp_path / "ck2"), state)
    d = _disp(spark, state)
    assert d[20]["n_near_dups"] >= 1 and not d[20]["accepted"]
    # the healed band index covers the accepted doc again
    bands = spark.read.parquet(os.path.join(state, BANDS))
    assert {r.doc_id for r in bands.select("doc_id").distinct().collect()} == {1}
    assert not os.listdir(marker_dir)
