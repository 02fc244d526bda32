"""End-to-end: streaming NEAR-dup dedup (VERDICT r3 #5) — the MinHash band
index rejects documents that are merely near-duplicates (not byte-identical)
of anything accepted in an earlier micro-batch, an earlier run (across
restart), or earlier in the same batch; the marker/self-heal protocol keeps
the band+signature index consistent through the crash window."""

from __future__ import annotations

import base64
import json
import os

from pyspark.sql import functions as F

from broadway_kinesis_spark.sources.replay import ReplayDataSource
from broadway_kinesis_spark.streaming.incremental import (
    SIM_T,
    _sig_agreement,
    _with_signature,
    neardup_batch_against_index,
    neardup_dedup_sink,
)

DOC_SCHEMA = "doc_id long, text string"

# Text pairs chosen with their DETERMINISTIC MinHash outcomes pre-verified
# (md5 is fixed, so these never flake): each near pair band-collides and
# agrees >= SIM_T; all cross-pairs neither collide nor agree.
BASE_A = "the quick brown fox jumps over the lazy dog while cold rain falls"
NEAR_A = "the quick brown fox jumps over the lazy cat while cold rain falls"
BASE_B = "distributed query engines shuffle data between executors during wide transformations while optimizers prune unused columns"
NEAR_B = "distributed query engines shuffle data across executors during wide transformations while optimizers prune unused columns"
OTHER_C = "seven silent owls watch amber moons drift across frozen northern skies"
OTHER_D = "machine translation models require massive parallel corpora spanning many language pairs collected from diverse public sources"


def _write_docs(d: str, docs: list[tuple[int, str]], append: bool = False) -> None:
    os.makedirs(d, exist_ok=True)
    mode = "a" if append else "w"
    start = 1
    if append:
        with open(os.path.join(d, "shard-0001.jsonl"), encoding="utf-8") as f:
            start = sum(1 for _ in f) + 1
    with open(os.path.join(d, "shard-0001.jsonl"), mode, encoding="utf-8") as f:
        for i, (doc_id, text) in enumerate(docs, start=start):
            ev = {
                "ContinuationSequenceNumber": str(i),
                "MillisBehindLatest": 0,
                "Records": [
                    {
                        "SequenceNumber": str(i),
                        "PartitionKey": str(doc_id),
                        "ApproximateArrivalTimestamp": 1.7e9 + i,
                        "Data": base64.b64encode(
                            json.dumps({"doc_id": doc_id, "text": text}).encode()
                        ).decode(),
                    }
                ],
            }
            f.write(json.dumps(ev) + "\n")


def _stream(spark, src_dir: str, paced: bool):
    reader = (
        spark.readStream.format("kinesis_replay")
        .option("path", src_dir)
        .option("startingPosition", "trim_horizon")
    )
    if paced:
        reader = reader.option("maxRecordsPerBatch", "2")
    return (
        reader.load()
        .select(F.from_json(F.col("data").cast("string"), DOC_SCHEMA).alias("j"))
        .select("j.doc_id", "j.text")
    )


def _accepted_ids(spark, accepted: str) -> list[int]:
    return sorted(
        r.doc_id for r in spark.read.parquet(accepted).select("doc_id").collect()
    )


def test_signature_agreement_separates_near_dups_from_distinct(spark):
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": [BASE_A, NEAR_A, OTHER_C]}
        )
    )
    sigs = {r.doc_id: r.sig for r in _with_signature(docs).collect()}
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "a": [sigs[1], sigs[1]],
                "b": [sigs[2], sigs[3]],
            }
        )
    ).select(_sig_agreement(F.col("a"), F.col("b")).alias("sim"))
    near, distinct = [r.sim for r in df.collect()]
    assert near >= SIM_T, f"one-word edit must read as near-dup (sim={near})"
    assert distinct < SIM_T, f"unrelated text must not (sim={distinct})"


def test_short_docs_fall_back_to_exact_dedup(spark, tmp_path):
    """Documents too short to shingle (<3 words) hash their whole text:
    identical shorts are rejected, distinct shorts are both accepted —
    near-dup detection degrades to exact-dup instead of either crashing on
    an empty shingle set or waving every short doc through."""
    import pandas as pd

    index = str(tmp_path / "index")
    accepted = str(tmp_path / "accepted")
    batch1 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["hello world", "tiny"]})
    )
    assert neardup_batch_against_index(batch1, index, accepted) == 2
    batch2 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [3, 4], "text": ["hello world", "other short"]})
    )
    assert neardup_batch_against_index(batch2, index, accepted) == 1
    assert _accepted_ids(spark, accepted) == [1, 2, 4]


def test_neardup_within_across_batches_and_restarts(spark, tmp_path):
    spark.dataSource.register(ReplayDataSource)
    src = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    index = str(tmp_path / "index")
    accepted = str(tmp_path / "accepted")

    # paced 2/batch -> 3 micro-batches:
    #   batch 1: 1:BASE_A, 2:BASE_B               -> both accepted
    #   batch 2: 3:NEAR_A (cross-batch NEAR dup), 4:OTHER_C -> only 4
    #   batch 3: 5:OTHER_D, 6:OTHER_D-near (within-batch near dup) -> only 5
    near_d = OTHER_D.replace("parallel", "aligned")
    _write_docs(
        src,
        [
            (1, BASE_A),
            (2, BASE_B),
            (3, NEAR_A),
            (4, OTHER_C),
            (5, OTHER_D),
            (6, near_d),
        ],
    )
    import time

    q = (
        _stream(spark, src, paced=True)
        .writeStream.foreachBatch(neardup_dedup_sink(index, accepted))
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if len(_accepted_ids(spark, accepted)) >= 4:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        while time.time() < deadline:
            st = q.status
            if not st["isDataAvailable"] and not st["isTriggerActive"]:
                break
            time.sleep(0.2)
    finally:
        q.stop()
    assert _accepted_ids(spark, accepted) == [1, 2, 4, 5]

    # restart: 7 is a near-dup of doc 2 from the PREVIOUS run (the
    # persisted band index must reject it); 8 is genuinely new.
    _write_docs(src, [(7, NEAR_B), (8, "entirely different closing sentence about gardens and evening light")], append=True)
    q = (
        _stream(spark, src, paced=False)
        .writeStream.foreachBatch(neardup_dedup_sink(index, accepted))
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert _accepted_ids(spark, accepted) == [1, 2, 4, 5, 8]

    # the index holds band + signature rows for exactly the accepted docs
    bands = spark.read.parquet(os.path.join(index, "bands.parquet"))
    sigs = spark.read.parquet(os.path.join(index, "sigs.parquet"))
    assert {r.doc_id for r in sigs.select("doc_id").distinct().collect()} == {1, 2, 4, 5, 8}
    assert {r.doc_id for r in bands.select("doc_id").distinct().collect()} == {1, 2, 4, 5, 8}


def test_crash_between_appends_heals_band_index(spark, tmp_path):
    """Crash window: accepted append landed, index appends did not. The
    replayed batch must reject a NEAR duplicate of the crashed doc (heal
    re-derives its signature + band rows from accepted text first)."""
    import pandas as pd

    index = str(tmp_path / "index")
    accepted = str(tmp_path / "accepted")
    marker_dir = accepted + "_inflight"
    os.makedirs(marker_dir)

    spark.createDataFrame(
        pd.DataFrame({"doc_id": [5], "text": [BASE_B]})
    ).write.parquet(accepted)
    open(os.path.join(marker_dir, "batch"), "w").close()

    replay = spark.createDataFrame(
        pd.DataFrame({"doc_id": [5, 6, 7], "text": [BASE_B, NEAR_B, OTHER_C]})
    )
    n = neardup_batch_against_index(replay, index, accepted)
    assert n == 1  # exact replay 5 AND near-dup 6 rejected; only 7 in
    assert _accepted_ids(spark, accepted) == [5, 7]
    assert not os.listdir(marker_dir)
    sigs = spark.read.parquet(os.path.join(index, "sigs.parquet"))
    assert {r.doc_id for r in sigs.select("doc_id").distinct().collect()} == {5, 7}
