"""Cross-surface consistency: batch and streaming answers must agree.

The engine exposes the same CDC semantics through three surfaces — the
batch SCD2 history build (operators/scd.py), the batch MERGE classifier
(operators/cdc.py via its own oracle), and the streaming upsert snapshot
(streaming/upsert.py). Each is verified against its own reference; this
suite pins them to EACH OTHER on shared data, because "every surface
individually correct against its own oracle" does not yet prove the
surfaces implement the same semantics (tie-break rules are where they
would quietly diverge).

Also: a hypothesis round-trip for the overlapping chunker on arbitrary
word streams (empty-ish, exact-multiple, ragged — the same property
family paragraphs.py's chunker carries).
"""

from __future__ import annotations

import os
import random

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from broadway_kinesis_spark import registry
from broadway_kinesis_spark.streaming.upsert import (
    read_snapshot,
    upsert_batch_into_snapshot,
)


@pytest.fixture(scope="module")
def queries():
    return registry.queries()


def test_scd2_current_rows_equal_streaming_upsert_state(
    spark, tmp_path, queries
):
    """Fold a change stream into the streaming upsert snapshot in three
    batches; the snapshot must equal the is_current rows of the batch
    SCD2 history over the SAME events — including on (ts) ties, which
    both surfaces must break identically (seq / event_id order)."""
    rng = random.Random(20260814)
    rows = []
    for i in range(120):
        rows.append(
            (
                i,
                pd.Timestamp("2024-01-01")
                + pd.Timedelta(minutes=rng.randrange(50)),  # dense -> ties
                rng.randrange(6),
                rng.choice(["a", "b"]),
                float(rng.randrange(1000)) / 10,
                "{}",
            )
        )
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    td = str(tmp_path / "sf")
    spark.createDataFrame(pdf).write.parquet(os.path.join(td, "events.parquet"))

    # batch surface: SCD2 current rows
    current = {
        (r.user_id, r.event_type): (r.valid_from, r.value)
        for r in queries["cdc_scd2_history"](spark, td).collect()
        if r.is_current
    }

    # streaming surface: fold the same events as 3 upsert batches, using
    # event_id as seq (the SCD2 tie-break order)
    snap = str(tmp_path / "snap")
    changes = spark.createDataFrame(pdf).select(
        "user_id", "event_type", "ts", F.col("event_id").alias("seq"), "value"
    )
    for k in range(3):
        upsert_batch_into_snapshot(changes.filter(F.col("seq") % 3 == k), snap)
    state = {
        (r.user_id, r.event_type): (r.ts, r.value)
        for r in read_snapshot(spark, snap).collect()
    }
    assert state == current


_WORDS = st.lists(
    st.text(alphabet="abcXYZ019", min_size=0, max_size=5), min_size=1, max_size=90
)


@settings(max_examples=15, deadline=None)
@given(_WORDS)
def test_chunker_round_trips_arbitrary_word_streams(
    spark, tmp_path_factory, words
):
    """For ANY word stream: chunk ids tile at STRIDE, every chunk slices
    the document exactly, the final chunk reaches the end, and
    stride-prefix reassembly reconstructs the (lowercased, single-space)
    document — including ragged tails and chunk counts of exactly one."""
    from broadway_kinesis_spark.operators.chunking import CHUNK_W, STRIDE

    registry.queries()
    fn = registry.REGISTRY["text_chunk_overlap"].fn
    td = str(tmp_path_factory.mktemp("ck"))
    text = " ".join(words)
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": [text]})
    ).write.mode("overwrite").parquet(os.path.join(td, "documents.parquet"))
    chunks = sorted(fn(spark, td).collect(), key=lambda r: r.chunk_id)
    lw = text.lower().split(" ")
    assert chunks, "every document yields at least one chunk"
    assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
    rebuilt = []
    for c in chunks:
        assert c.start_word == c.chunk_id * STRIDE
        assert c.chunk_text == " ".join(lw[c.start_word : c.start_word + CHUNK_W])
        assert c.chunk_words == min(len(lw) - c.start_word, CHUNK_W)
        is_last = c is chunks[-1]
        rebuilt.extend(
            lw[c.start_word :] if is_last else lw[c.start_word : c.start_word + STRIDE]
        )
    assert rebuilt == lw
    last = chunks[-1]
    assert last.start_word + last.chunk_words == len(lw)
    # minimality: one chunk fewer would leave words uncovered
    if len(chunks) > 1:
        assert (len(chunks) - 2) * STRIDE + CHUNK_W < len(lw)
