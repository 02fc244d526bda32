"""Round-6 operators: image perceptual-hash dedup, BPE merge training,
exact-substring span dedup.

Oracle parity lives in the driver harness (all three are fully
SQL-expressible); this file pins the semantics the oracle can't isolate —
hash locality, merge determinism, span-mask coverage — and the physical
plans the 100 TB posture depends on.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


# ------------------------------------------------------------- image phash
def _phash_of_text(text: str) -> int:
    """Closed-form fingerprint from the PPM construction: ASCII bytes
    zero-padded to a whole pixel grid, then phash48."""
    import numpy as np

    from broadway_kinesis_spark.operators.imagehash import _ROW, phash48

    body = text.encode("ascii")
    h = max(-(-len(body) // _ROW), 1)
    flat = np.frombuffer(body + b"\x00" * (h * _ROW - len(body)), dtype=np.uint8)
    return phash48(flat)


def test_phash_identical_and_perturbed_locality():
    """Identical planes hash identically; a tiny perturbation moves only a
    few bits (the locality property banding relies on); a very different
    plane moves many."""
    base = "the quick brown fox jumps over the lazy dog " * 6
    tweak = base[:37] + "X" + base[38:]
    other = "zzzz AAAA 0000 !!!! " * 12
    h0, h1, h2 = _phash_of_text(base), _phash_of_text(tweak), _phash_of_text(other)
    assert h0 == _phash_of_text(base)
    assert 0 <= bin(h0 ^ h1).count("1") <= 6
    assert bin(h0 ^ h2).count("1") > 6


def test_image_phash_pairs_match_python_reference(spark):
    """On a crafted corpus the full banded pipeline must return EXACTLY the
    pairs a brute-force Python reference of the same fingerprint + band +
    verify rules produces."""
    from broadway_kinesis_spark.operators.imagehash import (
        BAND_BITS,
        HAM_T,
        N_BANDS,
    )

    texts = {
        0: "the quick brown fox jumps over the lazy dog " * 6,
        1: "the quick brown fox jumps over the lazy dog " * 6,  # exact dup
        2: ("the quick brown fox jumps over the lazy dog " * 6)[:50]
        + "Q"
        + ("the quick brown fox jumps over the lazy dog " * 6)[51:],  # near
        3: "zzzz AAAA 0000 !!!! " * 12,  # unrelated
    }
    expected = set()
    fps = {d: _phash_of_text(t) for d, t in texts.items()}
    for d1 in texts:
        for d2 in texts:
            if d1 >= d2:
                continue
            p1, p2 = fps[d1], fps[d2]
            shares_band = any(
                (p1 >> (b * BAND_BITS)) & ((1 << BAND_BITS) - 1)
                == (p2 >> (b * BAND_BITS)) & ((1 << BAND_BITS) - 1)
                for b in range(N_BANDS)
            )
            if shares_band and bin(p1 ^ p2).count("1") <= HAM_T:
                expected.add((d1, d2, bin(p1 ^ p2).count("1")))
    assert (0, 1, 0) in expected  # the construction really makes a dup pair
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            (r.m1, r.m2, r.hamming)
            for r in QUERIES["dedup_image_phash"](spark, td).collect()
        }
    assert got == expected


def test_image_phash_plan_one_arrow_stage_no_cartesian(spark, sf_dir):
    """Decode is ONE Arrow-batched Python stage; the band join is an
    equi-join (never cartesian/NLJ); verify adds no extra Python."""
    from broadway_kinesis_spark.plans import formatted_plan

    import re

    plan = formatted_plan(QUERIES["dedup_image_phash"](spark, sf_dir))
    # the cached fingerprint stage may print under BOTH self-join branches,
    # but it must be ONE node (same id) — i.e. decode runs once at runtime
    ids = set(re.findall(r"MapInPandas \((\d+)\)", plan))
    assert len(ids) == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
