#!/usr/bin/env python
"""MinHash banding sweep (VERDICT r7 #6): measure, don't guess the
(N_SIG, BAND_R) operating point.

For each configuration, against the SAME exact ground truth (the
inverted-index channel's verified pairs), report:

- verified-pair recall (what the bands actually surface),
- candidate volume (what the bands cost before verification — the
  scale-cost driver at 100 TB),
- wall time on this host.

Two corpora:
- FENCE: planted borderline pairs at j = 12/24 (exactly the 0.5
  threshold) and j = 13/23 ≈ 0.565 — the regime where banding really
  misses (high-j fixture dups never miss, so they cannot discriminate);
- fresh x10 (/tmp/sf_fresh_x10): the realistic sparse-dup corpus.

Usage: python tools/banding_sweep.py [fresh_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = [(12, 3), (12, 2), (24, 3), (24, 2), (48, 3), (48, 2)]


def _fence_corpus(spark, td: str, n_pairs: int = 200) -> None:
    """Borderline-Jaccard pairs with pair-private vocab (DF cap never
    binds), half at j = 13/23, half at j = 12/24, plus singleton noise."""
    rows, did = [], 0
    for k in range(n_pairs):
        repl = 5 if k % 2 == 0 else 6
        base = [f"p{k}w{i}" for i in range(20)]
        part = base[: 20 - repl] + [f"p{k}x{i}" for i in range(repl)]
        rows.append((did, " ".join(base)))
        rows.append((did + 1, " ".join(part)))
        did += 2
    for j in range(50):
        rows.append((did, " ".join(f"s{j}u{i}" for i in range(15))))
        did += 1
    df = spark.createDataFrame(
        [(d, t, "en", "src0", len(t)) for d, t in rows],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    df.write.parquet(os.path.join(td, "documents.parquet"))


def _sweep(spark, label: str, sf_dir: str) -> None:
    from broadway_kinesis_spark.operators.dedup import (
        dedup_ngram_jaccard,
        minhash_candidates,
        minhash_pairs,
    )

    t0 = time.time()
    exact = {
        (r.d1, r.d2) for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    print(
        f"\n== {label}: exact channel {len(exact)} pairs"
        f" ({time.time() - t0:.1f}s) =="
    )
    print(f"{'n_sig':>5} {'r':>2} {'bands':>5} {'cands':>9} {'found':>6} "
          f"{'recall':>7} {'secs':>6}")
    for n_sig, band_r in CONFIGS:
        t0 = time.time()
        cand = minhash_candidates(spark, sf_dir, n_sig, band_r)
        n_cand = cand.count()
        found = {
            (r.d1, r.d2)
            for r in minhash_pairs(spark, sf_dir, n_sig, band_r).collect()
        }
        dt = time.time() - t0
        cand.unpersist()
        rec = len(found & exact) / len(exact) if exact else float("nan")
        print(
            f"{n_sig:>5} {band_r:>2} {n_sig // band_r:>5} {n_cand:>9} "
            f"{len(found):>6} {rec:>7.4f} {dt:>6.1f}"
        )


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.driver.memory", "16g")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    with tempfile.TemporaryDirectory() as td:
        _fence_corpus(spark, td)
        _sweep(spark, "FENCE (borderline j in {0.5, 0.565})", td)
    fresh = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_fresh_x10"
    if os.path.isdir(fresh):
        _sweep(spark, f"FRESH x10 ({fresh})", fresh)
    spark.stop()


if __name__ == "__main__":
    main()
