#!/usr/bin/env python
"""Build a REPLICATION-FREE K-times documents/embeddings corpus.

Usage: python tools/make_fresh_corpus.py [dst_dir] [K] [seed]
       (defaults: /tmp/sf_fresh_x100 100 6)

tools/make_scale_corpus.py replicates the fixture with offset keys, which
is right for join/agg throughput but ADVERSARIAL for the dedup family:
every document gains K-1 exact copies, so pair volume measures the
replication trick, not the algorithm (BASELINE.md x10 caveat; VERDICT r5
#7). This tool instead SYNTHESIZES fresh content with the scale
properties a real K-times corpus would have:

- documents: K x 5000 docs, 10-100 tokens, drawn Zipf-style from a
  ~10k-word vocabulary (the fixture's 31-word vocab does not grow with
  corpus size; a real one does — vocab size is what keeps shingle
  document-frequencies bounded at scale);
- duplicate structure is SPARSE and controlled: ~1% of docs are cluster
  bases and each gets one near-duplicate (2 token edits) plus one exact
  duplicate — so dedup output sizes stay O(corpus * dup_rate), the
  realistic regime;
- embeddings: K x 2000 unit vectors (dim 64) in 10 label clusters with
  ~1% near-identical pairs for the semantic-dedup path.

Throughput measurement only; correctness always runs against the
driver's fixtures (TESTDATA.md).
"""

from __future__ import annotations

import os
import sys

import numpy as np

BASE_WORDS = [
    "the", "fast", "key", "order", "sort", "table", "scan", "merge",
    "part", "window", "small", "hash", "join", "batch", "stream",
    "spark", "dup", "query", "plan", "data", "row", "col", "agg",
    "disk", "mem", "cpu", "net", "io", "log", "idx", "map",
]
VOCAB_SIZE = 10_000
LANGS = ["en", "de", "es", "fr", "zh"]
N_SOURCES = 20
DOCS_PER_UNIT = 5000
VECS_PER_UNIT = 2000
DIM = 64
N_LABELS = 10


def make_vocab() -> list[str]:
    out = list(BASE_WORDS)
    i = 0
    while len(out) < VOCAB_SIZE:
        out.append(f"{BASE_WORDS[i % len(BASE_WORDS)]}{i}")
        i += 1
    return out


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_fresh_x100"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    vocab = np.array(make_vocab())

    n_docs = k * DOCS_PER_UNIT
    # Zipf-ish: sample ranks from a power law, clip to vocab
    lengths = rng.integers(10, 101, size=n_docs)
    texts: list[str] = []
    ranks_pool = (rng.pareto(1.1, size=int(lengths.sum())) * 8).astype(np.int64)
    ranks_pool = np.minimum(ranks_pool, VOCAB_SIZE - 1)
    pos = 0
    for ln in lengths:
        texts.append(" ".join(vocab[ranks_pool[pos : pos + ln]]))
        pos += ln
    # sparse duplicate structure: 1% bases -> one near-dup + one exact dup
    n_bases = n_docs // 100
    bases = rng.choice(n_docs, size=3 * n_bases, replace=False)
    for b, near, exact in bases.reshape(-1, 3):
        toks = texts[b].split(" ")
        if len(toks) >= 3:
            for p in rng.choice(len(toks), size=2, replace=False):
                toks[p] = str(vocab[rng.integers(0, VOCAB_SIZE)])
        texts[near] = " ".join(toks)
        texts[exact] = texts[b]

    import pyarrow as pa
    import pyarrow.parquet as pq

    doc_tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([LANGS[i % len(LANGS)] for i in range(n_docs)]),
            "source": pa.array([f"src{i % N_SOURCES}" for i in range(n_docs)]),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int32()),
        }
    )
    pq.write_table(doc_tbl, os.path.join(dst, "documents.parquet"), row_group_size=20_000)

    n_vecs = k * VECS_PER_UNIT
    labels = rng.integers(0, N_LABELS, size=n_vecs)
    centroids = rng.standard_normal((N_LABELS, DIM)).astype(np.float32)
    vecs = centroids[labels] + 0.3 * rng.standard_normal((n_vecs, DIM)).astype(np.float32)
    # ~1% near-identical pairs (semantic near-dups)
    n_pairs = n_vecs // 200
    pair_idx = rng.choice(n_vecs, size=2 * n_pairs, replace=False).reshape(-1, 2)
    for a, b in pair_idx:
        vecs[b] = vecs[a] + 1e-3 * rng.standard_normal(DIM).astype(np.float32)
        labels[b] = labels[a]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb_tbl = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), type=pa.int64()),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    pq.write_table(emb_tbl, os.path.join(dst, "embeddings.parquet"), row_group_size=20_000)
    print(f"wrote fresh {k}x corpus to {dst}: {n_docs} docs, {n_vecs} vecs")


if __name__ == "__main__":
    main()
