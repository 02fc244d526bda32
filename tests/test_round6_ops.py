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
def _words_of_text(text: str) -> list[int]:
    """Closed-form fingerprint from the PPM construction: ASCII bytes
    zero-padded to a whole pixel grid, then the multi-stride words."""
    import numpy as np

    from broadway_kinesis_spark.operators.imagehash import _ROW, phash_words

    body = text.encode("ascii")
    h = max(-(-len(body) // _ROW), 1)
    flat = np.frombuffer(body + b"\x00" * (h * _ROW - len(body)), dtype=np.uint8)
    return phash_words(flat)


def _shares_band(wa: list[int], wb: list[int], bands=None) -> bool:
    from broadway_kinesis_spark.operators.imagehash import BANDS

    return any(
        (wa[w] >> shift) & ((1 << width) - 1)
        == (wb[w] >> shift) & ((1 << width) - 1)
        for (w, shift, width) in (BANDS if bands is None else bands)
    )


def _ham(wa: list[int], wb: list[int]) -> int:
    return sum(bin(a ^ b).count("1") for a, b in zip(wa, wb))


def test_phash_identical_and_perturbed_locality():
    """Identical planes hash identically; a single-byte perturbation moves
    at most 2 bits per stride word (the locality property banding relies
    on); a very different plane moves many."""
    from broadway_kinesis_spark.operators.imagehash import HAM_T, N_WORDS

    base = "the quick brown fox jumps over the lazy dog " * 6
    tweak = base[:37] + "X" + base[38:]
    other = "zzzz AAAA 0000 !!!! " * 12
    h0, h1, h2 = _words_of_text(base), _words_of_text(tweak), _words_of_text(other)
    assert h0 == _words_of_text(base)
    # one byte falls in one block: <= 2 flipped comparisons per stride word
    assert 0 <= _ham(h0, h1) <= 2 * N_WORDS <= HAM_T
    assert _ham(h0, h2) > HAM_T


def test_image_phash_pairs_match_python_reference(spark):
    """On a crafted corpus the full banded pipeline must return EXACTLY the
    pairs a brute-force Python reference of the same fingerprint + band +
    verify rules produces."""
    from broadway_kinesis_spark.operators.imagehash import HAM_T

    texts = {
        0: "the quick brown fox jumps over the lazy dog " * 6,
        1: "the quick brown fox jumps over the lazy dog " * 6,  # exact dup
        2: ("the quick brown fox jumps over the lazy dog " * 6)[:50]
        + "Q"
        + ("the quick brown fox jumps over the lazy dog " * 6)[51:],  # near
        3: "zzzz AAAA 0000 !!!! " * 12,  # unrelated
    }
    expected = set()
    fps = {d: _words_of_text(t) for d, t in texts.items()}
    for d1 in texts:
        for d2 in texts:
            if d1 >= d2:
                continue
            p1, p2 = fps[d1], fps[d2]
            if _shares_band(p1, p2) and _ham(p1, p2) <= HAM_T:
                expected.add((d1, d2, _ham(p1, p2)))
    assert (0, 1, 0) in expected  # the construction really makes a dup pair
    assert (0, 2, _ham(fps[0], fps[2])) in expected  # ...and a NEAR pair
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


# ------------------------------------------------------------- BPE training
def _bpe_reference(texts: list[str], n_merges: int):
    """Pure-Python Sennrich-style BPE: freq-weighted adjacent pair counts
    over the vocab, deterministic (count DESC, pair ASC) pick, left-to-right
    non-overlapping merge."""
    import collections
    import re

    from broadway_kinesis_spark.operators.textops import _BPE_PAT

    vocab = collections.Counter()
    for t in texts:
        vocab.update(re.findall(_BPE_PAT, t.lower()))
    words = {w: list(w) for w in vocab}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = collections.Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += vocab[w]
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def test_bpe_train_matches_python_reference_on_crafted_corpus(spark):
    texts = [
        "banana bandana banana",
        "a banana and a bandana",
        "nan nan banana!",
    ]
    expected = _bpe_reference(texts, 8)
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        got = [
            (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
            for r in QUERIES["text_bpe_train"](spark, td)
            .orderBy("merge_rank")
            .collect()
        ]
    assert got == expected
    # merged symbols must actually grow: later merges may combine earlier
    # outputs (the whole point of BPE over pair counting)
    assert any(len(a) + len(b) > 2 for _, a, b, _ in got), got


def test_bpe_train_fixture_merges_are_plausible(spark, sf_dir):
    rows = QUERIES["text_bpe_train"](spark, sf_dir).orderBy("merge_rank").collect()
    assert len(rows) == 8
    assert [r.merge_rank for r in rows] == list(range(1, 9))
    # counts are non-increasing only per-round-optimality is NOT implied
    # (a merge can create a new dominant pair), but every count is positive
    # and every symbol non-empty
    for r in rows:
        assert r.pair_count > 0
        assert r.left_sym and r.right_sym


# ------------------------------------------------------- substring spans
def _span_mask_reference(texts: dict[int, str], k: int, min_docs: int):
    """Brute-force span flagging + token-position mask union."""
    toks = {d: t.lower().split(" ") for d, t in texts.items()}
    spans = {
        d: [" ".join(l[i : i + k]) for i in range(len(l) - k + 1)]
        for d, l in toks.items()
    }
    by_span: dict[str, set[int]] = {}
    for d, ss in spans.items():
        for s in ss:
            by_span.setdefault(s, set()).add(d)
    out = {}
    for d, l in toks.items():
        flagged = [i for i, s in enumerate(spans[d]) if len(by_span[s]) >= min_docs]
        masked = set()
        for i in flagged:
            masked.update(range(i, i + k))
        out[d] = (
            len(l),
            len(spans[d]),
            len(flagged),
            len(masked),
            len(masked) / len(l),
        )
    return out


def test_substring_spans_matches_python_reference(spark):
    from broadway_kinesis_spark.operators.substring_spans import K_SPAN, MIN_DOCS

    shared_run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = {
        0: "intro words here " + shared_run + " tail one two three",
        1: "completely different lead in text " + shared_run,
        2: "no overlap with anybody at all in this short document text",
        3: "tiny doc",  # shorter than K_SPAN -> zero spans
    }
    expected = _span_mask_reference(texts, K_SPAN, MIN_DOCS)
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            r.doc_id: (
                r.n_tokens,
                r.n_spans,
                r.n_shared_spans,
                r.n_masked_tokens,
                r.masked_frac,
            )
            for r in QUERIES["dedup_substring_spans"](spark, td).collect()
        }
    assert got == expected
    # the construction really exercises the interesting cases
    assert expected[0][3] > 0 and expected[2][3] == 0 and expected[3][1] == 0


def test_substring_spans_plan_no_python_no_cartesian(spark, sf_dir):
    from broadway_kinesis_spark.plans import formatted_plan

    plan = formatted_plan(QUERIES["dedup_substring_spans"](spark, sf_dir))
    for bad in ("BatchEvalPython", "MapInPandas", "ArrowEvalPython",
                "FlatMapGroupsInPandas", "CartesianProduct",
                "BroadcastNestedLoopJoin"):
        assert bad not in plan, (bad, plan)


def test_bpe_encode_matches_python_reference(spark):
    """Applying the learned merges must give the token counts a pure-Python
    encoder produces with the same rules."""
    import collections
    import re as _re

    from broadway_kinesis_spark.operators.textops import _BPE_PAT

    texts = [
        "banana bandana banana",
        "a banana and a bandana",
        "nan nan banana!",
    ]
    merges = _bpe_reference(texts, 8)

    def encode(word: str) -> int:
        syms = list(word)
        for _, a, b, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    expected = {}
    for d, t in enumerate(texts):
        words = _re.findall(_BPE_PAT, t.lower())
        expected[d] = (len(words), sum(encode(w) for w in words))

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            r.doc_id: (r.n_words, r.n_bpe_tokens)
            for r in QUERIES["text_bpe_encode"](spark, td).collect()
        }
    assert got == expected
    # merges actually compress: fewer BPE tokens than characters
    for d, t in enumerate(texts):
        n_alpha = sum(len(w) for w in _re.findall(_BPE_PAT, t.lower()))
        assert got[d][1] < n_alpha


# ------------------------------------------------------------ audio phash
def test_audio_fingerprint_pairs_match_python_reference(spark):
    """Banded pipeline == brute-force Python reference of the same
    envelope-fingerprint + band + verify rules — including a clip SHORTER
    than B_BLOCKS samples (sparse blocks: the oracle's stride-1 join has
    no rows there; the clip must keep a defined fingerprint — zero words
    where a stride finds no occupied pair — not be dropped)."""
    import numpy as np

    from broadway_kinesis_spark.operators.audiohash import (
        AUDIO_BANDS_PER_WORD,
        AUDIO_HAM_T,
        N_MEASURES,
    )
    from broadway_kinesis_spark.operators.imagehash import make_bands, phash_words

    base = "the quick brown fox jumps over the lazy dog " * 6
    texts = {
        0: base,
        1: base,  # exact dup
        2: base[:41] + "Z" + base[42:],  # near dup
        3: "zzzz AAAA 0000 !!!! " * 12,  # unrelated
        4: "tiny doc here now ok",  # 20 chars -> 10 samples < B_BLOCKS
        5: "tiny doc here now ok",  # its exact dup (fp 0... vs fp 0... pair)
    }

    def fp_of(text: str) -> list[int]:
        n2 = (len(text) // 2) * 2
        s = np.frombuffer(text.encode("ascii")[:n2], dtype="<i2").astype(np.int64)
        mag = np.abs(s)
        return (
            phash_words(mag)
            + phash_words(mag * mag)
            + phash_words(np.abs(np.diff(s)))
        )

    audio_bands = make_bands(N_MEASURES, AUDIO_BANDS_PER_WORD)
    fps = {d: fp_of(t) for d, t in texts.items() if len(t) >= 2}
    expected = set()
    for d1 in fps:
        for d2 in fps:
            if d1 >= d2:
                continue
            p1, p2 = fps[d1], fps[d2]
            if _shares_band(p1, p2, audio_bands) and _ham(p1, p2) <= AUDIO_HAM_T:
                expected.add((d1, d2, _ham(p1, p2)))
    assert (0, 1, 0) in expected and (4, 5, 0) in expected
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            (r.m1, r.m2, r.hamming)
            for r in QUERIES["dedup_audio_fingerprint"](spark, td).collect()
        }
    assert got == expected


# ----------------------------------------------------------- heavy hitters
def test_heavy_hitters_gate_is_lossless_and_actually_prunes(spark):
    """On a skewed crafted corpus: result == exact Python counts (the gate
    drops nothing), and the candidate set is much smaller than the
    vocabulary (the gate actually gates)."""
    import collections

    from broadway_kinesis_spark.operators.heavyhitters import (
        N_SHARDS,
        THETA_DEN,
        THETA_NUM,
    )

    # 2 genuinely heavy tokens + a long tail of singletons. Corpus must be
    # big enough that the per-shard bound theta*N/S exceeds 1, otherwise
    # the gate is vacuous (every token qualifies): N > S*DEN/NUM = 3200.
    texts = []
    for i in range(400):
        row = ["hot", "warm"] if i % 2 == 0 else ["hot"]
        row += [f"rare{i}_{j}" for j in range(10)]
        texts.append(" ".join(row))
    counts = collections.Counter()
    for t in texts:
        counts.update(t.split(" "))
    total = sum(counts.values())
    expected = {
        t: c for t, c in counts.items() if c * THETA_DEN >= total * THETA_NUM
    }
    assert 0 < len(expected) < 5  # only the heavy ones

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        rows = QUERIES["agg_heavy_hitters"](spark, td).collect()
        got = {r.token: r.cnt for r in rows}
        assert got == expected
        assert all(r.total_tokens == total for r in rows)

        # gate effectiveness: candidate tokens (any shard >= theta*N/S)
        # are far fewer than the vocabulary on this tail-heavy corpus
        from pyspark.sql import functions as F

        from broadway_kinesis_spark.session import load

        tok = load(spark, td, "documents").select(
            F.pmod(F.col("doc_id"), F.lit(N_SHARDS)).cast("int").alias("shard"),
            F.explode(F.split(F.lower("text"), " ")).alias("token"),
        )
        l1 = tok.groupBy("shard", "token").count()
        n_cand = (
            l1.filter(
                F.col("count") * (THETA_DEN * N_SHARDS) >= total * THETA_NUM
            )
            .select("token")
            .distinct()
            .count()
        )
        assert n_cand < len(counts) / 10, (n_cand, len(counts))


# ------------------------------------------------------------- bigram LM
def test_bigram_lm_separates_word_order_unigram_cannot(spark):
    """A scrambled document with the SAME token multiset as the natural
    ones must score strictly lower under the bigram model — the
    ordering-awareness the unigram filter lacks by construction."""
    natural = "the cat sat on the mat and the dog sat on the rug"
    words = natural.split(" ")
    scrambled = " ".join(words[::2] + words[1::2])  # deterministic shuffle
    texts = [(i, natural) for i in range(9)] + [(9, scrambled)]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        rows = {
            r.doc_id: r.avg_logprob
            for r in QUERIES["text_bigram_logprob"](spark, td).collect()
        }
    assert rows[9] < rows[0], rows
    assert all(rows[i] == rows[0] for i in range(9))


# ---------------------------------------------------------- triangle count
def test_triangle_count_matches_brute_force(spark):
    """Degree-oriented wedge closure == brute-force triangle enumeration on
    a crafted catalog, including a hub part that must be excluded."""
    import itertools

    from broadway_kinesis_spark.operators.triangles import HUB_CAP

    # parts induce: triangle {1,2,3}, triangle {4,5,6}, and edges {3,4} +
    # {1,4} which close a THIRD triangle {1,3,4}; hub part p99 is shipped
    # by everyone and must not create edges
    sp = [
        (1, 101), (2, 101), (3, 101),       # p101 -> clique {1,2,3}
        (3, 102), (4, 102),                 # p102 -> edge {3,4}
        (4, 103), (5, 103), (6, 103),       # p103 -> clique {4,5,6}
        (1, 104), (4, 104),                 # p104 -> edge {1,4}
    ] + [(s, 99) for s in range(1, HUB_CAP + 3)]  # hub part, > cap suppliers
    rows = [(i, s, p) for i, (s, p) in enumerate(sp)]
    df = spark.createDataFrame(rows, ["l_orderkey", "l_suppkey", "l_partkey"])

    # brute force on the CAPPED projection
    from collections import defaultdict

    by_part = defaultdict(set)
    for s, p in sp:
        by_part[p].add(s)
    edges = set()
    for p, ss in by_part.items():
        if len(ss) > HUB_CAP:
            continue
        for u, v in itertools.combinations(sorted(ss), 2):
            edges.add((u, v))
    nodes = {n for e in edges for n in e}
    tri = sum(
        1
        for a, b, c in itertools.combinations(sorted(nodes), 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "lineitem.parquet"))
        r = QUERIES["graph_triangle_count"](spark, td).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (
        len(nodes),
        len(edges),
        wedges,
        tri,
    )
    assert tri == 3  # {1,2,3}, {4,5,6}, and {1,3,4} through the edge parts


# ------------------------------------------------------------- containment
def test_containment_flags_excerpt_symmetric_jaccard_misses(spark):
    """An excerpt quoted inside a much larger page: containment ~1 for
    (excerpt -> page) while symmetric Jaccard is far below the near-dup
    threshold — the directional pair must appear, the reverse must not,
    and the unrelated doc must stay clean."""
    import itertools

    from broadway_kinesis_spark.operators.containment import C_T
    from broadway_kinesis_spark.operators.dedup import JACCARD_T

    words = [f"w{i}" for i in range(300)]
    page = " ".join(words)  # 300-word page
    excerpt = " ".join(words[100:140])  # 40-word exact excerpt
    other = " ".join(f"z{i}" for i in range(80))
    texts = {0: page, 1: excerpt, 2: other}

    def shingles(t):
        ws = t.split(" ")
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    s0, s1 = shingles(page), shingles(excerpt)
    inter = len(s0 & s1)
    jac = inter / (len(s0) + len(s1) - inter)
    cont = inter / len(s1)
    assert cont >= C_T and jac < JACCARD_T  # the construction is the gap case

    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            (r.contained_id, r.container_id): r.containment
            for r in QUERIES["dedup_containment"](spark, td).collect()
        }
    assert (1, 0) in got and abs(got[(1, 0)] - cont) < 1e-12
    assert (0, 1) not in got  # the page is NOT contained in its excerpt
    assert all(2 not in pair for pair in got)


# -------------------------------------------------------------- scene cut
def test_scene_cut_detects_crafted_shot_boundary(spark):
    """A payload of two homogeneous 'shots' (constant low bytes, then
    constant high bytes) must cut exactly at the boundary frame and
    nowhere else; a uniform clip must cut nowhere."""
    from broadway_kinesis_spark.operators.multimodal import FRAME_BYTES

    shot_a = "a" * (FRAME_BYTES * 3)
    shot_b = "z" * (FRAME_BYTES * 3)
    texts = {0: shot_a + shot_b, 1: "m" * (FRAME_BYTES * 4), 2: "x"}
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            r.media_id: r for r in QUERIES["multimodal_scene_cut"](spark, td).collect()
        }
    r0 = got[0]
    assert r0.n_frames == 6 and r0.n_deltas == 5
    # only the a->z boundary delta (frame index 3) is non-zero -> one cut
    assert r0.n_cuts == 1 and r0.first_cut == 3
    assert r0.total_delta == FRAME_BYTES * (ord("z") - ord("a"))
    r1 = got[1]
    assert r1.n_cuts == 0 and r1.first_cut is None and r1.total_delta == 0
    r2 = got[2]  # single frame: no deltas at all
    assert r2.n_frames == 1 and r2.n_deltas == 0 and r2.first_cut is None


def test_containment_bottomk_equals_exhaustive_on_crafted_corpus(spark):
    """The bottom-K probe tier must recover every pair the exhaustive
    operator finds on the excerpt construction (a full-probe miss needs
    ALL K bottom shingles of the contained doc absent from the container
    — impossible for a true excerpt, whose shingles are a subset)."""
    words = [f"w{i}" for i in range(300)]
    texts = {
        0: " ".join(words),
        1: " ".join(words[100:140]),
        2: " ".join(words[40:90]),  # a second excerpt
        3: " ".join(f"z{i}" for i in range(80)),
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        full = {
            (r.contained_id, r.container_id, round(r.containment, 9))
            for r in QUERIES["dedup_containment"](spark, td).collect()
        }
        bk = {
            (r.contained_id, r.container_id, round(r.containment, 9))
            for r in QUERIES["dedup_containment_bottomk"](spark, td).collect()
        }
    assert bk == full
    assert {(1, 0), (2, 0)} <= {(a, b) for a, b, _ in full}
