"""Round-8 fences: driver-side BPE merge loop, split semantic-threshold
parameterization, the banding-sweep operating-point invariant, and the
persisted-edge policy token.

Oracle parity lives in the driver harness; this file pins what the
oracle can't isolate — bitwise equality of the incremental merge loop
against the naive recount on adversarial corpora, the
structure-vs-membership property the split's semantic threshold was
re-measured FOR, and the s-curve invariant that stops a future banding
re-default from reintroducing an above-threshold miss regime.
"""

from __future__ import annotations

import os
import random
import tempfile

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


# ------------------------------------------------ BPE incremental trainer
def _naive_merge_loop(words, n_merges):
    """The obvious full-recount trainer (the spec): count every adjacent
    pair each round, pick (count DESC, pair ASC), re-fold every word."""
    words = [(list(syms), freq) for syms, freq in words]
    merges = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for syms, freq in words:
            for i in range(len(syms) - 1):
                pr = (syms[i], syms[i + 1])
                counts[pr] = counts.get(pr, 0) + freq
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, cnt))
        nxt = []
        for syms, freq in words:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((out, freq))
        words = nxt
    return merges


def test_incremental_merge_loop_matches_naive_recount():
    """The driver-side trainer's incremental bookkeeping (pair->count,
    pair->words diffs) must be bitwise-equal to the naive full recount —
    including on adversarial shapes: self-pairs ('aa' in 'aaaa'),
    overlapping runs, ties broken lexicographically, rounds running dry."""
    from broadway_kinesis_spark.operators.bpe_train import _merge_loop

    fixed = [
        [("banana", 3), ("bandana", 2), ("nan", 5)],
        [("aaaa", 2), ("aaa", 3), ("aa", 7)],       # overlap runs
        [("ab", 1), ("ba", 1), ("ab", 0)],          # ties + zero freq
        [("x", 9)],                                 # no pairs at all
    ]
    rng = random.Random(8)
    rand = [
        [
            (
                "".join(rng.choice("abc") for _ in range(rng.randint(1, 8))),
                rng.randint(1, 5),
            )
            for _ in range(rng.randint(1, 30))
        ]
        for _ in range(25)
    ]
    for corpus in fixed + rand:
        words = [(list(w), f) for w, f in corpus]
        want = _naive_merge_loop([(list(w), f) for w, f in corpus], 50)
        got = _merge_loop(words, 50)
        assert got == want, corpus


# --------------------------------- split semantic-threshold parameterization
def test_split_semantic_threshold_separates_structure_from_membership(spark):
    """The round-8 measurement as a fence: on a clustered corpus whose
    within-cluster background cosine is high (~0.9), the fixture-tuned
    SEM_T reports cluster MEMBERSHIP (pairs ~ quadratic in cluster size)
    while the split's SPLIT_SEM_T reports exactly the planted
    near-identical structure."""
    import math

    from broadway_kinesis_spark.operators.semantic import (
        SEM_T,
        semantic_dup_pairs,
    )
    from broadway_kinesis_spark.operators.splits import SPLIT_SEM_T

    rng = random.Random(42)
    dim, per_cluster = 16, 12
    rows = []
    vid = 0
    planted = []
    for c in range(3):
        centroid = [0.0] * dim
        centroid[c * 5] = 3.0
        centroid[c * 5 + 1] = 3.0  # |centroid| ~ 4.24 vs |noise| ~ 1
        members = []
        for _ in range(per_cluster):
            v = [
                centroid[j] + rng.gauss(0, 0.25 * math.sqrt(dim) / dim * 4)
                for j in range(dim)
            ]
            nrm = math.sqrt(sum(x * x for x in v))
            members.append([x / nrm for x in v])
        # plant ONE near-identical pair per cluster: copy member 0
        planted.append((vid, vid + 1))
        rows.append((vid, members[0], c))
        rows.append((vid + 1, [x for x in members[0]], c))
        vid += 2
        for m in members[1:]:
            rows.append((vid, m, c))
            vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    df = df.withColumn("embedding", df["embedding"].cast("array<float>"))
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "embeddings.parquet"))
        member_pairs = {
            (r.d1, r.d2)
            for r in semantic_dup_pairs(spark, td, threshold=SEM_T).collect()
        }
        structure = {
            (r.d1, r.d2)
            for r in semantic_dup_pairs(
                spark, td, threshold=SPLIT_SEM_T
            ).collect()
        }
    assert structure == set(planted)  # exactly the planted dups
    assert len(member_pairs) > 5 * len(structure)  # membership blowup


# ------------------------------------------ fuzzy tight-blocking tier
def test_fuzzy_tight_tier_subset_and_first_token_loss(spark):
    """The tight tier must be a strict SUBSET of the exhaustive channel
    (same verify, stricter blocking), must keep pairs whose edits avoid
    the first prefix token, and must lose exactly the pairs whose edit
    touches it — the recall the report exists to price."""
    from broadway_kinesis_spark.operators.dedup import fuzzy_prefix_pairs

    base = "alpha belt cedar delta echo fox golf hotel india juliet kilo"
    texts = {
        0: base,
        1: "alphq" + base[5:],   # edit INSIDE the first token
        2: base[:12] + "q" + base[13:],  # edit in a later token
        3: "completely different words that never match anything here xx",
    }
    df = spark.createDataFrame(
        [(d, t, "en", "s", len(t)) for d, t in texts.items()],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        ex = {
            (r.d1, r.d2)
            for r in fuzzy_prefix_pairs(spark, td).collect()
        }
        tight = {
            (r.d1, r.d2)
            for r in fuzzy_prefix_pairs(spark, td, tight=True).collect()
        }
        rep = QUERIES["composite_fuzzy_blocking_recall"](spark, td).collect()[0]
    assert tight <= ex
    assert (0, 2) in tight          # later-token edit survives
    assert (0, 1) in ex - tight     # first-token edit is the priced loss
    assert rep.n_exhaustive == len(ex) and rep.n_tight == len(tight)
    assert rep.tight_recall_micro == len(tight) * 1_000_000 // len(ex)


# --------------------------------------------- keep-best representatives
def test_keep_best_picks_quality_not_min_id(spark):
    """Cluster-representative selection must keep the HIGHEST-QUALITY
    member, not the lowest id: a planted fuzzy cluster whose low-id
    member is stopword-stuffed (low quality) and whose high-id member is
    clean must keep the HIGH id — provably different from keep-first —
    and singletons must each keep themselves."""
    import hashlib

    shared = " ".join(
        hashlib.md5(f"kb-{i}".encode()).hexdigest()[:10] for i in range(4)
    )  # 43 chars: the identical 40-char prefix that pairs the cluster
    low_q = shared + " " + " ".join(["the", "a", "of", "to", "in"] * 4)
    high_q = shared + " " + " ".join(
        hashlib.md5(f"kbt-{i}".encode()).hexdigest()[:10] for i in range(4)
    )
    high_q += " " + "x" * (len(low_q) - len(high_q) - 1)  # equalize lengths
    # same fuzzy size bucket, or the channel never pairs them
    assert len(low_q) // 50 == len(high_q) // 50, (len(low_q), len(high_q))
    texts = {
        3: low_q,      # LOW id, LOW quality (stopword-stuffed)
        9: high_q,     # HIGH id, HIGH quality
        5: " ".join(
            hashlib.md5(f"solo-{i}".encode()).hexdigest()[:10] for i in range(12)
        ),
    }
    df = spark.createDataFrame(
        [(d, t, "en", "s", len(t)) for d, t in texts.items()],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        rows = {r.doc_id: r for r in QUERIES["dedup_keep_best"](spark, td).collect()}
    assert set(rows) == {3, 9}  # the singleton has no edge: not clustered
    assert rows[3].component_id == rows[9].component_id == 3
    assert rows[9].quality > rows[3].quality
    assert rows[9].keep and not rows[3].keep  # keep-first would keep 3


# ------------------------------------------------- banding-sweep invariant
def test_minhash_scurve_sits_at_or_below_verify_threshold():
    """The sweep's lesson as an invariant: the banded-LSH s-curve
    threshold (1/bands)^(1/r) must not exceed the Jaccard verify
    threshold, or borderline TRUE pairs miss every band by construction
    (the round-7 default's 0.63 > 0.5 failure, fence recall 0.45)."""
    from broadway_kinesis_spark.operators.dedup import (
        BAND_R,
        JACCARD_T,
        N_BANDS,
        N_SIG,
    )

    assert N_SIG == N_BANDS * BAND_R
    assert (1.0 / N_BANDS) ** (1.0 / BAND_R) <= JACCARD_T


# --------------------------------------------- persisted-edge policy token
def test_split_edge_table_name_tracks_policy(monkeypatch):
    """ADVICE r7: a channel-threshold change must key a NEW persisted
    edge table for an UNCHANGED corpus — the name embeds a policy hash,
    not just the corpus signature."""
    import hashlib

    from broadway_kinesis_spark.operators import splits

    pol = hashlib.md5(splits._EDGE_POLICY.encode()).hexdigest()[:8]
    assert pol in f"_bks_split_edges_{pol}_x"
    changed = splits._EDGE_POLICY.replace("c0.8", "c0.7")
    assert changed != splits._EDGE_POLICY
    assert (
        hashlib.md5(changed.encode()).hexdigest()[:8] != pol
    )  # new policy -> new table name
    # and every live channel threshold is actually IN the token
    from broadway_kinesis_spark.operators.containment import C_T
    from broadway_kinesis_spark.operators.dedup import EDIT_T, JACCARD_T
    from broadway_kinesis_spark.operators.splits import SPLIT_SEM_T

    for v in (JACCARD_T, EDIT_T, C_T, SPLIT_SEM_T):
        assert str(v) in splits._EDGE_POLICY
