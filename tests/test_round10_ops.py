"""Round-10 fences: persisted heavy-channel pair tables, the batch
incremental corpus-version dedup tiers, and the combined-corpus DF-cap
semantics the incremental near-dup path must preserve.

Oracle parity lives in the driver harness; this file pins what the
oracle can't isolate — layout invariance of the persisted tiers against
their inline twins (engine-side, any corpus), delta-equivalence of the
incremental near-dup operator (pairs touching the delta == full
recompute filtered), and the one semantic trap in incrementalizing an
inverted index: the stop-shingle cap must apply to the COMBINED
document frequency, not per-version frequencies.
"""

from __future__ import annotations

import os
import tempfile

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()

BOUNDARY = 400


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _write_docs(td: str, texts: dict[int, str]):
    import __spark_entry__  # noqa: F401  (sys.path side effect)

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame(
        [(d, t, "en", "s", len(t)) for d, t in sorted(texts.items())],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    df.write.parquet(os.path.join(td, "documents.parquet"))


# ------------------------------------ persisted pair tables (VERDICT r9 #2)
def test_persisted_ngram_pairs_serve_the_inline_channel(spark, sf_dir):
    """The persisted tier must (a) build once (idempotent name), (b) key
    the table by corpus + policy, and (c) serve EXACTLY the inline
    channel's pairs — the layout-invariance property its shared oracle
    asserts cross-engine, here pinned engine-side."""
    from broadway_kinesis_spark.operators.dedup import dedup_ngram_jaccard
    from broadway_kinesis_spark.operators.dedup_persist import ensure_ngram_pairs

    name = ensure_ngram_pairs(spark, sf_dir)
    assert spark.catalog.tableExists(name)
    assert ensure_ngram_pairs(spark, sf_dir) == name  # idempotent
    served = _rows(QUERIES["dedup_ngram_jaccard_persisted"](spark, sf_dir))
    inline = _rows(dedup_ngram_jaccard(spark, sf_dir))
    assert served == inline and served


def test_persisted_bottomk_pairs_serve_the_inline_tier(spark, sf_dir):
    from broadway_kinesis_spark.operators.containment_bottomk import (
        dedup_containment_bottomk,
    )
    from broadway_kinesis_spark.operators.dedup_persist import ensure_bottomk_pairs

    name = ensure_bottomk_pairs(spark, sf_dir)
    assert spark.catalog.tableExists(name)
    assert ensure_bottomk_pairs(spark, sf_dir) == name
    served = _rows(QUERIES["dedup_containment_bottomk_persisted"](spark, sf_dir))
    inline = _rows(dedup_containment_bottomk(spark, sf_dir))
    assert served == inline and served


def test_persisted_pair_tables_key_apart_by_channel_policy(spark, sf_dir):
    """The ngram and bottom-K tables must never collide, and the policy
    token must key the name (a changed threshold ⇒ a new table for the
    same corpus — the splits._EDGE_POLICY discipline)."""
    from broadway_kinesis_spark.operators import dedup_persist as dp

    ngram = dp.ensure_ngram_pairs(spark, sf_dir)
    bk = dp.ensure_bottomk_pairs(spark, sf_dir)
    assert ngram != bk
    renamed = dp._pair_table(
        spark,
        sf_dir,
        kind="ngram",
        policy=dp._NGRAM_POLICY + ":probe",
        build=lambda: spark.range(1),
    )
    assert renamed != ngram
    spark.sql(f"DROP TABLE IF EXISTS {renamed}")


# --------------------------- incremental corpus-version dedup (VERDICT r9 #4)
def test_incremental_persisted_equals_from_scratch(spark, sf_dir):
    """The persisted-digest tier must emit exactly what the from-scratch
    inline query emits (same boundary, same keep-first)."""
    got = _rows(QUERIES["dedup_incremental_persisted"](spark, sf_dir))
    want = _rows(QUERIES["dedup_incremental"](spark, sf_dir))
    assert got == want and got


def test_incremental_ngram_equals_full_recompute_filtered(spark, sf_dir):
    """Delta-equivalence on the fixture corpus: the incremental near-dup
    operator (persisted version-N index + delta probe) must equal the
    FULL ngram channel restricted to pairs touching the delta
    (d2 >= boundary — version-N ids all precede delta ids)."""
    from broadway_kinesis_spark.operators.dedup import dedup_ngram_jaccard

    got = _rows(QUERIES["dedup_incremental_ngram"](spark, sf_dir))
    full = _rows(dedup_ngram_jaccard(spark, sf_dir))
    want = [p for p in full if p[1] >= BOUNDARY]
    assert got == want


# ------------------------- randomized pure-python mirror (round discipline)
def _py_incremental_ngram(texts, boundary=BOUNDARY, cap=100, t=0.5):
    """Pure-python mirror of the incremental near-dup semantics: full
    corpus inverted index with the DF cap on COMBINED frequency, pairs
    filtered to d2 >= boundary, exact Jaccard >= t (int/int division —
    IEEE-exact in both python and Spark)."""
    sh = {}
    for d, txt in texts.items():
        w = txt.lower().split(" ")
        if len(w) < 3:
            continue
        sh[d] = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
    inv: dict[str, list[int]] = {}
    for d, grams in sh.items():
        for g in grams:
            inv.setdefault(g, []).append(d)
    cand = set()
    for g, docs in inv.items():
        if len(docs) > cap:
            continue  # stop-shingle: combined df exceeds the cap
        docs = sorted(docs)
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                cand.add((docs[i], docs[j]))
    out = []
    for d1, d2 in cand:
        if d2 < boundary:
            continue
        inter = len(sh[d1] & sh[d2])
        uni = len(sh[d1]) + len(sh[d2]) - inter
        jac = inter / uni
        if jac >= t:
            out.append((d1, d2, jac))
    return sorted(out)


def test_incremental_ngram_matches_python_mirror_on_random_corpora(spark):
    """Seeded random corpora straddling the version boundary, with planted
    old-new and new-new near-dup pairs plus unrelated noise docs: the
    operator must match the pure-python mirror exactly (ids, pair set,
    bitwise jaccard)."""
    import hashlib
    import random

    rng = random.Random(1013)

    def words(tag, n):
        return " ".join(
            hashlib.md5(f"{tag}-{i}".encode()).hexdigest()[:8] for i in range(n)
        )

    for trial in range(3):
        texts: dict[int, str] = {}
        old_ids = rng.sample(range(300, BOUNDARY), 12)
        new_ids = rng.sample(range(BOUNDARY, 500), 12)
        for k, d in enumerate(old_ids):
            texts[d] = words(f"t{trial}-old{k}", rng.randint(8, 20))
        for k, d in enumerate(new_ids):
            texts[d] = words(f"t{trial}-new{k}", rng.randint(8, 20))
        # plant: an old-new near-dup (copy + small tail mutation) ...
        src_old, dst_new = old_ids[0], new_ids[0]
        texts[dst_new] = texts[src_old] + " " + words(f"t{trial}-mut", 2)
        # ... a new-new near-dup ...
        texts[new_ids[1]] = texts[new_ids[2]] + " " + words(f"t{trial}-m2", 1)
        # ... and an old-old pair the delta view must NOT emit
        texts[old_ids[1]] = texts[old_ids[2]]
        want = _py_incremental_ngram(texts)
        assert want, "mirror found no planted pairs — bad corpus"
        assert all(d2 >= BOUNDARY for _, d2, _ in want)
        with tempfile.TemporaryDirectory() as td:
            _write_docs(td, texts)
            got = _rows(QUERIES["dedup_incremental_ngram"](spark, td))
        assert got == want


def test_incremental_df_cap_applies_to_combined_corpus(spark):
    """THE incrementalization trap: a shingle under the cap in version N
    alone AND under it in the delta alone, but over it combined, must be
    a stop-shingle. 60 old + 42 new identical docs (all shingles df=102
    > cap) ⇒ ZERO pairs from them despite being exact duplicates; a
    planted unique near-dup pair across the boundary still surfaces. An
    implementation capping per-version frequencies would emit thousands
    of rows here."""
    import hashlib

    same = " ".join(
        hashlib.md5(f"hot-{i}".encode()).hexdigest()[:8] for i in range(6)
    )
    texts = {i: same for i in range(330, 390)}  # 60 old identical
    texts.update({i: same for i in range(410, 452)})  # 42 new identical
    uniq = " ".join(
        hashlib.md5(f"pair-{i}".encode()).hexdigest()[:8] for i in range(15)
    )
    texts[395] = uniq
    texts[460] = uniq + " " + hashlib.md5(b"tail").hexdigest()[:8]
    want = _py_incremental_ngram(texts)
    assert [(d1, d2) for d1, d2, _ in want] == [(395, 460)]
    with tempfile.TemporaryDirectory() as td:
        _write_docs(td, texts)
        got = _rows(QUERIES["dedup_incremental_ngram"](spark, td))
    assert got == want
