"""Round-13 fences.

Part 1 — the three ADVICE r12 robustness fixes:

- ``link_forward_table`` becomes catalog-visible at ``saveAsTable``,
  BEFORE the base files link in; a mid-link failure used to strand a
  registered delta-only table that the idempotence fast path would then
  serve as version N+1. Fixed by eager drop on failure + an owner-marker
  check in the fast path (marker is written only after the links
  complete).
- ``snapshot_store.link_tree`` silently fell through FileExistsError to
  an overwriting copy2; the IVF fold (which merges base posting files
  into partition dirs already holding delta files) now links with
  ``exclusive=True`` and fails loudly on a collision.
- ``rolled_recall`` returned 1.0 over an EMPTY exact comparator, so a
  misconfigured/empty indexed population read as perfect recall and the
  retrain gate could never trip. Now fails closed (raises).

Part 2+ (chained folds / compaction) live further down.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F


def _loc(spark, tbl: str) -> str:
    wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    return os.path.join(wh, tbl)


def _drop(spark, *names: str) -> None:
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS `{n}`")
        shutil.rmtree(_loc(spark, n), ignore_errors=True)


# ------------------------------------------- link_forward_table atomicity
def test_mid_link_failure_leaves_no_servable_table(spark, monkeypatch):
    """A failure between saveAsTable and the base-file links must not
    leave a registered (delta-only) table behind — ADVICE r12 #1: the
    same-session retry used to hit the tableExists fast path and silently
    serve version N+1 without version N's rows."""
    from broadway_kinesis_spark.functions import versioned_fold as vf
    from broadway_kinesis_spark.functions.table_build import ensure_table

    base_n, fold_n = "r13_linkfail_base", "r13_linkfail_fold"
    _drop(spark, base_n, fold_n)
    base = ensure_table(
        spark, base_n, lambda: spark.range(5).select(F.col("id").alias("k"))
    )

    def boom(*a, **k):
        raise OSError("injected mid-link failure")

    monkeypatch.setattr(vf, "base_data_files", boom)
    with pytest.raises(OSError, match="injected"):
        vf.link_forward_table(
            spark,
            fold_n,
            base,
            lambda: spark.range(5, 8).select(F.col("id").alias("k")),
        )
    # the failed build is gone, not servable
    assert not spark.catalog.tableExists(fold_n)
    assert not os.path.isdir(_loc(spark, fold_n))

    # the same-session retry rebuilds COMPLETELY (base + delta)
    monkeypatch.undo()
    rolled = vf.link_forward_table(
        spark,
        fold_n,
        base,
        lambda: spark.range(5, 8).select(F.col("id").alias("k")),
    )
    assert sorted(r.k for r in spark.table(rolled).collect()) == list(range(8))
    _drop(spark, base_n, fold_n)


def test_markerless_registered_fold_is_rebuilt(spark):
    """The fast-path backstop: a registered fold whose location lacks the
    post-link owner marker (failed cleanup after a mid-link crash) must be
    rebuilt, never served."""
    from broadway_kinesis_spark.functions import versioned_fold as vf
    from broadway_kinesis_spark.functions.table_build import (
        _OWNER_MARKER,
        ensure_table,
    )

    base_n, fold_n = "r13_marker_base", "r13_marker_fold"
    _drop(spark, base_n, fold_n)
    base = ensure_table(
        spark, base_n, lambda: spark.range(4).select(F.col("id").alias("k"))
    )
    delta = lambda: spark.range(4, 6).select(F.col("id").alias("k"))  # noqa: E731
    rolled = vf.link_forward_table(spark, fold_n, base, delta)
    marker = os.path.join(_loc(spark, rolled), _OWNER_MARKER)
    assert os.path.isfile(marker), "marker must certify a completed fold"

    # simulate the stranded state: registered table, no marker
    os.remove(marker)
    rolled2 = vf.link_forward_table(spark, fold_n, base, delta)
    assert rolled2 == rolled
    assert os.path.isfile(marker), "rebuild must restore the marker"
    assert sorted(r.k for r in spark.table(rolled2).collect()) == list(range(6))
    _drop(spark, base_n, fold_n)


# ------------------------------------------------- link_tree exclusive mode
def test_link_tree_exclusive_refuses_collision(tmp_path):
    from broadway_kinesis_spark.streaming.snapshot_store import link_tree

    src, dst = tmp_path / "src", tmp_path / "dst"
    src.mkdir()
    dst.mkdir()
    (src / "part-0.parquet").write_text("base")
    (dst / "part-0.parquet").write_text("delta")  # fresh delta file, same name

    with pytest.raises(FileExistsError):
        link_tree(str(src), str(dst), exclusive=True)
    # the delta file survived untouched (no silent overwrite)
    assert (dst / "part-0.parquet").read_text() == "delta"

    # default mode keeps the historical overwrite-on-collision behavior
    link_tree(str(src), str(dst))
    assert (dst / "part-0.parquet").read_text() == "base"


# ------------------------------------------------ chained daily loop (K=5)
def _content_equal(a, b) -> None:
    # multiset equality via count + one-direction exceptAll (equal
    # cardinality + a ⊆ b as multisets ⇒ equal) — half the jobs of the
    # two-direction form; this fence runs 15 comparisons per chain
    assert a.count() == b.count()
    assert a.exceptAll(b).isEmpty()


def test_chained_daily_loop_with_compaction_equals_scratch_each_day(
    spark, sf_dir
):
    """The month-scale fence (VERDICT r12 #1/#7): FIVE chained days
    through ``roll_forward_corpus(prior=..., compact=True)`` with the
    fragmentation trigger forced to fire every day (``max_data_files=1``),
    covering one plain append family (digests), one bucketed link family
    (minhash bands), and one merge-on-read family (the ngram DF) — at
    every step the chain's content equals the from-scratch build at that
    day's boundary, and the compacted tables stay at one file set
    regardless of chain depth."""
    from broadway_kinesis_spark.functions.versioned_fold import (
        served_counts,
        table_data_file_count,
    )
    from broadway_kinesis_spark.operators.corpus_versioning import (
        roll_forward_corpus,
    )
    from broadway_kinesis_spark.operators.incremental_batch import (
        ensure_corpus_digests,
        ensure_ngram_index,
    )
    from broadway_kinesis_spark.operators.minhash_incremental import (
        ensure_minhash_bands,
    )

    fams = {"digests", "minhash_bands", "ngram_index"}
    days = [300, 340, 380, 420, 460, 500]
    prior = None
    for n, n1 in zip(days, days[1:]):
        rolled = roll_forward_corpus(
            spark,
            sf_dir,
            n,
            n1,
            families=fams,
            prior=prior,
            compact=True,
            max_data_files=1,
        )
        # digests: plain append
        _content_equal(
            spark.table(rolled["digests"][0]),
            spark.table(ensure_corpus_digests(spark, sf_dir, n1)),
        )
        # minhash bands: bucketed link family
        _content_equal(
            spark.table(rolled["minhash_bands"][0]),
            spark.table(ensure_minhash_bands(spark, sf_dir, n1)),
        )
        # ngram: bucketed idx + MoR df (SERVED content == scratch)
        idx_s, df_s = ensure_ngram_index(spark, sf_dir, n1)
        _content_equal(
            spark.table(rolled["ngram_index"][0]), spark.table(idx_s)
        )
        _content_equal(
            served_counts(spark, rolled["ngram_index"][1], "shingle", "df_old"),
            spark.table(df_s),
        )
        prior = rolled
    # depth-independent physical bound after 5 folds: the forced trigger
    # kept plain tables at scan-sized file counts and bucketed ones at
    # one file per bucket (8)
    assert table_data_file_count(spark, prior["digests"][0]) <= 2
    assert table_data_file_count(spark, prior["ngram_index"][1]) <= 2
    assert table_data_file_count(spark, prior["ngram_index"][0]) <= 8
    assert table_data_file_count(spark, prior["minhash_bands"][0]) <= 8
    # and the MoR statistic is one row per key again after compaction
    df_tbl = spark.table(prior["ngram_index"][1])
    assert (
        df_tbl.groupBy("shingle").count().filter(F.col("count") > 1).isEmpty()
    )


def test_uncompacted_chain_fragments_and_compaction_collapses(spark, sf_dir):
    """The failure mode the trigger exists for: without compaction a
    chained MoR table accumulates one file set AND up to one segment per
    key PER FOLD; one ``compact_table`` call collapses it back to
    from-scratch shape with identical served content."""
    from broadway_kinesis_spark.functions.versioned_fold import (
        compact_table,
        served_counts,
        table_data_file_count,
    )
    from broadway_kinesis_spark.operators.corpus_versioning import (
        roll_forward_corpus,
    )

    days = [300, 340, 380, 420]
    prior = None
    counts = []
    for n, n1 in zip(days, days[1:]):
        prior = roll_forward_corpus(
            spark, sf_dir, n, n1, families={"simhash_counts"}, prior=prior
        )
        counts.append(table_data_file_count(spark, prior["simhash_counts"][0]))
    assert counts == sorted(counts) and counts[-1] > counts[0], counts

    tbl = prior["simhash_counts"][0]
    served_before = served_counts(spark, tbl, "simhash", "n_old")
    seg = spark.table(tbl).groupBy("simhash").count()
    assert not seg.filter(F.col("count") > 1).isEmpty(), (
        "chained MoR table should hold >1 segment for delta-touched keys"
    )
    compacted = compact_table(spark, tbl, mor=("simhash", "n_old"))
    assert table_data_file_count(spark, compacted) < counts[-1]
    _content_equal(
        served_counts(spark, compacted, "simhash", "n_old"), served_before
    )
    assert (
        spark.table(compacted)
        .groupBy("simhash")
        .count()
        .filter(F.col("count") > 1)
        .isEmpty()
    )


def test_chained_ivf_fold_through_orchestrator_equals_single_fold(
    spark, sf_dir
):
    """The orchestrator's prior-chaining drives the IVF directory index
    too: two chained days == one fold of the union delta (probe-for-probe
    — the round-12 invariant, now through roll_forward_corpus)."""
    from broadway_kinesis_spark.operators.ann_incremental import (
        ensure_version_index,
        fold_ivf_index,
    )
    from broadway_kinesis_spark.operators.ann_persist import probe_ivf_index
    from broadway_kinesis_spark.operators.corpus_versioning import (
        roll_forward_corpus,
    )

    day1 = roll_forward_corpus(
        spark, sf_dir, 400, 450, families={"ivf_index"}
    )
    day2 = roll_forward_corpus(
        spark, sf_dir, 450, 500, families={"ivf_index"}, prior=day1
    )
    v_n = ensure_version_index(spark, sf_dir, 400)
    once = fold_ivf_index(spark, sf_dir, v_n, 400, None, tag="rf-v400-vNone")
    got = sorted(
        map(tuple, probe_ivf_index(spark, sf_dir, day2["ivf_index"][0]).collect())
    )
    want = sorted(map(tuple, probe_ivf_index(spark, sf_dir, once).collect()))
    assert got == want


# ----------------------------------------------- drift gate inside the loop
def test_drift_gate_retrains_inside_the_loop(spark, tmp_path):
    """VERDICT r12 #2 end-to-end: on the planted-drift corpus the daily
    loop itself (roll_forward_corpus with a recall floor) measures the
    rolled index, trips the retrain, swaps the RETRAINED index into the
    returned map, and vacuums the superseded fold — zero by-hand steps."""
    from tests.test_round12_ops import _drift_corpus

    from broadway_kinesis_spark.operators.corpus_versioning import (
        roll_forward_corpus,
    )

    td = str(tmp_path / "drift")
    os.makedirs(td)
    b = _drift_corpus(td, spark, drift=True)
    report: dict = {}
    rolled = roll_forward_corpus(
        spark,
        td,
        b,
        None,
        families={"ivf_index"},
        recall_floor=0.9,
        drift_report=report,
    )
    assert report["retrained"] is True
    assert report["recall"] < 0.9
    served = rolled["ivf_index"][0]
    assert served == report["index_dir"]
    # the superseded fold was vacuumed; the RETRAINED index serves
    from broadway_kinesis_spark.operators.ann_incremental import rolled_recall

    assert rolled_recall(spark, td, served, None) >= 0.9


def test_drift_gate_folds_on_healthy_day(spark, tmp_path):
    from tests.test_round12_ops import _drift_corpus

    from broadway_kinesis_spark.operators.corpus_versioning import (
        roll_forward_corpus,
    )

    td = str(tmp_path / "healthy")
    os.makedirs(td)
    b = _drift_corpus(td, spark, drift=False)
    report: dict = {}
    rolled = roll_forward_corpus(
        spark,
        td,
        b,
        None,
        families={"ivf_index"},
        recall_floor=0.9,
        drift_report=report,
    )
    assert report["retrained"] is False
    assert report["recall"] >= 0.9
    assert rolled["ivf_index"][0] == report["index_dir"]


def test_vacuum_ivf_paths_refuses_foreign_paths(tmp_path):
    from broadway_kinesis_spark.operators.ann_incremental import (
        vacuum_ivf_paths,
    )

    foreign = tmp_path / "not_an_index"
    foreign.mkdir()
    with pytest.raises(ValueError, match="refusing"):
        vacuum_ivf_paths((str(foreign),))
    assert foreign.is_dir()


# -------------------------------------------------- fuzzy middle blocking tier
def test_incremental_fuzzy_mid_tier_is_first4_restriction(spark, sf_dir):
    """The mid tier (round 13, VERDICT r12 #4) must equal the loose
    probe restricted to pairs whose normalized prefixes share their
    first 4 characters — the join-key derivation is a pure blocking
    refinement, never a different verify."""
    from broadway_kinesis_spark.operators.fuzzy_incremental import (
        incremental_fuzzy_pairs,
    )
    from broadway_kinesis_spark.session import load

    loose = incremental_fuzzy_pairs(spark, sf_dir)
    mid = incremental_fuzzy_pairs(spark, sf_dir, blocking="mid")
    f4 = load(spark, sf_dir, "documents").select(
        "doc_id", F.substring(F.lower("text"), 1, 4).alias("f4")
    )
    want = (
        loose.join(
            f4.select(F.col("doc_id").alias("d1"), F.col("f4").alias("f41")),
            "d1",
        )
        .join(
            f4.select(F.col("doc_id").alias("d2"), F.col("f4").alias("f42")),
            "d2",
        )
        .filter(F.col("f41") == F.col("f42"))
        .select("d1", "d2", "edit_dist")
    )
    got = sorted(map(tuple, mid.collect()))
    assert got == sorted(map(tuple, want.collect()))
    # and a strict subset relationship to the loose tier
    assert set(got) <= set(map(tuple, loose.collect()))


# --------------------------------------------------- rolled_recall fail-closed
def test_rolled_recall_fails_closed_on_empty_comparator(spark, sf_dir):
    """An indexed population that produces no exact-comparator queries is
    a misconfiguration, not perfect recall — the retrain gate must not
    fail open (ADVICE r12 #3)."""
    from broadway_kinesis_spark.operators.ann_incremental import (
        ensure_version_index,
        rolled_recall,
    )

    idx = ensure_version_index(spark, sf_dir, 400)
    with pytest.raises(ValueError, match="no queries"):
        rolled_recall(spark, sf_dir, idx, boundary=0)


# ----------------------------------------- retention over a compacted chain
def test_vacuum_over_compacted_chain_drops_superseded_and_serves(
    spark, sf_dir
):
    """The retention end-game of the daily loop: after K chained days
    with the fragmentation trigger firing, ``vacuum_superseded`` on the
    final rolled map must drop EVERY intermediate version the chain
    created — fold tables and superseded compactions alike (compacted
    names keep the family prefix, so the family-scoped vacuum sees them;
    the final compaction is pinned as the rolled artifact) — while the
    rolled tables keep serving content == from-scratch. Hard-linked fold
    writes make the drops pure unlinks, which is why serving survives."""
    from broadway_kinesis_spark.functions.versioned_fold import served_counts
    from broadway_kinesis_spark.operators.corpus_versioning import (
        roll_forward_corpus,
        vacuum_superseded,
    )
    from broadway_kinesis_spark.operators.incremental_batch import (
        ensure_corpus_digests,
        ensure_ngram_index,
    )
    from broadway_kinesis_spark.operators.minhash_incremental import (
        ensure_minhash_bands,
    )

    fams = {"digests", "minhash_bands", "ngram_index"}
    days = [300, 350, 400, 450, 500]
    prior = None
    seen: set[str] = set()
    for n, n1 in zip(days, days[1:]):
        prior = roll_forward_corpus(
            spark, sf_dir, n, n1,
            families=fams, prior=prior, compact=True, max_data_files=1,
        )
        seen |= {a for arts in prior.values() for a in arts}
    rolled_names = {a for arts in prior.values() for a in arts}
    superseded = seen - rolled_names
    assert superseded, "a 4-day chain must create intermediate versions"

    dropped = set(vacuum_superseded(spark, prior))
    assert superseded <= dropped, superseded - dropped
    assert not rolled_names & dropped
    for t in superseded:
        assert not spark.catalog.tableExists(t)

    # the rolled artifacts still serve from-scratch content after the
    # whole superseded chain (their link sources included) is gone
    _content_equal(
        spark.table(prior["digests"][0]),
        spark.table(ensure_corpus_digests(spark, sf_dir, days[-1])),
    )
    _content_equal(
        spark.table(prior["minhash_bands"][0]),
        spark.table(ensure_minhash_bands(spark, sf_dir, days[-1])),
    )
    idx_s, df_s = ensure_ngram_index(spark, sf_dir, days[-1])
    _content_equal(spark.table(prior["ngram_index"][0]), spark.table(idx_s))
    _content_equal(
        served_counts(spark, prior["ngram_index"][1], "shingle", "df_old"),
        spark.table(df_s),
    )


# ------------------------------------ every family's chained (src=) path
def test_all_families_chain_day2_equals_scratch(spark, sf_dir):
    """The chained-loop fence widened to EVERY warehouse family (the K=5
    chain fence covers the three artifact shapes; this one pins the
    ``src=`` plumbing of all the others — a family whose chained fold
    drifted from its from-scratch build would only ever surface in
    production, where ``roll_forward_corpus(prior=...)`` is the daily
    call). Two chained days over all table families at once; day 2's
    SERVED content must equal the from-scratch build at day 2's boundary
    (MoR families through ``served_counts``). The IVF directory family
    has its own chained fence (orchestrator == single fold, above)."""
    from broadway_kinesis_spark.functions.versioned_fold import served_counts
    from broadway_kinesis_spark.operators import (
        audiohash_incremental,
        containment_incremental,
        embedding_incremental,
        fingerprint_incremental,
        fuzzy_incremental,
        incremental_batch,
        minhash_incremental,
        semantic_incremental,
        simhash_incremental,
        split_incremental,
        substring_incremental,
        videohash_incremental,
    )
    from broadway_kinesis_spark.operators.corpus_versioning import (
        roll_forward_corpus,
    )

    fams = {
        "digests", "ngram_index", "minhash_bands", "simhash_counts",
        "bottomk_probes", "embedding_norms", "phash_bands", "audio_bands",
        "video_index", "fuzzy_prefixes", "span_counts",
        "semantic_assignments", "split_labels",
    }
    day1 = roll_forward_corpus(spark, sf_dir, 400, 450, families=fams)
    day2 = roll_forward_corpus(
        spark, sf_dir, 450, 500, families=fams, prior=day1
    )

    b = 500
    plain = {
        "digests": incremental_batch.ensure_corpus_digests(spark, sf_dir, b),
        "minhash_bands": minhash_incremental.ensure_minhash_bands(
            spark, sf_dir, b
        ),
        "bottomk_probes": containment_incremental.ensure_bottomk_probes(
            spark, sf_dir, b
        ),
        "embedding_norms": embedding_incremental.ensure_embedding_norms(
            spark, sf_dir, b
        ),
        "phash_bands": fingerprint_incremental.ensure_phash_bands(
            spark, sf_dir, b
        ),
        "audio_bands": audiohash_incremental.ensure_audio_bands(
            spark, sf_dir, b
        ),
        "fuzzy_prefixes": fuzzy_incremental.ensure_fuzzy_prefixes(
            spark, sf_dir, b
        ),
        "semantic_assignments": (
            semantic_incremental.ensure_semantic_assignments(spark, sf_dir, b)
        ),
        "split_labels": split_incremental.ensure_split_labels(spark, sf_dir, b),
    }
    for fam, scratch in plain.items():
        _content_equal(spark.table(day2[fam][0]), spark.table(scratch))

    # MoR families: the SERVED statistic equals the from-scratch one
    _content_equal(
        served_counts(spark, day2["simhash_counts"][0], "simhash", "n_old"),
        spark.table(simhash_incremental.ensure_simhash_counts(spark, sf_dir, b)),
    )
    _content_equal(
        served_counts(spark, day2["span_counts"][0], "span", "n_old"),
        spark.table(substring_incremental.ensure_span_counts(spark, sf_dir, b)),
    )
    idx_s, df_s = incremental_batch.ensure_ngram_index(spark, sf_dir, b)
    _content_equal(spark.table(day2["ngram_index"][0]), spark.table(idx_s))
    _content_equal(
        served_counts(spark, day2["ngram_index"][1], "shingle", "df_old"),
        spark.table(df_s),
    )
    vidx_s, vdf_s = videohash_incremental.ensure_video_index(spark, sf_dir, b)
    _content_equal(spark.table(day2["video_index"][0]), spark.table(vidx_s))
    _content_equal(
        served_counts(spark, day2["video_index"][1], "shingle", "df_old"),
        spark.table(vdf_s),
    )
