#!/usr/bin/env python
"""Round-13 scale measurements (VERDICT r12 #1 #4 #7 done-criteria).

Usage: python tools/measure_fold_chain.py [corpus] [sections]
       corpus   default /tmp/sf_fresh_x10 (tools/make_fresh_corpus.py)
       sections comma list of {chain,fuzzy,endurance}; default chain,fuzzy

Section ``chain`` — per-fold cost flat across a K=5 chained-day loop:
version N at 90% of the corpus, five 2% deltas folded day-over-day
through ``roll_forward_corpus(prior=...)`` over the three representative
artifact shapes (digests: plain append; minhash bands: bucketed link;
ngram idx+DF: bucketed + merge-on-read). Two variants: compaction OFF
(file counts grow monotonically — the failure mode) and ON with a forced
5-day cadence (``max_data_files=16``; the production default 64 fires
~monthly at one file set per fold — a 5-day window cannot exercise it).
After the chain: a day-5 ngram probe against the chained tables vs
against from-scratch builds at the same boundary (serving-cost parity).

Section ``endurance`` — the month-scale complement of ``chain``: K=30
chained 1% daily deltas over the last 30% of the corpus with compaction
at the PRODUCTION trigger (``DEFAULT_MAX_DATA_FILES=64``, which the
5-day window structurally cannot fire). Per-day fold wall + file counts
(the sawtooth IS the evidence: growth to the trigger, collapse at the
rewrite, depth-independent ceiling), an ngram probe at days 10/20/30
against the chained tables, and a day-30 probe-parity row against a
from-scratch build at the same boundary. The summary row compares the
mean fold wall of days 1-5 vs days 26-30 — flat means the chain's
per-day cost does not depend on its depth, the month-scale claim
VERDICT r12 weak #1 asked for.

Section ``gatecost`` — the in-loop drift gate priced per day (round 13
follow-through on VERDICT r12 #2: the gate now runs inside
``roll_forward_corpus``; this prices what it ADDS). Three IVF-only day
shapes at the 90/10 geometry: (a) fold without the gate, (b) fold with
``recall_floor`` on a healthy day (the delta over (a) is the daily cost
of MEASURING — ``rolled_recall``'s exact comparator over N_QUERIES),
(c) a forced-retrain day (floor > 1 trips ``should_retrain``
unconditionally: fold + measure + full-corpus retrain + vacuum — the
worst day the loop can have). Fresh boundaries per shape so no fold is
an idempotent cache hit.

Section ``fullday`` — ONE production day, whole loop, priced: every
family at once through ``roll_forward_corpus`` — day 1 from the
version-N bases, day 2 CHAINED onto day 1 with ``compact=True`` and the
drift gate on (``recall_floor=0.5``, healthy). Emits the one number the
daily-loop story needs: what a complete day costs at this corpus scale,
all channels, fold+compact+gate included (base builds timed separately
— they are the one-time cost the loop exists to avoid). Run this
section in its OWN invocation with dual spill dirs (the split/semantic
bases are the heavy builds — see the round-12 session-hygiene notes).

Section ``fuzzy`` — the middle blocking tier priced (recall + wall) at
the 90/10 incremental geometry: probe walls for tight and mid (loose
re-run only at x10 — the x100 loose row is r12's 928.5 s, quoted not
re-paid), and the recall of each tier against the exhaustive
(lang,size-bucket) channel, computed as flags on ONE exhaustive pair set
(the composite_fuzzy_blocking_recall set algebra, extended with the
mid-tier flag).

Every row stamps os.getloadavg(); within-run ratios are the currency
(BASELINE.md measurement discipline).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(out) -> None:
    print(json.dumps(out), flush=True)


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_fresh_x10"
    sections = (sys.argv[2] if len(sys.argv) > 2 else "chain,fuzzy").split(",")
    # the endurance chain shares fold-table names with nothing: its
    # boundaries step by n/100 from 70%, the chain section's by n/50 from
    # 90% — only run both in one invocation if that stays true

    from pyspark.sql import functions as F

    from broadway_kinesis_spark.session import build_session, load

    spark = build_session(app_name="measure-fold-chain", shuffle_partitions=32)
    max_id = (
        load(spark, corpus, "documents").agg(F.max("doc_id").alias("m")).collect()[0].m
    )
    n_docs = int(max_id) + 1
    emit({"section": "env", "corpus": corpus, "n_docs": n_docs, "loadavg": os.getloadavg()})

    if "chain" in sections:
        run_chain(spark, corpus, n_docs)
    if "endurance" in sections:
        run_endurance(spark, corpus, n_docs)
    if "gatecost" in sections:
        run_gatecost(spark, corpus, n_docs)
    if "fullday" in sections:
        run_fullday(spark, corpus, n_docs)
    if "fuzzy" in sections:
        run_fuzzy(spark, corpus, n_docs)


def run_chain(spark, corpus: str, n_docs: int) -> None:
    from broadway_kinesis_spark.functions.versioned_fold import (
        table_data_file_count,
    )
    from broadway_kinesis_spark.operators import corpus_versioning as cv
    from broadway_kinesis_spark.operators.incremental_batch import (
        ensure_ngram_index,
        incremental_ngram_pairs,
    )

    fams = {"digests", "minhash_bands", "ngram_index"}
    v0 = n_docs * 9 // 10
    step = (n_docs - v0) // 5
    days = [v0 + i * step for i in range(5)] + [n_docs]

    # version-N base builds (once, excluded from per-fold rows)
    t = time.time()
    from broadway_kinesis_spark.operators.incremental_batch import (
        ensure_corpus_digests,
    )
    from broadway_kinesis_spark.operators.minhash_incremental import (
        ensure_minhash_bands,
    )

    ensure_corpus_digests(spark, corpus, v0)
    ensure_minhash_bands(spark, corpus, v0)
    ensure_ngram_index(spark, corpus, v0)
    emit({"section": "chain", "row": "base_builds_v90", "wall_s": round(time.time() - t, 1), "loadavg": os.getloadavg()})

    for label, compact, max_files in (("nocompact", False, None), ("compact", True, 16)):
        prior = None
        for i, (n, n1) in enumerate(zip(days, days[1:])):
            t = time.time()
            prior = cv.roll_forward_corpus(
                spark, corpus, n, n1,
                families=fams, prior=prior,
                compact=compact, max_data_files=max_files,
            )
            files = {
                fam: [table_data_file_count(spark, a) for a in arts]
                for fam, arts in prior.items()
            }
            emit({
                "section": "chain", "variant": label, "day": i + 1,
                "boundaries": [n, n1],
                "fold_wall_s": round(time.time() - t, 1),
                "data_files": files,
                "loadavg": os.getloadavg(),
            })
        # day-5 serving-cost parity: probe the LAST day's delta against the
        # chained tables vs from-scratch tables at the same boundary
        idx_c, df_c = prior["ngram_index"]
        t = time.time()
        n_chain = incremental_ngram_pairs(
            spark, corpus, days[-2], idx_tbl=idx_c, df_tbl=df_c
        ).count()
        w_chain = time.time() - t
        t = time.time()
        idx_s, df_s = ensure_ngram_index(spark, corpus, days[-2])
        w_build_scratch = time.time() - t
        t = time.time()
        n_scratch = incremental_ngram_pairs(
            spark, corpus, days[-2], idx_tbl=idx_s, df_tbl=df_s
        ).count()
        w_scratch = time.time() - t
        assert n_chain == n_scratch, (n_chain, n_scratch)
        emit({
            "section": "chain", "variant": label, "row": "day5_probe_parity",
            "probe_on_chain_s": round(w_chain, 1),
            "probe_on_scratch_s": round(w_scratch, 1),
            "scratch_build_s": round(w_build_scratch, 1),
            "pairs": n_chain,
            "loadavg": os.getloadavg(),
        })


def run_endurance(spark, corpus: str, n_docs: int, k: int = 30) -> None:
    from broadway_kinesis_spark.functions.versioned_fold import (
        table_data_file_count,
    )
    from broadway_kinesis_spark.operators import corpus_versioning as cv
    from broadway_kinesis_spark.operators.incremental_batch import (
        ensure_corpus_digests,
        ensure_ngram_index,
        incremental_ngram_pairs,
    )
    from broadway_kinesis_spark.operators.minhash_incremental import (
        ensure_minhash_bands,
    )

    fams = {"digests", "minhash_bands", "ngram_index"}
    v0 = n_docs * 7 // 10
    step = (n_docs - v0) // k
    days = [v0 + i * step for i in range(k)] + [n_docs]

    t = time.time()
    ensure_corpus_digests(spark, corpus, v0)
    ensure_minhash_bands(spark, corpus, v0)
    ensure_ngram_index(spark, corpus, v0)
    emit({"section": "endurance", "row": "base_builds_v70", "wall_s": round(time.time() - t, 1), "loadavg": os.getloadavg()})

    prior = None
    walls: list[float] = []
    for i, (n, n1) in enumerate(zip(days, days[1:])):
        t = time.time()
        prior = cv.roll_forward_corpus(
            spark, corpus, n, n1, families=fams, prior=prior, compact=True,
        )
        w = time.time() - t
        walls.append(w)
        files = {
            fam: [table_data_file_count(spark, a) for a in arts]
            for fam, arts in prior.items()
        }
        out = {
            "section": "endurance", "day": i + 1, "boundaries": [n, n1],
            "fold_wall_s": round(w, 1), "data_files": files,
            "loadavg": os.getloadavg(),
        }
        if (i + 1) % 10 == 0:
            idx_c, df_c = prior["ngram_index"]
            t = time.time()
            out["probe_pairs"] = incremental_ngram_pairs(
                spark, corpus, n, idx_tbl=idx_c, df_tbl=df_c
            ).count()
            out["probe_wall_s"] = round(time.time() - t, 1)
        emit(out)

    # day-30 probe parity vs a from-scratch build at the same boundary
    idx_c, df_c = prior["ngram_index"]
    t = time.time()
    n_chain = incremental_ngram_pairs(
        spark, corpus, days[-2], idx_tbl=idx_c, df_tbl=df_c
    ).count()
    w_chain = time.time() - t
    t = time.time()
    idx_s, df_s = ensure_ngram_index(spark, corpus, days[-2])
    w_build = time.time() - t
    t = time.time()
    n_scratch = incremental_ngram_pairs(
        spark, corpus, days[-2], idx_tbl=idx_s, df_tbl=df_s
    ).count()
    w_scratch = time.time() - t
    assert n_chain == n_scratch, (n_chain, n_scratch)
    emit({
        "section": "endurance", "row": "day30_probe_parity",
        "probe_on_chain_s": round(w_chain, 1),
        "probe_on_scratch_s": round(w_scratch, 1),
        "scratch_build_s": round(w_build, 1),
        "pairs": n_chain,
        "loadavg": os.getloadavg(),
    })
    emit({
        "section": "endurance", "row": "flatness",
        "mean_fold_days_1_5_s": round(sum(walls[:5]) / 5, 2),
        "mean_fold_days_26_30_s": round(sum(walls[-5:]) / 5, 2),
        "max_fold_s": round(max(walls), 2),
        "loadavg": os.getloadavg(),
    })


def run_gatecost(spark, corpus: str, n_docs: int) -> None:
    from broadway_kinesis_spark.operators import corpus_versioning as cv
    from broadway_kinesis_spark.operators.ann_incremental import (
        ensure_version_index,
        rolled_recall,
    )

    fams = {"ivf_index"}
    b90 = n_docs * 9 // 10
    step = (n_docs - b90) // 4
    d1, d2, d3 = b90 + step, b90 + 2 * step, b90 + 3 * step

    t = time.time()
    ensure_version_index(spark, corpus, b90)
    emit({"section": "gatecost", "row": "base_index_v90", "wall_s": round(time.time() - t, 1), "loadavg": os.getloadavg()})

    # (a) fold day, gate off
    t = time.time()
    prior = cv.roll_forward_corpus(spark, corpus, b90, d1, families=fams)
    w_fold = time.time() - t
    emit({"section": "gatecost", "row": "fold_day_no_gate", "boundaries": [b90, d1], "wall_s": round(w_fold, 1), "loadavg": os.getloadavg()})

    # the gate's measurement alone, on the day-(a) rolled index
    t = time.time()
    r = rolled_recall(spark, corpus, prior["ivf_index"][0], d1)
    emit({"section": "gatecost", "row": "measure_only", "recall": round(r, 4), "wall_s": round(time.time() - t, 1), "loadavg": os.getloadavg()})

    # (b) fold day, gate on, healthy floor — fold + measure, no retrain
    rep: dict = {}
    t = time.time()
    prior = cv.roll_forward_corpus(
        spark, corpus, d1, d2, families=fams, prior=prior,
        recall_floor=0.5, drift_report=rep,
    )
    emit({
        "section": "gatecost", "row": "fold_day_with_gate",
        "boundaries": [d1, d2], "wall_s": round(time.time() - t, 1),
        "recall": round(rep["recall"], 4), "retrained": rep["retrained"],
        "loadavg": os.getloadavg(),
    })
    assert not rep["retrained"]

    # (c) forced-retrain day: floor > 1 always trips — fold + measure +
    # full-corpus retrain + vacuum of the superseded fold, the worst day
    rep = {}
    t = time.time()
    prior = cv.roll_forward_corpus(
        spark, corpus, d2, d3, families=fams, prior=prior,
        recall_floor=1.01, drift_report=rep,
    )
    emit({
        "section": "gatecost", "row": "retrain_day",
        "boundaries": [d2, d3], "wall_s": round(time.time() - t, 1),
        "recall_before_retrain": round(rep["recall"], 4),
        "retrained": rep["retrained"],
        "loadavg": os.getloadavg(),
    })
    assert rep["retrained"]
    # the retrained index must serve the full population it claims
    r = rolled_recall(spark, corpus, prior["ivf_index"][0], d3)
    emit({"section": "gatecost", "row": "post_retrain_recall", "recall": round(r, 4), "loadavg": os.getloadavg()})


def run_fullday(spark, corpus: str, n_docs: int) -> None:
    from broadway_kinesis_spark.operators import corpus_versioning as cv

    b90 = n_docs * 9 // 10
    d1 = b90 + n_docs // 50
    d2 = d1 + n_docs // 50

    # one-time version-N bases for every family, timed per family (warm
    # = cache-hit walls; emitted so the row is honest about what was
    # already built when the days below ran)
    from broadway_kinesis_spark.operators import (
        ann_incremental,
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

    bases = {
        "digests": incremental_batch.ensure_corpus_digests,
        "ngram_index": incremental_batch.ensure_ngram_index,
        "minhash_bands": minhash_incremental.ensure_minhash_bands,
        "simhash_counts": simhash_incremental.ensure_simhash_counts,
        "bottomk_probes": containment_incremental.ensure_bottomk_probes,
        "embedding_norms": embedding_incremental.ensure_embedding_norms,
        "phash_bands": fingerprint_incremental.ensure_phash_bands,
        "audio_bands": audiohash_incremental.ensure_audio_bands,
        "video_index": videohash_incremental.ensure_video_index,
        "fuzzy_prefixes": fuzzy_incremental.ensure_fuzzy_prefixes,
        "span_counts": substring_incremental.ensure_span_counts,
        "semantic_assignments": semantic_incremental.ensure_semantic_assignments,
        "split_labels": split_incremental.ensure_split_labels,
        "ivf_index": ann_incremental.ensure_version_index,
    }
    walls = {}
    for fam, fn in bases.items():
        t = time.time()
        fn(spark, corpus, b90)
        walls[fam] = round(time.time() - t, 1)
    emit({"section": "fullday", "row": "bases_v90", "per_family_wall_s": walls, "total_s": round(sum(walls.values()), 1), "loadavg": os.getloadavg()})

    t = time.time()
    day1 = cv.roll_forward_corpus(spark, corpus, b90, d1)
    emit({"section": "fullday", "row": "day1_all_families", "boundaries": [b90, d1], "wall_s": round(time.time() - t, 1), "loadavg": os.getloadavg()})

    prior = day1
    lo = d1
    for day in (2, 3):
        hi = lo + n_docs // 50
        rep: dict = {}
        t = time.time()
        prior = cv.roll_forward_corpus(
            spark, corpus, lo, hi, prior=prior, compact=True,
            recall_floor=0.5, drift_report=rep,
        )
        emit({
            "section": "fullday",
            "row": f"day{day}_chained_compacted_gated",
            "boundaries": [lo, hi], "wall_s": round(time.time() - t, 1),
            "families": len(prior), "recall": round(rep["recall"], 4),
            "retrained": rep["retrained"], "loadavg": os.getloadavg(),
        })
        lo = hi


def run_fuzzy(spark, corpus: str, n_docs: int) -> None:
    from pyspark.sql import functions as F

    from broadway_kinesis_spark.operators.dedup import (
        EDIT_T,
        _fuzzy_prefixes,
    )
    from broadway_kinesis_spark.operators.fuzzy_incremental import (
        ensure_fuzzy_prefixes,
        incremental_fuzzy_pairs,
    )
    from broadway_kinesis_spark.session import load

    boundary = n_docs * 9 // 10
    t = time.time()
    ensure_fuzzy_prefixes(spark, corpus, boundary)
    emit({"section": "fuzzy", "row": "prefix_build_v90", "wall_s": round(time.time() - t, 1), "loadavg": os.getloadavg()})

    pair_counts: dict[str, int] = {}
    for blocking in ["loose", "tight", "mid"]:
        t = time.time()
        n = incremental_fuzzy_pairs(
            spark, corpus, boundary, blocking=blocking
        ).count()
        pair_counts[blocking] = n
        emit({
            "section": "fuzzy", "row": "probe", "blocking": blocking,
            "wall_s": round(time.time() - t, 1), "pairs": n,
            "loadavg": os.getloadavg(),
        })
    # delta-pair recall (the r12 pricing geometry): the loose probe is
    # full-recall on delta-touching pairs by construction, so each tier's
    # retained fraction IS its recall on this corpus's delta pairs
    if pair_counts.get("loose"):
        emit({
            "section": "fuzzy", "row": "delta_pair_recall",
            "recall_tight": round(pair_counts["tight"] / pair_counts["loose"], 4),
            "recall_mid": round(pair_counts["mid"] / pair_counts["loose"], 4),
            "pairs": pair_counts,
            "loadavg": os.getloadavg(),
        })
    if n_docs > 100_000:
        return  # corpus-wide exhaustive recall is block-quadratic — x10 only

    # recall of each tier against the exhaustive channel: flags on ONE
    # exhaustive pair set (the composite_fuzzy_blocking_recall algebra)
    t = time.time()
    p = _fuzzy_prefixes(load(spark, corpus, "documents"))
    a = p.select(
        F.col("doc_id").alias("d1"), "lang", "size_bucket", "tok0",
        F.col("pfx").alias("pfx1"),
    )
    b = p.select(
        F.col("doc_id").alias("d2"), F.col("lang").alias("lang2"),
        F.col("size_bucket").alias("sb2"), F.col("tok0").alias("tok0b"),
        F.col("pfx").alias("pfx2"),
    )
    pairs = a.join(
        b,
        (F.col("lang") == F.col("lang2"))
        & (F.col("size_bucket") == F.col("sb2"))
        & (F.col("d1") < F.col("d2")),
    )
    ex = pairs.filter(F.levenshtein("pfx1", "pfx2", EDIT_T) >= 0).select(
        (F.col("tok0") == F.col("tok0b")).alias("tok_match"),
        (
            F.substring("pfx1", 1, 4) == F.substring("pfx2", 1, 4)
        ).alias("mid_match"),
    )
    row = ex.agg(
        F.count(F.lit(1)).alias("n_ex"),
        F.sum(F.when(F.col("tok_match"), 1).otherwise(0)).alias("n_tight"),
        F.sum(F.when(F.col("mid_match"), 1).otherwise(0)).alias("n_mid"),
    ).collect()[0]
    emit({
        "section": "fuzzy", "row": "recall",
        "n_exhaustive": row.n_ex, "n_tight": row.n_tight, "n_mid": row.n_mid,
        "recall_tight": round(row.n_tight / row.n_ex, 4) if row.n_ex else None,
        "recall_mid": round(row.n_mid / row.n_ex, 4) if row.n_ex else None,
        "wall_s": round(time.time() - t, 1),
        "loadavg": os.getloadavg(),
    })


if __name__ == "__main__":
    main()
