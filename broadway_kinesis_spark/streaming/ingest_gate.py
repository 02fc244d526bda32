"""Streaming ingest gate — ``pipeline_daily_increment`` as a sink.

The session-3 batch composite (`operators/daily_increment.py`) computes
one disposition row per arriving document against version N's persisted
artifacts. This module is its Structured Streaming twin: micro-batches
arrive (the replay / kinesis_efo source), and each batch gates
batch-by-batch against PERSISTENT state that earlier batches — and
earlier runs — accumulated:

1. **exact gate**: content digest vs the accepted-digest store, plus
   keep-first within the batch;
2. **near-dup gate**: MinHash band probe vs the accepted band index
   (the `neardup_dedup_sink` machinery, REUSED: same signature, band,
   and agreement math), plus within-batch collisions;
3. **split side**: the quotient-CC rule of
   `split_incremental.incremental_split_assignment` applied per batch —
   verified pairs form edges, accepted-history endpoints collapse to
   their stored group labels, Hash-Min CC runs over the batch-bounded
   quotient graph, and every doc buckets by its component's group key
   (md5 % 100, the split family's buckets). A REJECTED document's
   disposition still records the split side its content belongs to —
   the row an audit or eval-retention pass consumes;
4. **the gate decision**: ``accepted`` = not exact, no earlier near-dup
   partner. Accepted docs append their digest, signature/band rows, and
   (doc_id, text_md5, grp, split) label row to the stores the NEXT
   batch probes.

Semantics notes (vs the batch composite): the registered composite
reports BOTH gates for every delta doc (the audit view, oracle-checked);
the streaming gate short-circuits — an exact dup skips the near-dup
probe (`n_near_dups` is 0 for it) and inherits its split from the first
arrival of its digest. Document ids must be globally unique and
arrival-ordered across batches (the replay/Kinesis contract) for
keep-first to mean first-arrival.

Crash safety: the marker/self-heal protocol of
`streaming/incremental.py`, with DISPOSITIONS as the recovery source of
truth — dispositions keep the raw text (the neardup-sink precedent), so
a crash between the dispositions append and any index append is healed
by re-deriving the missing digest/sig/band/label rows from dispositions
itself before the next batch gates. Offset commit lands after the sink
returns (the A14 at-least-once posture); a replayed batch's docs are
exact dups of their first arrival and gate to rejected, so the accepted
set is effectively-once.

Scale posture: identical to the batch loop — digests are 16 bytes/doc,
band probes are equi-joins on 16-byte keys, the quotient CC is bounded
by the BATCH's near-dup population (never the corpus), and the stores
compact via streaming/maintenance.py once fragmented. At production
scale the stores are transactional tables; plain parquet-dir append
keeps this hermetic with the identical plan shape.

Reference parity: [TGT] — the closest the engine comes to the
reference's actual job (`lib/broadway_kinesis.ex` feeds a pipeline that
gates records as they arrive); the gate stages themselves are engine
extensions (SURVEY §2.B).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.operators.clustering import connected_components
from broadway_kinesis_spark.operators.splits import TRAIN_PCT, VAL_PCT, _bucket
from broadway_kinesis_spark.streaming.incremental import (
    SIM_T,
    _band_rows,
    _sig_agreement,
    _with_signature,
)
from broadway_kinesis_spark.streaming.maintenance import (
    compact_if_fragmented,
    heal_interrupted_compaction,
)

#: state-store layout under the caller's state_dir
DISPOSITIONS = "dispositions.parquet"
DIGESTS = "digests.parquet"
SIGS = "sigs.parquet"
BANDS = "bands.parquet"
LABELS = "labels.parquet"


def _paths(state_dir: str) -> dict[str, str]:
    return {
        name: os.path.join(state_dir, name)
        for name in (DISPOSITIONS, DIGESTS, SIGS, BANDS, LABELS)
    }


def _split_of(grp_col):
    bucket = _bucket(grp_col)
    return (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )


def _heal_from_dispositions(spark, p: dict[str, str]) -> None:
    """Re-derive any accepted doc's missing digest/sig/band/label rows
    from the dispositions store (which carries the raw text and the
    already-decided grp/split). Idempotent; each store heals
    independently — a crash can land between ANY two appends."""
    if not os.path.exists(p[DISPOSITIONS]):
        return
    acc = (
        spark.read.parquet(p[DISPOSITIONS])
        .filter(F.col("accepted"))
        .select("doc_id", "text", "text_md5", "grp", "split")
    )
    jobs = (
        (p[DIGESTS], "text_md5", lambda d: d.select("text_md5").distinct()),
        (p[SIGS], "doc_id", lambda d: _with_signature(d).select("doc_id", "sig")),
        (p[BANDS], "doc_id", lambda d: _band_rows(_with_signature(d))),
        (
            p[LABELS],
            "doc_id",
            lambda d: d.select("doc_id", "text_md5", "grp", "split"),
        ),
    )
    for path, key, project in jobs:
        if os.path.exists(path):
            have = spark.read.parquet(path).select(key).distinct()
            missing = acc.join(have, key, "left_anti")
        else:
            missing = acc
        missing = missing.persist()
        try:
            if missing.count():
                project(missing).write.mode("append").parquet(path)
        finally:
            missing.unpersist()


def gate_batch(batch_df: DataFrame, state_dir: str) -> int:
    """One micro-batch of the streaming ingest gate; returns #accepted.

    ``batch_df`` needs columns ``doc_id`` (globally unique, arrival-
    ordered) and ``text``. Emits one disposition row per incoming doc and
    appends accepted docs' rows to every store, all under the marker/heal
    protocol (module docstring)."""
    spark = batch_df.sparkSession
    p = _paths(state_dir)
    for path in p.values():
        heal_interrupted_compaction(path)
    marker_dir = os.path.join(state_dir, "_inflight")
    os.makedirs(marker_dir, exist_ok=True)
    if os.listdir(marker_dir):  # unclean stop mid-append: re-sync first
        _heal_from_dispositions(spark, p)
        for m in os.listdir(marker_dir):
            os.remove(os.path.join(marker_dir, m))
    compact_if_fragmented(spark, p[DIGESTS], dedup_cols=["text_md5"])
    for path in (p[DISPOSITIONS], p[SIGS], p[BANDS], p[LABELS]):
        compact_if_fragmented(spark, path)

    # ---- exact gate ------------------------------------------------------
    incoming = batch_df.select("doc_id", "text", F.md5("text").alias("text_md5"))
    w = Window.partitionBy("text_md5").orderBy("doc_id")
    incoming = incoming.withColumn("rn", F.row_number().over(w))
    if os.path.exists(p[DIGESTS]):
        known = (
            spark.read.parquet(p[DIGESTS])
            .select("text_md5")
            .withColumn("in_hist", F.lit(1))
        )
        incoming = incoming.join(known, "text_md5", "left")
    else:
        incoming = incoming.withColumn("in_hist", F.lit(None).cast("int"))
    incoming = incoming.withColumn(
        "is_exact_dup", F.col("in_hist").isNotNull() | (F.col("rn") > 1)
    )
    # Materialize: every downstream branch (near-dup probe, CC, appends)
    # reuses these batch-bounded rows, and the plan reads store paths the
    # appends below will mutate.
    incoming = incoming.persist()

    # ---- near-dup gate (non-exact docs only) -----------------------------
    fresh = incoming.filter(~F.col("is_exact_dup")).select("doc_id", "text")
    sigs = _with_signature(fresh).select("doc_id", "sig").persist()
    bands = _band_rows(sigs)
    b = bands.select(
        F.col("doc_id").alias("d2"), "band_idx", "band_key"
    )
    cand_parts = []
    if os.path.exists(p[BANDS]):
        stored_b = spark.read.parquet(p[BANDS]).select(
            F.col("doc_id").alias("d1"), "band_idx", "band_key"
        )
        cand_parts.append(stored_b.join(b, ["band_idx", "band_key"]))
    cand_parts.append(
        bands.select(F.col("doc_id").alias("d1"), "band_idx", "band_key").join(
            b, ["band_idx", "band_key"]
        )
    )
    cand = cand_parts[0]
    for c in cand_parts[1:]:
        cand = cand.unionByName(c)
    cand = cand.filter(F.col("d1") < F.col("d2")).select("d1", "d2").distinct()
    sig_sides = sigs.select(F.col("doc_id").alias("d2"), F.col("sig").alias("s2"))
    s1_batch = sigs.select(F.col("doc_id").alias("d1"), F.col("sig").alias("s1"))
    if os.path.exists(p[SIGS]):
        s1_hist = spark.read.parquet(p[SIGS]).select(
            F.col("doc_id").alias("d1"), F.col("sig").alias("s1")
        )
        s1 = s1_batch.unionByName(s1_hist)
    else:
        s1 = s1_batch
    verified = (
        cand.join(s1, "d1")
        .join(sig_sides, "d2")
        .filter(_sig_agreement(F.col("s1"), F.col("s2")) >= SIM_T)
        .select("d1", "d2")
        .persist()
    )

    # ---- split side: per-batch quotient CC -------------------------------
    # collapse accepted-history endpoints (d1 may be history; d2 is always
    # batch) to their stored group labels, then Hash-Min over the bounded
    # quotient graph — split_incremental's rule per micro-batch.
    if os.path.exists(p[LABELS]):
        labels_hist = spark.read.parquet(p[LABELS]).select(
            F.col("doc_id").alias("d1"), F.col("grp").alias("lab1")
        )
        quotient = verified.join(labels_hist, "d1", "left").select(
            F.coalesce("lab1", "d1").alias("d1"), "d2"
        )
    else:
        quotient = verified
    n_edges = quotient.count()  # batch-bounded by construction
    if n_edges:
        qlabels = connected_components(quotient).select(
            F.col("node").alias("doc_id"), F.col("label").alias("component_id")
        )
    else:
        qlabels = spark.createDataFrame(
            [], "doc_id long, component_id long"
        )

    # near-dup partner counts: history partners are all earlier; batch
    # partners count when their id is smaller (arrival order).
    near_counts = (
        verified.groupBy(F.col("d2").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_near_dups"))
    )

    # ---- dispositions -----------------------------------------------------
    disp = (
        incoming.join(near_counts, "doc_id", "left")
        .join(qlabels, "doc_id", "left")
        .withColumn(
            "n_near_dups",
            F.when(F.col("is_exact_dup"), F.lit(0)).otherwise(
                F.coalesce("n_near_dups", F.lit(0))
            ).cast("long"),
        )
    )
    # exact dups inherit their first arrival's group via the label store;
    # batch-internal exact dups inherit the batch winner's component (or
    # its own id when the winner is unclustered).
    if os.path.exists(p[LABELS]):
        md5_grp = (
            spark.read.parquet(p[LABELS])
            .groupBy("text_md5")
            .agg(F.min("grp").alias("hist_grp"))
        )
        disp = disp.join(md5_grp, "text_md5", "left")
    else:
        disp = disp.withColumn("hist_grp", F.lit(None).cast("long"))
    winner_grp = F.first(
        F.coalesce("component_id", "hist_grp", "doc_id"), ignorenulls=True
    ).over(Window.partitionBy("text_md5").orderBy("doc_id"))
    grp = F.coalesce("component_id", "hist_grp", winner_grp, F.col("doc_id"))
    disp = (
        disp.withColumn("grp", grp.cast("long"))
        .withColumn("split", _split_of(F.col("grp")))
        .withColumn(
            "accepted", ~F.col("is_exact_dup") & (F.col("n_near_dups") == 0)
        )
        .select(
            "doc_id", "text", "text_md5", "is_exact_dup", "n_near_dups",
            "grp", "split", "accepted",
        )
        .persist()
    )

    # ---- commit under the marker protocol ---------------------------------
    try:
        n_accepted = disp.filter(F.col("accepted")).count()
        marker = os.path.join(marker_dir, "batch")
        with open(marker, "w", encoding="utf-8"):
            pass
        disp.write.mode("append").parquet(p[DISPOSITIONS])
        acc = disp.filter(F.col("accepted"))
        if n_accepted:
            acc.select("text_md5").distinct().write.mode("append").parquet(
                p[DIGESTS]
            )
            acc_sigs = sigs.join(acc.select("doc_id"), "doc_id")
            acc_sigs.write.mode("append").parquet(p[SIGS])
            _band_rows(acc_sigs).write.mode("append").parquet(p[BANDS])
            acc.select("doc_id", "text_md5", "grp", "split").write.mode(
                "append"
            ).parquet(p[LABELS])
        os.remove(marker)
        return n_accepted
    finally:
        disp.unpersist()
        verified.unpersist()
        sigs.unpersist()
        incoming.unpersist()


def ingest_gate_sink(state_dir: str):
    """``foreachBatch`` callable running :func:`gate_batch`."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        gate_batch(batch_df, state_dir)

    return sink
