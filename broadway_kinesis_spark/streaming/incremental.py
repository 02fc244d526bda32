"""Streaming incremental corpus dedup — `dedup_incremental` as a sink.

Ties the §2.A source surface to the §2.B dedup surface (VERDICT r2 #6): a
document stream (e.g. the replay / kinesis_efo source) is deduplicated
batch-by-batch against a PERSISTENT content-digest index, so a document seen
in any earlier micro-batch — or any earlier run of the query — is dropped.
Per micro-batch, inside ``foreachBatch``:

1. digest:        incoming docs -> (doc_id, md5(text))           [map-side]
2. keep-first:    one row per digest within the batch (window)   [1 shuffle]
3. anti-join:     drop digests already in the index              [hash join]
4. append:        survivors -> accepted parquet; their digests -> index

``foreachBatch`` bodies run serially per query, so the read-index /
append-index cycle never races itself. Crash safety: the two appends
(accepted, then index) are not one transaction, so a crash between them
would leave accepted ahead of the index and a replayed batch would accept
the same content twice. The sink closes that window with an in-flight
marker + self-heal protocol:

1. if a marker from an interrupted batch exists, HEAL first — append any
   digest present in accepted but missing from the index, then clear the
   marker (idempotent; normally a no-op that costs one ``os.listdir``);
2. anti-join the batch against the (now complete) index;
3. marker up -> append accepted -> append index -> marker down.

A crash at ANY point now yields effectively-once accepted output on
replay: before the accepted append the batch replays cleanly; between the
appends (or mid-append — parquet task files commit per-file) the heal step
re-derives the missing digests from accepted itself before the anti-join
runs. This is the hermetic stand-in for what a transactional table gives
you natively; the offset commit still lands after the sink returns, same
A14 at-least-once posture as the source.

Scale posture: the index holds 16-byte digests, not documents — the same
"shuffle hashes, never bodies" rule as dedup.py. The steady-state
anti-join reads only the compact index (broadcast while small,
shuffle-hash after AQE flips it); the heal scan of accepted's pruned
digest column runs ONLY after an unclean stop. At production scale the
index lives in a transactional table (Delta/Iceberg) for atomic append +
compaction, which replaces the marker protocol outright; plain
parquet-dir append keeps this hermetic here and preserves the identical
plan shape. The one-file-per-batch append fragmentation that implies is
handled: every batch start heals any interrupted compaction and triggers
streaming/maintenance.py's atomic directory compaction once a store
passes the fragmentation threshold.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.streaming.maintenance import (
    compact_if_fragmented,
    heal_interrupted_compaction,
)


def _heal_index(spark, index_path: str, accepted_path: str) -> None:
    """Append to the index any digest that reached accepted but not the
    index (the crash window between the two appends). Idempotent."""
    if not os.path.exists(accepted_path):
        return
    acc = spark.read.parquet(accepted_path).select("text_md5")
    if os.path.exists(index_path):
        idx = spark.read.parquet(index_path).select("text_md5")
        missing = acc.join(idx, "text_md5", "left_anti").distinct()
    else:
        missing = acc.distinct()
    missing = missing.persist()
    try:
        if missing.count():
            missing.write.mode("append").parquet(index_path)
    finally:
        missing.unpersist()


def dedup_batch_against_index(
    batch_df: DataFrame, index_path: str, accepted_path: str
) -> int:
    """One micro-batch of incremental dedup; returns #accepted docs.

    ``batch_df`` needs columns ``doc_id`` (orderable id; keep-first winner)
    and ``text``. Survivors are appended to ``accepted_path``; their digests
    to ``index_path`` under the marker/heal protocol (module docstring).
    """
    spark = batch_df.sparkSession
    # An interrupted COMPACTION (maintenance.py) must be healed before any
    # read; then the marker protocol heals an interrupted APPEND; then the
    # fragmentation trigger may compact the (now consistent) stores —
    # foreachBatch bodies run serially, so nothing races the swap.
    heal_interrupted_compaction(index_path)
    heal_interrupted_compaction(accepted_path)
    marker_dir = accepted_path + "_inflight"
    os.makedirs(marker_dir, exist_ok=True)
    if os.listdir(marker_dir):  # unclean stop mid-append: re-sync first
        _heal_index(spark, index_path, accepted_path)
        for m in os.listdir(marker_dir):
            os.remove(os.path.join(marker_dir, m))
    compact_if_fragmented(spark, index_path, dedup_cols=["text_md5"])
    compact_if_fragmented(spark, accepted_path)

    incoming = batch_df.select("doc_id", F.md5("text").alias("text_md5"))
    w = Window.partitionBy("text_md5").orderBy("doc_id")
    first = (
        incoming.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    if os.path.exists(index_path):
        index = spark.read.parquet(index_path).select("text_md5")
        fresh = first.join(index, "text_md5", "left_anti")
    else:
        fresh = first
    # Materialize BEFORE appending to the index: the `fresh` plan reads
    # index_path, and executing it lazily during the index append would
    # re-list the directory mid-write.
    fresh = fresh.persist()
    try:
        n = fresh.count()
        if n:
            marker = os.path.join(marker_dir, "batch")
            with open(marker, "w", encoding="utf-8"):
                pass
            fresh.write.mode("append").parquet(accepted_path)
            fresh.select("text_md5").write.mode("append").parquet(index_path)
            os.remove(marker)
        return n
    finally:
        fresh.unpersist()


def incremental_dedup_sink(index_path: str, accepted_path: str):
    """``foreachBatch`` callable running :func:`dedup_batch_against_index`."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        dedup_batch_against_index(batch_df, index_path, accepted_path)

    return sink


# ------------------------------------------------- streaming NEAR-dup dedup
#
# The streaming twin of dedup_minhash_lsh (VERDICT r3 #5): the persistent
# index holds MinHash BAND KEYS + signatures instead of exact digests, so a
# document arriving in a later batch — or a later run — is rejected when it
# is merely NEAR-duplicate (signature similarity >= SIM_T) of anything
# accepted before, not only byte-identical. Same parameters as the batch
# operator (N_SIG hashes, N_BANDS bands), same scale rule ("shuffle hashes,
# never bodies": candidate generation is an equi-join on 16-byte band keys,
# verification reads only the candidates' signatures), and the same
# marker/self-heal commit protocol — the accepted store keeps the raw text,
# so healing after a crash between the accepted and index appends re-derives
# every missing signature/band row from accepted itself.

from broadway_kinesis_spark.operators.dedup import BAND_R, N_BANDS, N_SIG  # noqa: E402

SIM_T = 0.5  # signature-agreement threshold ~ Jaccard >= dedup.JACCARD_T


def _with_signature(docs: DataFrame) -> DataFrame:
    """(doc_id, text, sig: array<string>[N_SIG]) — MinHash signature from
    distinct word 3-gram shingles (dedup.py math: min of salted md5).
    Documents too short to shingle (<3 words) hash their whole normalized
    text — near-dup detection degrades to exact-dup for them instead of
    silently accepting everything short."""
    words = F.split(F.lower("text"), " ")
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", F.element_at("words", i), F.element_at("words", i + 1), F.element_at("words", i + 2)
    )
    shingles = F.when(
        F.size("words") >= 3,
        F.array_distinct(F.transform(F.sequence(F.lit(1), F.size("words") - 2), gram)),
    ).otherwise(F.array(F.lower("text")))
    # NB: the transform lambda must take exactly ONE arg — PySpark passes
    # (value, index) to two-arg lambdas, so a `lambda g, s=s:` default-arg
    # closure would silently receive the INDEX column as its salt.
    def salted_min(s: int):
        salt = f"{s}:"
        return F.array_min(
            F.transform("shingles", lambda g: F.md5(F.concat(F.lit(salt), g)))
        )

    sig = F.array(*[salted_min(s) for s in range(N_SIG)])
    return (
        docs.select("doc_id", "text", words.alias("words"))
        .withColumn("shingles", shingles)
        .select("doc_id", "text", sig.alias("sig"))
    )


def _band_rows(sig_df: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_key): one md5 key per band of BAND_R rows."""
    keys = F.array(
        *[
            F.md5(
                F.concat(
                    *[F.element_at("sig", b * BAND_R + r + 1) for r in range(BAND_R)]
                )
            )
            for b in range(N_BANDS)
        ]
    )
    return sig_df.select(
        "doc_id", F.posexplode(keys).alias("band_idx", "band_key")
    )


def _sig_agreement(a, b):
    """Fraction of agreeing signature positions — the MinHash estimate of
    the true Jaccard similarity."""
    agree = F.size(F.filter(F.zip_with(a, b, lambda x, y: x == y), lambda m: m))
    return agree / F.lit(float(N_SIG))


def _heal_neardup(spark, index_dir: str, accepted_path: str) -> None:
    """Append signature + band rows for any accepted doc missing from the
    index (the crash window between the accepted and the two index
    appends). The components are healed INDEPENDENTLY — a crash between
    the sigs append and the bands append leaves a doc present in sigs but
    absent from bands, and healing only one component would leave the band
    index silently incomplete. Idempotent; recomputes from the accepted
    store's raw text."""
    if not os.path.exists(accepted_path):
        return
    acc = spark.read.parquet(accepted_path).select("doc_id", "text")
    for sub, project in (
        ("sigs.parquet", lambda d: d.select("doc_id", "sig")),
        ("bands.parquet", _band_rows),
    ):
        path = os.path.join(index_dir, sub)
        if os.path.exists(path):
            have = spark.read.parquet(path).select("doc_id").distinct()
            missing = acc.join(have, "doc_id", "left_anti")
        else:
            missing = acc
        missing = _with_signature(missing).persist()
        try:
            if missing.count():
                project(missing).write.mode("append").parquet(path)
        finally:
            missing.unpersist()


def neardup_batch_against_index(
    batch_df: DataFrame, index_dir: str, accepted_path: str
) -> int:
    """One micro-batch of streaming near-dup dedup; returns #accepted.

    ``batch_df`` needs columns ``doc_id`` and ``text``. Within the batch,
    keep-first (by doc_id) among band-colliding pairs whose signatures
    agree >= SIM_T; against history, drop any doc whose bands collide with
    the index and whose signature agrees >= SIM_T with the matched accepted
    doc. Survivors append under the marker/heal protocol."""
    spark = batch_df.sparkSession
    sigs_path = os.path.join(index_dir, "sigs.parquet")
    stores = [sigs_path, os.path.join(index_dir, "bands.parquet"), accepted_path]
    for p in stores:  # compaction heal precedes every read (maintenance.py)
        heal_interrupted_compaction(p)
    marker_dir = accepted_path + "_inflight"
    os.makedirs(marker_dir, exist_ok=True)
    if os.listdir(marker_dir):
        _heal_neardup(spark, index_dir, accepted_path)
        for m in os.listdir(marker_dir):
            os.remove(os.path.join(marker_dir, m))
    for p in stores:
        compact_if_fragmented(spark, p)

    sig_df = _with_signature(batch_df.select("doc_id", "text")).persist()
    try:
        bands = _band_rows(sig_df)

        # WITHIN batch: LSH candidates (same band key, d1 < d2), verified on
        # signature agreement; the larger doc_id of a verified pair drops
        # (keep-first chain semantics, deterministic).
        a = bands.select(F.col("doc_id").alias("d1"), "band_idx", "band_key")
        b = bands.select(F.col("doc_id").alias("d2"), "band_idx", "band_key")
        pairs = (
            a.join(b, ["band_idx", "band_key"])
            .filter(F.col("d1") < F.col("d2"))
            .select("d1", "d2")
            .distinct()
        )
        s1 = sig_df.select(F.col("doc_id").alias("d1"), F.col("sig").alias("sig1"))
        s2 = sig_df.select(F.col("doc_id").alias("d2"), F.col("sig").alias("sig2"))
        dup_in_batch = (
            pairs.join(s1, "d1")
            .join(s2, "d2")
            .filter(_sig_agreement(F.col("sig1"), F.col("sig2")) >= SIM_T)
            .select(F.col("d2").alias("doc_id"))
            .distinct()
        )
        fresh = sig_df.join(dup_in_batch, "doc_id", "left_anti")

        # ACROSS batches/runs: collide against the persistent band index,
        # verify against the stored signatures of the matched docs only.
        bands_path = os.path.join(index_dir, "bands.parquet")
        if os.path.exists(bands_path):
            idx_bands = spark.read.parquet(bands_path)
            idx_sigs = spark.read.parquet(os.path.join(index_dir, "sigs.parquet"))
            cand = (
                _band_rows(fresh)
                .join(
                    idx_bands.select(
                        F.col("doc_id").alias("idx_doc"), "band_idx", "band_key"
                    ),
                    ["band_idx", "band_key"],
                )
                .select("doc_id", "idx_doc")
                .distinct()
            )
            hits = (
                cand.join(fresh.select("doc_id", "sig"), "doc_id")
                .join(
                    idx_sigs.select(
                        F.col("doc_id").alias("idx_doc"), F.col("sig").alias("idx_sig")
                    ),
                    "idx_doc",
                )
                .filter(_sig_agreement(F.col("sig"), F.col("idx_sig")) >= SIM_T)
                .select("doc_id")
                .distinct()
            )
            fresh = fresh.join(hits, "doc_id", "left_anti")

        fresh = fresh.persist()
        try:
            n = fresh.count()
            if n:
                marker = os.path.join(marker_dir, "batch")
                with open(marker, "w", encoding="utf-8"):
                    pass
                fresh.select("doc_id", "text").write.mode("append").parquet(
                    accepted_path
                )
                fresh.select("doc_id", "sig").write.mode("append").parquet(
                    os.path.join(index_dir, "sigs.parquet")
                )
                _band_rows(fresh).write.mode("append").parquet(bands_path)
                os.remove(marker)
            return n
        finally:
            fresh.unpersist()
    finally:
        sig_df.unpersist()


def neardup_dedup_sink(index_dir: str, accepted_path: str):
    """``foreachBatch`` callable running :func:`neardup_batch_against_index`."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        neardup_batch_against_index(batch_df, index_dir, accepted_path)

    return sink
