"""The daily ingest gate, end-to-end — one registered composite over the
incremental family (round 11, session 3).

Rounds 10–11 built the per-channel incremental loop: persisted version-N
artifacts, delta-bounded probes, roll-forward folds. This module chains
the stages a production corpus build actually runs per arriving document
— the DISPOSITION row the ingest gate materializes:

1. **exact gate**: the delta doc's content digest probes version N's
   persisted digest table (``incremental_batch.ensure_corpus_digests``)
   and the delta's own earlier arrivals (keep-first) — ``is_exact_dup``;
2. **near-dup gate**: the canonical MinHash-LSH incremental probe
   (``minhash_incremental.incremental_minhash_pairs``) counts each delta
   doc's verified near-duplicate partners with SMALLER ids (old or
   earlier-delta) — ``n_near_dups``;
3. **split assignment**: the incremental leakage-safe split
   (``split_incremental.incremental_split_assignment``) buckets the doc
   by its inherited (or fresh) cluster key — ``split``;
4. **the gate decision**: ``accepted`` = not an exact dup and no prior
   near-duplicate — the docs the epoch build would take.

One query, one oracle: each stage's from-scratch twin already exists as
a registered oracle OBJECT; the composite's oracle composes them (the
exact gate in closed form, the minhash incremental oracle aggregated per
``d2``, the split-assignment oracle joined on doc_id), so the driver row
proves the three persisted-artifact probes CHAIN correctly — same
boundary, same corpus, one disposition row per delta doc.

Scale posture: every stage is delta-bounded by its own module's argument
(digest probe = hash anti-join against 16 B/doc; minhash probe =
bucket-local band join; split = quotient CC over the delta's evidence);
the composite adds two delta-keyed left joins and a delta-partitioned
window on the digest column — nothing corpus-sized. The parameterized
body takes every version-N artifact as an override so day D+1's gate
runs on day D's folds (``roll_forward_digests`` /
``roll_forward_minhash_bands`` / ``roll_forward_split_labels``).

Reference parity: [TGT] — engine extension (SURVEY §2.B composite
family; the reference has no relational surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.operators import incremental_batch as _ib
from broadway_kinesis_spark.operators import minhash_incremental as _mh
from broadway_kinesis_spark.operators import split_incremental as _si
from broadway_kinesis_spark.operators.incremental_batch import (
    ensure_corpus_digests,
)
from broadway_kinesis_spark.operators.minhash_incremental import (
    incremental_minhash_pairs,
)
from broadway_kinesis_spark.operators.split_incremental import (
    incremental_split_assignment,
)
from broadway_kinesis_spark.registry import REGISTRY, query
from broadway_kinesis_spark.session import load

#: the shared fixture boundary — the stages MUST agree or the composite
#: would mix corpus versions; asserted against each module's constant.
BOUNDARY = 400
assert BOUNDARY == _ib.BOUNDARY == _mh.BOUNDARY == _si.BOUNDARY

#: stage oracles, read as OBJECTS from the registry at module load (the
#: dedup_persist pattern): the composite's oracle can never drift from
#: the stages' own driver-checked statements.
_MINHASH_INCR_ORACLE = REGISTRY["dedup_incremental_minhash"].oracle
_SPLIT_ASSIGN_ORACLE = REGISTRY["dedup_split_incremental_assign"].oracle


@query(
    "pipeline_daily_increment",
    oracle=f"""
    WITH md AS (
        SELECT doc_id, md5(text) AS h FROM documents
    ), ex AS (
        SELECT e.doc_id,
               EXISTS (SELECT 1 FROM md b
                       WHERE b.h = e.h AND b.doc_id < e.doc_id)
                   AS is_exact_dup
        FROM md e WHERE e.doc_id >= {BOUNDARY}
    ), nm AS (
        SELECT d2 AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_near_dups
        FROM ({_MINHASH_INCR_ORACLE}) GROUP BY d2
    ), sp AS (
        {_SPLIT_ASSIGN_ORACLE}
    )
    SELECT ex.doc_id, ex.is_exact_dup,
           COALESCE(nm.n_near_dups, 0) AS n_near_dups,
           sp.split,
           (NOT ex.is_exact_dup AND COALESCE(nm.n_near_dups, 0) = 0)
               AS accepted
    FROM ex
    JOIN sp ON sp.doc_id = ex.doc_id
    LEFT JOIN nm ON nm.doc_id = ex.doc_id
    """,
)
def pipeline_daily_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The arriving delta's full ingest disposition — (doc_id,
    is_exact_dup, n_near_dups, split, accepted) — computed end-to-end
    from version N's persisted artifacts: digest table (exact gate),
    MinHash band table (near-dup gate), evidence edges + cluster labels
    (leakage-safe split). The oracle recomputes every stage from scratch
    and joins them, so the driver row proves the chained probes land
    exactly where the full recompute lands."""
    return daily_increment_rows(spark, sf_dir)


def daily_increment_rows(
    spark: SparkSession,
    sf_dir: str,
    boundary: int = BOUNDARY,
    digests_tbl: str | None = None,
    bands_tbl: str | None = None,
    labels_tbl: str | None = None,
) -> DataFrame:
    """Parameterized body of ``pipeline_daily_increment`` — scale runs
    place ``boundary`` per corpus; the three artifact overrides accept
    roll-forward folds so day D+1's gate runs on day D's artifacts
    without code change."""
    digests = spark.table(
        digests_tbl
        if digests_tbl is not None
        else ensure_corpus_digests(spark, sf_dir, boundary)
    )
    d = load(spark, sf_dir, "documents")
    md = d.filter(F.col("doc_id") >= boundary).select(
        "doc_id", F.md5("text").alias("text_md5")
    )
    # exact gate: stored-digest membership OR an earlier delta arrival
    # with the same digest (keep-first — the dedup_incremental decision).
    in_old = digests.select("text_md5").withColumn("in_old", F.lit(1))
    first_arrival = F.min("doc_id").over(Window.partitionBy("text_md5"))
    ex = (
        md.join(in_old, "text_md5", "left")
        .withColumn(
            "is_exact_dup",
            (F.col("in_old").isNotNull())
            | (F.col("doc_id") > first_arrival),
        )
        .select("doc_id", "is_exact_dup")
    )
    # near-dup gate: verified minhash partners with smaller ids.
    nm = (
        incremental_minhash_pairs(spark, sf_dir, boundary, bands_tbl=bands_tbl)
        .groupBy(F.col("d2").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_near_dups"))
    )
    # split assignment over the persisted evidence.
    sp = incremental_split_assignment(
        spark, sf_dir, boundary, labels_tbl=labels_tbl
    ).select("doc_id", "split")
    n_near = F.coalesce("n_near_dups", F.lit(0).cast("long"))
    return (
        ex.join(sp, "doc_id")
        .join(nm, "doc_id", "left")
        .select(
            "doc_id",
            "is_exact_dup",
            n_near.alias("n_near_dups"),
            "split",
            (~F.col("is_exact_dup") & (n_near == 0)).alias("accepted"),
        )
    )
