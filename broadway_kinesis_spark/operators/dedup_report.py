"""Candidate-generation recall report — "measure, don't guess" as an
operator.

Every corpus build that swaps the exhaustive inverted index for banded
MinHash-LSH should KNOW what the bands miss on ITS corpus, not assume
the textbook recall curve. Both registered channels verify candidates
with the same exact Jaccard >= threshold (dedup.py `_verify_pairs`), so
any output difference is pure CANDIDATE-GENERATION policy:

- the inverted index proposes every pair sharing a non-stop shingle
  (complete except for pairs whose ONLY shared shingles are DF-capped);
- banded MinHash proposes pairs colliding in any of {N_BANDS} signature
  bands (probabilistic: a true pair can miss every band).

The report full-outer-joins the two verified pair sets and emits one
row of exact integer counts — pairs found by the index, by LSH, by
both, by only one — plus the LSH recall against the index channel in
integer micro-units (no float crosses the oracle hash). `only_lsh`
being nonzero is itself informative: those pairs share only stop-capped
shingles, i.e. the two channels' blind spots differ.

Scale posture (100 TB): both inputs are OUTPUT-sized pair sets (the
bounded candidate generators ran inside each channel); the join and the
single-row rollup are trivial against them. The report is the cheap
thing you run after dedup, not a third dedup pass.

Reference parity: [TGT] — engine extension (SURVEY §2.B dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.operators.dedup import (
    _SQL_MINHASH_BANDS,
    _SQL_PAIR_VERIFY,
    _SQL_SHINGLES,
    DF_CAP,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
)
from broadway_kinesis_spark.registry import query

MICRO = 1_000_000


@query(
    "composite_dedup_recall",
    oracle=f"""
    WITH shingled AS ({_SQL_SHINGLES}),
    ex AS (
        WITH idx AS (
            SELECT doc_id, shingle FROM (
                SELECT doc_id, UNNEST(shingles) AS shingle FROM shingled
            ) QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= {DF_CAP}
        ), cand AS (
            SELECT a.doc_id AS d1, b.doc_id AS d2
            FROM idx a JOIN idx b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        {_SQL_PAIR_VERIFY}
    ),
    mh AS (
        WITH {_SQL_MINHASH_BANDS}, cand AS (
            SELECT a.doc_id AS d1, b.doc_id AS d2
            FROM bands a JOIN bands b
              ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        {_SQL_PAIR_VERIFY}
    ),
    j AS (
        SELECT (e.d1 IS NOT NULL) AS in_ex, (m.d1 IS NOT NULL) AS in_mh
        FROM ex e FULL OUTER JOIN mh m ON e.d1 = m.d1 AND e.d2 = m.d2
    ),
    c AS (
        SELECT CAST(SUM(CASE WHEN in_ex THEN 1 ELSE 0 END) AS BIGINT) AS n_index,
               CAST(SUM(CASE WHEN in_mh THEN 1 ELSE 0 END) AS BIGINT) AS n_lsh,
               CAST(SUM(CASE WHEN in_ex AND in_mh THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
               CAST(SUM(CASE WHEN in_ex AND NOT in_mh THEN 1 ELSE 0 END) AS BIGINT) AS only_index,
               CAST(SUM(CASE WHEN in_mh AND NOT in_ex THEN 1 ELSE 0 END) AS BIGINT) AS only_lsh
        FROM j
    )
    SELECT n_index, n_lsh, n_both, only_index, only_lsh,
           CASE WHEN n_index = 0 THEN NULL
                ELSE CAST(n_both * {MICRO} // n_index AS BIGINT) END
               AS lsh_recall_micro
    FROM c
    """,
)
def composite_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row agreement report between the two verified near-dup channels:
    pair counts per channel / in both / in exactly one, and LSH recall vs
    the inverted-index channel in integer micro-units."""
    ex = dedup_ngram_jaccard(spark, sf_dir).select(
        "d1", "d2", F.lit(True).alias("in_ex")
    )
    mh = dedup_minhash_lsh(spark, sf_dir).select(
        "d1", "d2", F.lit(True).alias("in_mh")
    )
    j = ex.join(mh, ["d1", "d2"], "full_outer")
    c = j.agg(
        F.sum(F.when(F.col("in_ex"), 1).otherwise(0)).alias("n_index"),
        F.sum(F.when(F.col("in_mh"), 1).otherwise(0)).alias("n_lsh"),
        F.sum(
            F.when(F.col("in_ex") & F.col("in_mh"), 1).otherwise(0)
        ).alias("n_both"),
        F.sum(
            F.when(F.col("in_ex") & F.col("in_mh").isNull(), 1).otherwise(0)
        ).alias("only_index"),
        F.sum(
            F.when(F.col("in_mh") & F.col("in_ex").isNull(), 1).otherwise(0)
        ).alias("only_lsh"),
    )
    return c.select(
        "n_index",
        "n_lsh",
        "n_both",
        "only_index",
        "only_lsh",
        F.expr(
            f"CASE WHEN n_index = 0 THEN NULL"
            f" ELSE (n_both * {MICRO}) div n_index END"
        ).alias("lsh_recall_micro"),
    )
