"""Corpus-relative text quality: vocabulary-coverage scoring.

A standard corpus-filter heuristic (C4/Gopher family): score each document
by the fraction of its tokens that fall inside the corpus' top-K most
frequent tokens. Natural prose sits high (function words dominate);
boilerplate, code dumps, and non-linguistic noise sit low. Unlike the
per-document gates in ``text_repetition_score`` (which see one document at
a time), this score is CORPUS-RELATIVE — the reference vocabulary is
computed from the data itself, the same two-pass shape as tf-idf but
producing a document-level keep signal rather than per-term weights.

Exactness: everything is integer until the single final division (count of
covered tokens / token count — exact int-to-double division, IEEE-identical
in both engines). The top-K vocabulary breaks count ties on the token
string, so the reference set is bit-identical across engines.

Scale posture: pass 1 is a map-side-combinable token count + a top-K that
Catalyst rewrites via limit-pushdown-through-window into
``TakeOrderedAndProject`` (each partition forwards at most K rows; the
"single-partition window" the naive plan would run operates on K rows
total — pinned in tests/test_plans.py); the K-row vocabulary then
BROADCASTS onto the token stream — the per-document pass never shuffles
tokens again, and the only full exchange keys on doc_id for the per-doc
rollup. At 100 TB the vocabulary is computed once per corpus snapshot and
reused across every downstream filter run, exactly like the persisted ANN
index (operators/ann_persist.py) — the in-plan form here keeps the query
self-contained and oracle-checkable.

Reference parity: [TGT] — no text surface in the reference; engine
extension beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

VOCAB_K = 100  # reference vocabulary size
COVER_MIN = 0.5  # keep iff >= half the tokens are in-vocabulary


@query(
    "text_vocab_coverage",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS token
        FROM documents
    ), vocab AS (
        SELECT token FROM (
            SELECT token, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rn
            FROM tok GROUP BY token
        ) WHERE rn <= {VOCAB_K}
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           CAST(SUM(CASE WHEN v.token IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS in_vocab,
           CAST(SUM(CASE WHEN v.token IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS coverage,
           CAST(SUM(CASE WHEN v.token IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) >= {COVER_MIN} AS keep
    FROM tok LEFT JOIN vocab v USING (token)
    GROUP BY doc_id
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{VOCAB_K} corpus vocabulary (count-desc, token tiebreak), then
    per-document coverage = in-vocabulary tokens / all tokens, with the
    keep flag at {COVER_MIN}. Tokens with repetition count on both sides
    (a document using 'the' five times has five chances to be covered) —
    the fraction is over the token STREAM, matching how filter pipelines
    meter it."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= VOCAB_K)
        .select("token", F.lit(1).alias("hit"))
    )
    covered = F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long")
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            covered.alias("in_vocab"),
        )
        .select(
            "doc_id",
            "n_tok",
            "in_vocab",
            (F.col("in_vocab").cast("double") / F.col("n_tok")).alias("coverage"),
            (
                F.col("in_vocab").cast("double") / F.col("n_tok") >= COVER_MIN
            ).alias("keep"),
        )
    )
