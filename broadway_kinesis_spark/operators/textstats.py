"""Corpus-relative text quality: vocabulary-coverage and unigram-LM scoring.

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

LP_SCALE = 1_000_000.0  # per-token log-probs quantized to micro-nats
LP_MIN = -8.0  # keep iff avg token log-prob >= this (perplexity <= e^8)


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


@query(
    "text_unigram_logprob",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS token
              FROM documents)
        GROUP BY doc_id, token
    ), cnt AS (
        SELECT token, SUM(tf) AS cnt FROM tf GROUP BY token
    ), tot AS (
        SELECT CAST(ROUND(LN(CAST(SUM(cnt) AS DOUBLE)) * {LP_SCALE}) AS BIGINT)
                   AS ln_n6
        FROM cnt
    ), perdoc AS (
        SELECT tf.doc_id,
               CAST(SUM(tf.tf) AS BIGINT) AS n_tok,
               CAST(SUM(tf.tf * CAST(ROUND(LN(CAST(cnt.cnt AS DOUBLE)) * {LP_SCALE})
                                     AS BIGINT)) AS BIGINT) AS s6
        FROM tf JOIN cnt USING (token)
        GROUP BY tf.doc_id
    )
    SELECT doc_id, n_tok,
           CAST(s6 - n_tok * ln_n6 AS DOUBLE)
               / (CAST(n_tok AS DOUBLE) * {LP_SCALE}) AS avg_logprob,
           CAST(s6 - n_tok * ln_n6 AS DOUBLE)
               / (CAST(n_tok AS DOUBLE) * {LP_SCALE}) >= {LP_MIN} AS keep
    FROM perdoc, tot
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM document scoring (the classic perplexity-proxy quality
    filter, CCNet/Gopher family): train a unigram language model on the
    corpus itself — P(t) = cnt(t)/N — then score each document by its
    average token log-probability. Natural prose made of common words
    scores high; rare-token noise scores low; ``keep`` gates at
    {LP_MIN} avg nats (perplexity e^{{{-LP_MIN}}}).

    Exactness: per-token log-probs are quantized ONCE to integer
    micro-nats — ``ROUND(LN(cnt) * 1e6)`` is a single transcendental per
    DISTINCT corpus count, identical in both engines — and everything
    after that is exact integer arithmetic (order-free sums), ending in
    one final float division with identical expression shape. Summation
    order can therefore never flip a ULP across the hash, which a naive
    ``SUM(LN(...))`` could.

    Scale posture: token stream shuffles once into per-(doc, token) tf;
    the vocabulary table derives from tf (map-side-combinable); scoring
    joins tf back to vocab on token — broadcastable when the vocab is
    capped, plain equi-join otherwise — then one doc_id rollup. The
    corpus total rides in as a broadcast single-row cross join. Same
    two-pass shape as tf-idf: no all-pairs, no driver-side state."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    cnt = tf.groupBy("token").agg(F.sum("tf").alias("cnt"))
    lp6 = F.round(F.ln(F.col("cnt").cast("double")) * F.lit(LP_SCALE)).cast("long")
    # Corpus total straight off the documents scan (size of the split array
    # == token count) — a shuffle-free projection instead of a third
    # recomputation of the exploded-token subtree.
    tot = docs.select(
        F.size(F.split(F.lower("text"), " ")).cast("long").alias("nt")
    ).agg(
        F.round(F.ln(F.sum("nt").cast("double")) * F.lit(LP_SCALE))
        .cast("long")
        .alias("ln_n6")
    )
    perdoc = (
        tf.join(cnt.withColumn("lp6", lp6).drop("cnt"), "token")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tok"),
            F.sum(F.col("tf") * F.col("lp6")).cast("long").alias("s6"),
        )
    )
    score = F.col("s6") - F.col("n_tok") * F.col("ln_n6")
    avg = score.cast("double") / (F.col("n_tok").cast("double") * F.lit(LP_SCALE))
    return perdoc.crossJoin(F.broadcast(tot)).select(
        "doc_id", "n_tok", avg.alias("avg_logprob"), (avg >= LP_MIN).alias("keep")
    )
