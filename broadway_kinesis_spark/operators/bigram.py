"""Bigram-LM document scoring — the Markov upgrade of the unigram filter.

``text_unigram_logprob`` (operators/textstats.py) scores documents by
token frequency alone; repetitive junk made of COMMON words sails
through it. The bigram model scores each transition
``ln P(b | a) = ln cnt(a,b) − ln cnt(a,·)`` — natural word ORDER scores
high, shuffled/templated word salad scores low even when every token is
frequent. This is the second model of the CCNet-style quality-filter
ladder (unigram -> n-gram LM) and pairs with ``text_repetition_score``
as the ordering-aware member.

Exactness — the textstats one-transcendental-then-quantize pattern:
``ROUND(LN(cnt)·1e6)`` happens once per DISTINCT corpus count (bigram
and prefix), everything after is exact integer arithmetic (order-free
sums), and one final division with identical expression shape renders
the double. Partial-aggregation order can never flip a ULP across the
hash.

Scale posture: adjacent-pair explode (no shuffle) -> per-(doc, a, b)
counts (the one corpus-sized exchange, map-side combinable) -> the
bigram vocabulary and its prefix marginals both derive from that table
(vocab-sized) -> scoring joins tf back on the bigram key -> one doc_id
rollup. Same two-pass shape as tf-idf/unigram; no all-pairs, no Python.
Documents with fewer than two tokens have no transitions and are
excluded in both engines.

Reference parity: [TGT] — engine extension (SURVEY §2.B text-analysis
family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.operators.textstats import LP_SCALE
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

BLP_MIN = -6.0  # keep iff avg transition log-prob >= this


@query(
    "text_bigram_logprob",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents
    ), bi AS (
        SELECT doc_id, l[CAST(i AS INTEGER)] AS a, l[CAST(i + 1 AS INTEGER)] AS b
        FROM (SELECT doc_id, l, UNNEST(range(1, len(l))) AS i FROM tok)
    ), tf AS (
        SELECT doc_id, a, b, CAST(COUNT(*) AS BIGINT) AS tf
        FROM bi GROUP BY doc_id, a, b
    ), bcnt AS (
        SELECT a, b, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY a, b
    ), pcnt AS (
        SELECT a, CAST(SUM(cnt) AS BIGINT) AS pcnt FROM bcnt GROUP BY a
    ), perdoc AS (
        SELECT tf.doc_id,
               CAST(SUM(tf.tf) AS BIGINT) AS n_bigrams,
               CAST(SUM(tf.tf * (
                   CAST(ROUND(LN(CAST(bcnt.cnt AS DOUBLE)) * {LP_SCALE}) AS BIGINT)
                 - CAST(ROUND(LN(CAST(pcnt.pcnt AS DOUBLE)) * {LP_SCALE}) AS BIGINT)
               )) AS BIGINT) AS s6
        FROM tf
        JOIN bcnt ON tf.a = bcnt.a AND tf.b = bcnt.b
        JOIN pcnt ON tf.a = pcnt.a
        GROUP BY tf.doc_id
    )
    SELECT doc_id, n_bigrams,
           CAST(s6 AS DOUBLE) / (CAST(n_bigrams AS DOUBLE) * {LP_SCALE})
               AS avg_logprob,
           CAST(s6 AS DOUBLE) / (CAST(n_bigrams AS DOUBLE) * {LP_SCALE})
               >= {BLP_MIN} AS keep
    FROM perdoc
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average transition log-probability per document under the corpus's
    own bigram model, micro-nat-quantized; ``keep`` gates at {BLP_MIN}
    avg nats."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.split(F.lower("text"), " ").alias("l"))
    bi = (
        tok.filter(F.size("l") >= 2)
        .selectExpr(
            "doc_id",
            "explode(transform(sequence(0, size(l) - 2),"
            " i -> struct(element_at(l, i + 1) AS a,"
            "             element_at(l, i + 2) AS b))) AS pr",
        )
        .select("doc_id", F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
    )
    tf = bi.groupBy("doc_id", "a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    bcnt = tf.groupBy("a", "b").agg(F.sum("tf").cast("long").alias("cnt"))
    pcnt = bcnt.groupBy("a").agg(F.sum("cnt").cast("long").alias("pcnt"))
    ln6 = lambda c: F.round(  # noqa: E731
        F.ln(c.cast("double")) * F.lit(LP_SCALE)
    ).cast("long")
    perdoc = (
        tf.join(bcnt, ["a", "b"])
        .join(pcnt, "a")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum(
                F.col("tf") * (ln6(F.col("cnt")) - ln6(F.col("pcnt")))
            )
            .cast("long")
            .alias("s6"),
        )
    )
    avg = F.col("s6").cast("double") / (
        F.col("n_bigrams").cast("double") * LP_SCALE
    )
    return perdoc.select(
        "doc_id",
        "n_bigrams",
        avg.alias("avg_logprob"),
        (avg >= BLP_MIN).alias("keep"),
    )
