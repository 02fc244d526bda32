"""Text analysis over `documents` (SURVEY.md §2.B "LLM ops": token counting,
language-ID, quality scoring, document fingerprinting).

Everything is built-ins — split/explode/groupBy, higher-order array
functions, md5 — no Python UDFs, so the whole family stays JVM-side in
whole-stage codegen (modulo higher-order fns) and scales as plain
shuffle-and-agg: one explode + hash-agg for token stats, a broadcast of a
tiny learned profile for lang-ID, and per-row projections for quality /
fingerprints (embarrassingly parallel — no shuffle at all).

Cross-engine exactness notes (driver hashes values):
- token / overlap counts are integers — exact;
- ratios are written with IDENTICAL expression shape in Spark and DuckDB
  SQL, so IEEE float64 evaluation is bit-identical (no rounding needed);
- fingerprints are md5 hex strings (hashlib == Spark md5 == DuckDB md5),
  min over strings = byte-lexicographic in both engines.

Reference parity: the reference processes opaque Kinesis payloads and has no
text operators ([TGT] rows; driver/BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

LANGS = ("de", "en", "es", "fr", "zh")  # argmax cascade order (ties -> first)
PROFILE_K = 10  # words per learned language profile
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")


@query(
    "text_token_stats",
    oracle="""
    SELECT lang,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS total_tokens,
           COUNT(*) / COUNT(DISTINCT doc_id) AS avg_tokens_per_doc,
           COUNT(DISTINCT token) AS distinct_tokens
    FROM (
        SELECT doc_id, lang, UNNEST(string_split(lower(text), ' ')) AS token
        FROM documents
    )
    GROUP BY lang
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token statistics per language: doc counts, token totals,
    tokens/doc, vocabulary size. One explode + one hash-agg; the explode is
    map-side (no shuffle until the agg on `lang`)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("token"))
    return tok.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("total_tokens"),
        (F.count(F.lit(1)) / F.countDistinct("doc_id")).alias("avg_tokens_per_doc"),
        F.countDistinct("token").alias("distinct_tokens"),
    )


# list_intersect is a macro expanding into a lambda, and DuckDB rejects
# subqueries inside lambdas — so profiles are pivoted into one row and
# cross-joined rather than referenced as scalar subqueries.
_SQL_PROF_PIVOT = ", ".join(
    f"MAX(CASE WHEN lang = '{lang}' THEN words END) AS w_{lang}" for lang in LANGS
)
_SQL_LANG_SCORES = ", ".join(
    f"len(list_intersect(toks, w_{lang})) AS s_{lang}" for lang in LANGS
)
_SQL_PRED = "CASE " + " ".join(
    f"WHEN s_{lang} >= GREATEST({', '.join('s_' + o for o in LANGS)}) THEN '{lang}'"
    for lang in LANGS
) + " END"


@query(
    "text_lang_id",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang, UNNEST(string_split(lower(text), ' ')) AS token
        FROM documents
    ), freq AS (
        SELECT lang, token, COUNT(*) AS cnt FROM tok GROUP BY lang, token
    ), topw AS (
        SELECT lang, token FROM (
            SELECT lang, token,
                   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rn
            FROM freq
        ) WHERE rn <= {PROFILE_K}
    ), prof AS (
        SELECT lang, list(token ORDER BY token) AS words FROM topw GROUP BY lang
    ), prof_row AS (
        SELECT {_SQL_PROF_PIVOT} FROM prof
    ), scored AS (
        SELECT doc_id, lang AS true_lang, {_SQL_LANG_SCORES}
        FROM (SELECT doc_id, lang, list_distinct(string_split(lower(text), ' ')) AS toks
              FROM documents) CROSS JOIN prof_row
    )
    SELECT true_lang, pred_lang, COUNT(*) AS n_docs
    FROM (SELECT true_lang, {_SQL_PRED} AS pred_lang FROM scored)
    GROUP BY true_lang, pred_lang
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-profile language ID, trained and applied in one plan: learn the
    top-{PROFILE_K} unigrams per labeled language, score each doc by distinct
    overlap with every profile, predict via fixed-order argmax; output the
    confusion matrix. The learned profile is tiny (langs x {PROFILE_K} words)
    and rides to every executor as a broadcast — the scoring pass is
    shuffle-free."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("token"))
    freq = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("token"))
    prof = (
        freq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PROFILE_K)
        .groupBy("lang")
        .agg(F.sort_array(F.collect_list("token")).alias("words"))
    )
    # pivot the 5 profiles into one broadcastable row of arrays
    prof_row = prof.groupBy().pivot("lang", list(LANGS)).agg(F.first("words"))
    docs = d.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        F.array_distinct(F.split(F.lower("text"), " ")).alias("toks"),
    )
    scored = docs.crossJoin(F.broadcast(prof_row)).select(
        "doc_id",
        "true_lang",
        *[F.size(F.array_intersect("toks", F.col(lang))).alias(f"s_{lang}") for lang in LANGS],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANGS])
    pred = F.when(F.col(f"s_{LANGS[0]}") >= best, F.lit(LANGS[0]))
    for lang in LANGS[1:]:
        pred = pred.when(F.col(f"s_{lang}") >= best, F.lit(lang))
    return (
        scored.select("true_lang", pred.alias("pred_lang"))
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_SQL_STOP = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


#: the full quality-score SELECT — shared verbatim by this operator's
#: oracle and the keep-best cluster-representative oracle
#: (operators/clustering.py), so the two engines' float quality values
#: stay the ONE proven-bitwise-equal formula.
SQL_QUALITY = f"""
    SELECT doc_id, n_tok, avg_tok_len, stop_ratio,
           0.4 * LEAST(1.0, n_tok / 100) + 0.3 * (1.0 - stop_ratio)
               + 0.3 * LEAST(1.0, avg_tok_len / 8) AS quality
    FROM (
        SELECT doc_id,
               len(toks) AS n_tok,
               length(replace(text, ' ', '')) / len(toks) AS avg_tok_len,
               len(list_filter(toks, w -> list_contains({_SQL_STOP}, w))) / len(toks) AS stop_ratio
        FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM documents)
    )
    """


def quality_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tok, avg_tok_len, stop_ratio, quality) over ANY documents
    DataFrame — the one quality formula (SQL twin: ``SQL_QUALITY``), shared
    by ``text_quality_score`` (full corpus) and the keep-best
    cluster-representative operators (clustering.py / composite.py), which
    pass a semi-join-filtered candidate subset so the per-row scoring
    arithmetic is candidate-bounded instead of corpus-wide (Spark's
    semi-join pushdown only crosses trivial alias projections, so the
    bounding must be structural, not left to the optimizer)."""
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    base = docs.select(
        "doc_id", "text", F.split(F.lower("text"), " ").alias("toks")
    ).select(
        "doc_id",
        F.size("toks").alias("n_tok"),
        (F.length(F.regexp_replace("text", " ", "")) / F.size("toks")).alias("avg_tok_len"),
        (
            F.size(F.filter("toks", lambda w: F.array_contains(stop, w))) / F.size("toks")
        ).alias("stop_ratio"),
    )
    quality = (
        F.lit(0.4) * F.least(F.lit(1.0), F.col("n_tok") / 100)
        + F.lit(0.3) * (F.lit(1.0) - F.col("stop_ratio"))
        + F.lit(0.3) * F.least(F.lit(1.0), F.col("avg_tok_len") / 8)
    )
    return base.select("doc_id", "n_tok", "avg_tok_len", "stop_ratio", quality.alias("quality"))


@query("text_quality_score", oracle=SQL_QUALITY)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: token count, mean token length, stopword
    ratio, combined into a [0,1]-ish score. Pure per-row projection — no
    shuffle, fully parallel, pushed into one codegen stage."""
    return quality_scored(load(spark, sf_dir, "documents"))


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           list_min(list_transform(grams, g -> md5(g))) AS fp1,
           list_min(list_transform(grams, g -> md5('2:' || g))) AS fp2
    FROM (
        SELECT doc_id,
               list_transform(range(1, len(words) - 3),
                              i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                   || ' ' || words[i+3] || ' ' || words[i+4]) AS grams
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents)
        WHERE len(words) >= 5
    )
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprint: min-hash over word 5-grams, two
    independent hash families (md5 with distinct salts). Identical fp pairs
    flag near-identical docs; per-row projection, no shuffle."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.lower("text"), " ")
    base = d.select("doc_id", words.alias("words")).filter(F.size("words") >= 5)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ",
        F.element_at("words", i),
        F.element_at("words", i + 1),
        F.element_at("words", i + 2),
        F.element_at("words", i + 3),
        F.element_at("words", i + 4),
    )
    grams = F.transform(F.sequence(F.lit(1), F.size("words") - 4), gram)
    return base.select(
        "doc_id",
        F.array_min(F.transform(grams, lambda g: F.md5(g))).alias("fp1"),
        F.array_min(F.transform(grams, lambda g: F.md5(F.concat(F.lit("2:"), g)))).alias("fp2"),
    )


_BPE_PAT = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@query(
    "text_bpe_tokens",
    oracle=f"""
    SELECT doc_id,
           len(string_split(lower(text), ' ')) AS n_ws_tokens,
           len(regexp_extract_all(lower(text), '{_BPE_PAT}')) AS n_re_tokens,
           length(text) AS n_chars
    FROM documents
    """,
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split vs a BPE-ish regex
    pre-tokenizer (letter runs | digit runs | single punctuation) — the
    standard pre-tokenization step before byte-pair merging. Class-based
    regex chosen to evaluate identically under Java regex and RE2."""
    d = load(spark, sf_dir, "documents")
    low = F.lower("text")
    return d.select(
        "doc_id",
        F.size(F.split(low, " ")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(low, F.lit(_BPE_PAT), F.lit(0))).alias("n_re_tokens"),
        F.length("text").alias("n_chars"),
    )


@query(
    "text_tfidf_topk",
    oracle="""
    WITH tok AS (
        SELECT doc_id, token FROM (
            SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS token
            FROM documents WHERE doc_id < 50
        )
    ), doclen AS (
        SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
    ), tf AS (
        SELECT doc_id, token, COUNT(*) AS tfn FROM tok GROUP BY doc_id, token
    ), df AS (
        SELECT token, COUNT(DISTINCT doc_id) AS dfn FROM tok GROUP BY token
    ), n AS (
        SELECT COUNT(*) AS nd FROM doclen
    )
    SELECT doc_id, token, score FROM (
        SELECT tf.doc_id, tf.token,
               (tf.tfn / doclen.dl) * (n.nd / df.dfn) AS score,
               ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                  ORDER BY (tf.tfn / doclen.dl) * (n.nd / df.dfn) DESC,
                                           tf.token) AS rn
        FROM tf
        JOIN doclen ON tf.doc_id = doclen.doc_id
        JOIN df ON tf.token = df.token
        CROSS JOIN n
    ) WHERE rn <= 5
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with a RATIONAL idf (N/df instead of ln(N/df)): rank-equivalent
    for top-k term extraction and — unlike ln, whose last ULP is libm-
    dependent — exactly reproducible across engines (pure int ratios in
    identical expression order). Two hash-aggs + one broadcast-sized df join;
    the document-frequency table is the only corpus-global state and is tiny
    (vocabulary-sized). The corpus size N enters the plan as a broadcast
    1-row aggregate cross-join (like the oracle's CROSS JOIN n) — NOT a
    driver-side .count(), so constructing this DataFrame launches no jobs
    and N is computed in the same distributed pass as everything else."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    tok = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token"))
    doclen = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tfn"))
    df_t = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("dfn"))
    n = doclen.agg(F.count(F.lit(1)).alias("nd"))  # 1-row corpus size, stays in-plan
    scored = (
        tf.join(doclen, "doc_id")
        .join(F.broadcast(df_t), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            ((F.col("tfn") / F.col("dl")) * (F.col("nd") / F.col("dfn"))).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5).drop("rn")


VOCAB_K = 100


@query(
    "text_vocab_topk",
    oracle=f"""
    SELECT token, df, tf FROM (
        SELECT token, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf,
               ROW_NUMBER() OVER (ORDER BY COUNT(DISTINCT doc_id) DESC,
                                           COUNT(*) DESC, token) AS rn
        FROM (
            SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS token
            FROM documents
        )
        GROUP BY token
    ) WHERE rn <= {VOCAB_K}
    """,
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary extraction: top-{VOCAB_K} tokens by document frequency
    (ties: term frequency desc, then token) — the tokenizer-training /
    stopword-mining primitive. One explode + one hash-agg keyed by token
    (map-side combinable), then a global top-k over |vocabulary| rows —
    at 100 TB the agg output is vocabulary-sized, so the final ordering
    is trivial regardless of corpus size."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token"))
    counts = tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df"), F.count(F.lit(1)).alias("tf")
    )
    w = Window.orderBy(F.desc("df"), F.desc("tf"), F.asc("token"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= VOCAB_K)
        .drop("rn")
    )
