"""Training-data pipeline operators (round 3): decontamination, sequence
packing, repetition filtering, distribution histograms, embedding
quantization.

These are the remaining first-class stages of a large-scale LLM data
pipeline that SURVEY.md §2.B did not yet cover individually:

- ``dedup_decontaminate`` — benchmark decontamination: drop/flag corpus
  documents that share any word 8-gram with a held-out evaluation set
  (the standard test-set-contamination guard applied before training).
- ``pack_sequences`` — concat-then-chunk sequence packing: assign documents
  to fixed-token-budget context windows per (lang, shard), the batch-prep
  step between cleaning and tokenization.
- ``text_repetition_score`` — Gopher-style repetition quality gates:
  distinct-token ratio, top-token fraction, duplicate-3-gram fraction.
- ``agg_histogram`` — fixed-width histogram of a numeric column per group,
  the basic distribution-analysis primitive.
- ``similarity_quantize_int8`` — symmetric per-vector int8 quantization of
  embeddings (the storage/serving compression step for ANN indexes).

All five are pure built-ins (no Python UDFs) and keep the driver-hash
exactness rules: integer outputs wherever possible; the only float columns
are either copied unmodified from storage (exact) or written with an
IDENTICAL expression shape in Spark and DuckDB so IEEE evaluation is
bit-identical.

Reference parity: [TGT] rows — the reference is a Kinesis source connector
(`lib/broadway_kinesis/subscribe_to_shard.ex`) with no data-processing
surface; these operators come from the BASELINE.json north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load, spread_small_scan

# --- dedup_decontaminate ---------------------------------------------------

NGRAM = 8  # word n-gram length for contamination matching
BENCH_CUT = 50  # doc_id < BENCH_CUT is the held-out benchmark set


def _word_ngrams(df: DataFrame, n: int) -> DataFrame:
    """(doc_id, gram) pairs: word n-grams of lower(text), docs >= n words."""
    words = F.split(F.lower("text"), " ")
    base = df.select("doc_id", words.alias("words")).filter(F.size("words") >= n)
    gram = F.concat_ws(
        " ", *[F.element_at("words", F.col("i") + j) for j in range(n)]
    )
    return (
        base.select(
            "doc_id", F.explode(F.sequence(F.lit(1), F.size("words") - (n - 1))).alias("i"), "words"
        )
        .select("doc_id", gram.alias("gram"))
    )


_SQL_GRAM = " || ' ' || ".join(f"words[i+{j}]" if j else "words[i]" for j in range(NGRAM))


@query(
    "dedup_decontaminate",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents
    ), g AS (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(words) - {NGRAM - 2}),
                                     i -> {_SQL_GRAM})) AS gram
        FROM w WHERE len(words) >= {NGRAM}
    ), bench AS (
        SELECT DISTINCT gram FROM g WHERE doc_id < {BENCH_CUT}
    ), corp AS (
        SELECT DISTINCT doc_id, gram FROM g WHERE doc_id >= {BENCH_CUT}
    ), hits AS (
        SELECT doc_id, COUNT(*) AS n_shared_grams
        FROM corp JOIN bench USING (gram) GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_shared_grams, 0) AS n_shared_grams,
           COALESCE(h.n_shared_grams, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id >= {BENCH_CUT}) d
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
)
def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every corpus document (doc_id >=
    {BENCH_CUT}) sharing at least one word {NGRAM}-gram with the held-out
    benchmark set (doc_id < {BENCH_CUT}); output per-doc shared-gram counts
    plus the contamination flag.

    Scale shape: the benchmark side is tiny relative to the corpus (eval
    sets are KBs against TBs), so its distinct-gram set is BROADCAST and
    the contamination probe is a map-side broadcast join over the exploded
    corpus grams — the only shuffle is the per-doc count keyed by doc_id
    (map-side combinable). Never an all-pairs document comparison.
    """
    d = load(spark, sf_dir, "documents")
    # Spread the corpus-side scan before the n-gram explode (round 13):
    # the stride-1 8-gram projection is the query's dominant compute and a
    # single-row-group fixture runs it on one task. No-op at scale (the
    # guard estimates scan splits from source bytes). The benchmark side
    # stays unspread — it is BENCH_CUT docs by construction.
    corpus_docs = spread_small_scan(
        d.select("doc_id", "text").filter(F.col("doc_id") >= BENCH_CUT),
        sf_dir,
        ("documents",),
        "doc_id",
    )
    bench_grams = (
        _word_ngrams(d.filter(F.col("doc_id") < BENCH_CUT), NGRAM)
        .select("gram")
        .distinct()
    )
    # Broadcast-probe BEFORE the distinct (round 13, guide §2.3): the
    # benchmark set matches a tiny fraction of corpus grams, so filtering
    # map-side first means only HITS reach the (doc_id, gram) dedup
    # exchange — the full-corpus gram stream never shuffles. Join-then-
    # distinct == distinct-then-join here because each (doc_id, gram) row
    # matches at most one row of the distinct benchmark gram set.
    corp_grams = _word_ngrams(corpus_docs, NGRAM)
    hits = (
        corp_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_shared_grams"))
    )
    corpus = d.filter(F.col("doc_id") >= BENCH_CUT).select("doc_id")
    n_shared = F.coalesce(F.col("n_shared_grams"), F.lit(0).cast("long"))
    return corpus.join(hits, "doc_id", "left").select(
        "doc_id",
        n_shared.alias("n_shared_grams"),
        (n_shared > 0).alias("contaminated"),
    )


# --- pack_sequences --------------------------------------------------------

PACK_BUDGET = 512  # tokens per context window
PACK_SHARDS = 4  # md5 shards per lang — bounds any single packing partition

_SQL_SHARD = f"('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % {PACK_SHARDS}"


@query(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, {_SQL_SHARD} AS shard,
               len(string_split(lower(text), ' ')) AS n_tok
        FROM documents
    ), c AS (
        SELECT lang, shard, n_tok,
               SUM(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM t
    )
    SELECT lang, shard, CAST((cum - n_tok) // {PACK_BUDGET} AS BIGINT) AS chunk_id,
           COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS chunk_tokens
    FROM c
    GROUP BY lang, shard, chunk_id
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing: within each (lang, md5-shard)
    stream, documents are laid end-to-end in doc_id order and each doc is
    assigned to the {PACK_BUDGET}-token context window its first token
    lands in; output per-window doc counts and token totals. All-integer —
    hash-exact.

    Scale shape: packing is sequential by nature, so the operator bounds
    the sequential unit — the running sum runs per (lang, shard) where
    shard is a deterministic md5 bucket, giving {PACK_SHARDS}x-per-lang
    parallelism that scales by raising PACK_SHARDS (shards are independent
    training streams, the standard sharded-corpus layout). One shuffle on
    the window key, then a map-side-combinable agg on the same key — AQE
    sees co-partitioned exchanges and elides the second shuffle.
    """
    d = load(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % PACK_SHARDS
    )
    t = d.select(
        "doc_id",
        "lang",
        shard.alias("shard"),
        F.size(F.split(F.lower("text"), " ")).alias("n_tok"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tok").over(w))
    # Spark `div` is the same truncating integer division as DuckDB's `//`
    # for the non-negative operands here (cum >= n_tok, both positive).
    chunk = F.expr(f"(cum - n_tok) div {PACK_BUDGET}")
    return (
        c.select("lang", "shard", chunk.alias("chunk_id"), "n_tok")
        .groupBy("lang", "shard", "chunk_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("chunk_tokens"))
    )


# --- text_repetition_score -------------------------------------------------

TOP_TOK_MAX = 0.20  # keep iff most-frequent token <= 20% of tokens
DUP3_MAX = 0.80  # keep iff <= 80% of 3-grams are repeats
DISTINCT_MIN = 0.30  # keep iff >= 30% of tokens are distinct

_SQL_GRAM3 = "words[i] || ' ' || words[i+1] || ' ' || words[i+2]"


@query(
    "text_repetition_score",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents
    ), row_stats AS (
        SELECT doc_id,
               len(words) AS n_tok,
               len(list_distinct(words)) AS distinct_tok,
               CASE WHEN len(words) >= 3 THEN
                   list_transform(range(1, len(words) - 1), i -> {_SQL_GRAM3})
               END AS grams
        FROM w
    ), tok AS (
        SELECT doc_id, UNNEST(words) AS token FROM w
    ), top AS (
        SELECT doc_id, MAX(cnt) AS top_cnt FROM (
            SELECT doc_id, token, COUNT(*) AS cnt FROM tok GROUP BY doc_id, token
        ) GROUP BY doc_id
    )
    SELECT doc_id, n_tok,
           distinct_ratio, top_tok_frac, dup3_frac,
           (top_tok_frac <= {TOP_TOK_MAX} AND dup3_frac <= {DUP3_MAX}
            AND distinct_ratio >= {DISTINCT_MIN}) AS keep
    FROM (
        SELECT r.doc_id, r.n_tok,
               r.distinct_tok / r.n_tok AS distinct_ratio,
               t.top_cnt / r.n_tok AS top_tok_frac,
               CASE WHEN r.grams IS NULL THEN 0.0
                    ELSE 1.0 - len(list_distinct(r.grams)) / len(r.grams)
               END AS dup3_frac
        FROM row_stats r JOIN top t ON r.doc_id = t.doc_id
    )
    """,
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality gates (Gopher-style): per-document
    distinct-token ratio, most-frequent-token fraction, and duplicate
    3-gram fraction, combined into a keep/drop flag. Ratios are written
    with the identical expression shape in both engines (int/int -> IEEE
    double), so no rounding is needed.

    Scale shape: distinct-token and 3-gram stats are PER-ROW array
    projections (no shuffle); the top-token count is the only shuffled
    piece — a two-level agg keyed by doc_id (map-side combinable), joined
    back co-partitioned on doc_id.
    """
    d = spread_small_scan(
        load(spark, sf_dir, "documents").select("doc_id", "text"),
        sf_dir,
        ("documents",),
        "doc_id",
    )
    words = F.split(F.lower("text"), " ")
    gram = F.concat_ws(
        " ",
        F.element_at("words", F.col("i")),
        F.element_at("words", F.col("i") + 1),
        F.element_at("words", F.col("i") + 2),
    )
    row_stats = (
        d.select("doc_id", words.alias("words"))
        .withColumn(
            "grams",
            F.when(
                F.size("words") >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.size("words") - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("words", i),
                        F.element_at("words", i + 1),
                        F.element_at("words", i + 2),
                    ),
                ),
            ),
        )
        .select(
            "doc_id",
            F.size("words").alias("n_tok"),
            F.size(F.array_distinct("words")).alias("distinct_tok"),
            # dup3 is computed BEFORE the doc_id join (round 13, guide
            # §2.3): the grams array is ~n_tok strings per row, and
            # carrying it through the exchange shipped the whole 3-gram
            # expansion just to reduce it to one double on the far side.
            # Project the scalar here; only scalars cross the shuffle.
            F.when(F.col("grams").isNull(), F.lit(0.0))
            .otherwise(
                F.lit(1.0) - F.size(F.array_distinct("grams")) / F.size("grams")
            )
            .alias("dup3_frac"),
        )
    )
    tok = d.select("doc_id", F.explode(words).alias("token"))
    top = (
        tok.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_cnt"))
    )
    j = row_stats.join(top, "doc_id")
    distinct_ratio = F.col("distinct_tok") / F.col("n_tok")
    top_frac = F.col("top_cnt") / F.col("n_tok")
    out = j.select(
        "doc_id",
        "n_tok",
        distinct_ratio.alias("distinct_ratio"),
        top_frac.alias("top_tok_frac"),
        "dup3_frac",
    )
    keep = (
        (F.col("top_tok_frac") <= TOP_TOK_MAX)
        & (F.col("dup3_frac") <= DUP3_MAX)
        & (F.col("distinct_ratio") >= DISTINCT_MIN)
    )
    return out.withColumn("keep", keep)


# --- agg_histogram ---------------------------------------------------------

BIN_WIDTH = 50  # histogram bin width over events.value


@query(
    "agg_histogram",
    oracle=f"""
    SELECT event_type,
           CAST(FLOOR(value / {BIN_WIDTH}) AS BIGINT) AS bin,
           CAST(FLOOR(value / {BIN_WIDTH}) AS BIGINT) * {BIN_WIDTH} AS bin_lo,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of events.value per event_type — the
    distribution-analysis primitive behind outlier trimming and quality
    dashboards. Bin assignment is a per-row projection (value/width is the
    identical IEEE division in both engines; floor of it is exact), the
    aggregation is a map-side-combinable count keyed by (event_type, bin)
    — histogram output is bins-sized, independent of corpus size.
    """
    e = load(spark, sf_dir, "events")
    b = F.floor(F.col("value") / BIN_WIDTH).cast("long")
    return (
        e.select("event_type", b.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "bin",
            (F.col("bin") * BIN_WIDTH).alias("bin_lo"),
            "n",
        )
    )


# --- similarity_quantize_int8 ----------------------------------------------


@query(
    "similarity_quantize_int8",
    oracle="""
    SELECT vec_id, max_abs,
           array_to_string(
               list_transform(emb, x -> CAST(FLOOR((x * 127.0) / den + 0.5)
                                              AS BIGINT)),
               ',') AS q_csv
    FROM (
        SELECT vec_id, max_abs,
               CASE WHEN max_abs = 0 THEN 1.0 ELSE max_abs END AS den, emb
        FROM (
            SELECT vec_id,
                   list_max(list_transform(emb, x -> abs(x))) AS max_abs, emb
            FROM (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                FROM embeddings
            )
        )
    )
    """,
)
def similarity_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of embeddings: q_i =
    round(x_i * 127 / max|x|), emitted as a CSV string of ints (the driver
    canon rejects array cells) beside the float scale numerator.
    Exactness: max_abs is |float32| cast to double (no arithmetic — exact);
    the quantized ints use the same literal expression (x*127.0)/den + 0.5
    floored in both engines, so IEEE evaluation is bit-identical and the
    half-up rounding is engine-independent (unlike round(), whose half-even
    vs half-away behavior differs across engines).

    Scale shape: pure per-row projection — no shuffle, no state; at 100 TB
    this runs embarrassingly parallel inside the scan stage and composes
    with a partitioned write of the quantized index.
    """
    e = load(spark, sf_dir, "embeddings")
    emb = F.transform("embedding", lambda x: x.cast("double"))
    base = e.select(
        "vec_id",
        emb.alias("emb"),
    ).select(
        "vec_id",
        F.array_max(F.transform("emb", lambda x: F.abs(x))).alias("max_abs"),
        "emb",
    )
    den = F.when(F.col("max_abs") == 0, F.lit(1.0)).otherwise(F.col("max_abs"))
    q = F.transform(
        "emb",
        lambda x: F.floor((x * F.lit(127.0)) / F.col("den") + F.lit(0.5)).cast("long"),
    )
    return (
        base.withColumn("den", den)
        .select(
            "vec_id",
            "max_abs",
            F.array_join(q, ",").alias("q_csv"),
        )
    )
