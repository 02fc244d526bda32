"""BPE tokenizer TRAINING — learn the merge table over a corpus.

``text_bpe_tokens`` (textops.py:241) stops at pre-tokenization; this is
the missing training stage (Sennrich et al. 2016): starting from words as
character sequences, repeatedly count adjacent symbol pairs (weighted by
word frequency), merge the most frequent pair everywhere, and record the
merge — the 4th iterative algorithm in the engine after k-means /
connected components / PageRank.

Distribution shape: after ONE corpus pass (pre-tokenize + word-frequency
groupBy) every round operates on the VOCABULARY table (distinct words +
freqs), which is orders of magnitude smaller than the corpus — exactly
why BPE training scales. Each round is: one vocab-sized pair-count
aggregation (map-side combinable), a 1-ROW top-1 collect (TakeOrdered,
the same bounded-collect pruning mechanism as the k-means centroid
collect), and a merge projection. No window, no join, no cartesian — the
chosen rule is inlined as literals, keeping the plan LINEAR across
rounds instead of doubling per round.

Merge application is a left-to-right FOLD over the symbol ARRAY
(``F.aggregate`` in Spark, ``list_reduce`` in DuckDB): append each
symbol, except when the accumulator's last element is A and the incoming
symbol is B — then pop-and-concat. This reproduces BPE's leftmost
non-overlapping merge order exactly (after a merge the last element
becomes ``A||B != A``, so an overlap can never double-fire). A flat
string ``replace(s, 'A B', 'AB')`` does NOT work once merged symbols are
multi-character: the pattern can match A followed by a symbol that
merely STARTS with B (``"b an an a"`` merging (an, a) corrupts to
``[b, anan, a]``) — caught by the pure-Python reference test.

Determinism: ties on pair count break lexicographically (count DESC,
left ASC, right ASC) in both engines.

Reference parity: [TGT] — no relational surface in the reference; engine
extension beyond it (SURVEY §2.B text-analysis family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from broadway_kinesis_spark.operators.textops import _BPE_PAT
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

N_MERGES = 8  # unrolled merge rounds

_OUT_SCHEMA = StructType(
    [
        StructField("merge_rank", IntegerType(), False),
        StructField("left_sym", StringType(), False),
        StructField("right_sym", StringType(), False),
        StructField("pair_count", LongType(), False),
    ]
)


def _pairs(w: DataFrame) -> DataFrame:
    """Adjacent symbol pairs of every vocab word, weighted by word freq.
    Words with a single symbol left contribute nothing (guarded: Spark's
    ``sequence(0, -1)`` would otherwise produce a DESCENDING sequence)."""
    return (
        w.filter(F.size("l") >= 2)
        .selectExpr(
            "freq",
            "explode(transform(sequence(0, size(l) - 2),"
            " i -> struct(element_at(l, i + 1) AS a,"
            "             element_at(l, i + 2) AS b))) AS pr",
        )
        .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def _merge_fold(a: str, b: str):
    """Left-to-right non-overlapping application of merge rule (a, b) to
    the symbol array column ``l``. ``F.get`` is out-of-bounds-NULL-safe, so
    the empty initial accumulator falls through to the append branch."""
    return F.aggregate(
        F.col("l"),
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == a) & (x == b),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _oracle_sql() -> str:
    """Unrolled-CTE oracle: w{r} CTEs mirror the round-by-round merge.
    ``list_reduce`` over the symbol-singleton lists seeds the accumulator
    with the first symbol (same result as Spark's empty-seed fold); the
    merge rule arrives as correlated columns from ``m{r}`` via
    LEFT JOIN ON TRUE, which also keeps w{r} intact if a round runs dry."""
    parts = [
        f"""
    WITH tok AS (
        SELECT UNNEST(regexp_extract_all(lower(text), '{_BPE_PAT}')) AS word
        FROM documents
    ), w0 AS (
        SELECT string_split(word, '') AS l,
               CAST(COUNT(*) AS BIGINT) AS freq
        FROM tok GROUP BY word
    )"""
    ]
    for r in range(1, N_MERGES + 1):
        parts.append(
            f""", p{r} AS (
        SELECT l[CAST(i AS INTEGER)] AS a, l[CAST(i + 1 AS INTEGER)] AS b,
               CAST(SUM(freq) AS BIGINT) AS cnt
        FROM (
            SELECT l, freq, UNNEST(range(1, len(l))) AS i FROM w{r - 1}
        ) GROUP BY a, b
    ), m{r} AS (
        SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1
    ), w{r} AS (
        SELECT list_reduce(
                   list_transform(w.l, s -> [s]),
                   (acc, x) -> CASE WHEN acc[-1] = m.a AND x[1] = m.b
                               THEN acc[1:len(acc) - 1] || [acc[-1] || x[1]]
                               ELSE acc || x END
               ) AS l,
               w.freq
        FROM w{r - 1} w LEFT JOIN m{r} m ON TRUE
    )"""
        )
    selects = "\n    UNION ALL ".join(
        f"SELECT {r} AS merge_rank, a AS left_sym, b AS right_sym,"
        f" cnt AS pair_count FROM m{r}"
        for r in range(1, N_MERGES + 1)
    )
    parts.append(f"\n    {selects}")
    return "".join(parts)


@query("text_bpe_train", oracle=_oracle_sql())
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the top-{N_MERGES} BPE merge table over `documents`: per round
    the most frequent adjacent symbol pair (freq-weighted, lexicographic
    tie-break) with its count at merge time."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(_BPE_PAT), F.lit(0))
        ).alias("word")
    )
    # The one corpus-sized pass; everything after is vocab-sized, so cache
    # the vocab table to stop each round's lineage at this point.
    w = (
        tok.groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .select(F.split("word", "").alias("l"), "freq")
        .cache()
    )
    merges: list[tuple[int, str, str, int]] = []
    cached = [w]
    for r in range(1, N_MERGES + 1):
        top = _pairs(w).orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
        if not top:
            break
        a, b, cnt = top[0].a, top[0].b, top[0].cnt
        merges.append((r, a, b, cnt))
        w = w.select(_merge_fold(a, b).alias("l"), "freq").cache()
        cached.append(w)
    # the result is a literal table; the vocab caches were intra-call only
    for df in cached:
        df.unpersist()
    return spark.createDataFrame(merges, _OUT_SCHEMA)
