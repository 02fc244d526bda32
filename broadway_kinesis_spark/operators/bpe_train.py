"""BPE tokenizer TRAINING and ENCODING — learn a merge table, apply it.

``text_bpe_tokens`` (textops.py:241) stops at pre-tokenization; this is
the missing training stage (Sennrich et al. 2016): starting from words as
character sequences, repeatedly count adjacent symbol pairs (weighted by
word frequency), merge the most frequent pair everywhere, and record the
merge — the 4th iterative algorithm in the engine after k-means /
connected components / PageRank. ``text_bpe_encode`` then closes the
tokenizer lifecycle: apply the learned table to the corpus and report
per-document token counts (the number a packing/costing stage consumes).

Distribution shape: after ONE corpus pass (pre-tokenize + word-frequency
groupBy) everything operates on the VOCABULARY (distinct words + freqs),
which is orders of magnitude smaller than the corpus — exactly why BPE
training scales. The merge loop itself is inherently SEQUENTIAL in
merges, so it runs driver-side over the collected vocabulary with
incremental pair-count bookkeeping (VERDICT r7 #4 — the earlier
round-per-merge Spark top-1 was one driver round-trip per merge, 32 k
sequential jobs at production vocab): one Spark job total for training,
O(affected words) per merge after. Encoding applies the fold chain to
the DISTINCT vocabulary once and joins symbol counts back to per-doc
word counts — the corpus is never re-folded per rule.

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


def _merge_fold(a: str, b: str, col: str = "l"):
    """Left-to-right non-overlapping application of merge rule (a, b) to
    the symbol array column ``col``. ``F.get`` is out-of-bounds-NULL-safe,
    so the empty initial accumulator falls through to the append branch."""
    return F.aggregate(
        F.col(col),
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == a) & (x == b),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _merge_loop(
    words: list[tuple[list[str], int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Driver-side Sennrich-style trainer with INCREMENTAL pair counts:
    one full scan seeds (pair -> weighted count) and (pair -> words
    containing it); each round picks the best pair (count DESC, pair ASC
    — the identical tie-break as the Spark/DuckDB forms), re-folds only
    the words that CONTAIN the pair, and diffs their pair multisets into
    the running counts. Per-round cost is O(affected words) + one pass
    over live distinct pairs for the argmin, instead of a full corpus
    fold — the standard public BPE-trainer bookkeeping. Bitwise-equal to
    the naive recount (tests/test_round6_ops._bpe_reference)."""
    from collections import Counter

    def word_pairs(syms: list[str]) -> Counter:
        return Counter(zip(syms, syms[1:]))

    counts: Counter = Counter()
    occur: dict[tuple[str, str], set[int]] = {}
    per_word: list[Counter] = []
    for idx, (syms, freq) in enumerate(words):
        wp = word_pairs(syms)
        per_word.append(wp)
        for p, k in wp.items():
            counts[p] += k * freq
            occur.setdefault(p, set()).add(idx)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = None
        for p, c in counts.items():
            if c > 0 and (best is None or (-c, p) < best[0]):
                best = ((-c, p), p, c)
        if best is None:
            break
        _, (a, b), cnt = best
        merges.append((rank, a, b, cnt))
        ab = a + b
        for idx in list(occur.get((a, b), ())):
            syms, freq = words[idx]
            out: list[str] = []
            i, n = 0, len(syms)
            while i < n:  # leftmost non-overlapping, same as the fold
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            old, new = per_word[idx], word_pairs(out)
            words[idx] = (out, freq)
            per_word[idx] = new
            for p in old.keys() | new.keys():
                d = new.get(p, 0) - old.get(p, 0)
                if d:
                    counts[p] += d * freq
                if new.get(p, 0):
                    occur.setdefault(p, set()).add(idx)
                elif p in occur:
                    occur[p].discard(idx)
        # merged neighbours fuse into ab != a, so (a, b) can never reappear
        counts.pop((a, b), None)
        occur.pop((a, b), None)
    return merges


def learn_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> list[tuple[int, str, str, int]]:
    """Run the training loop; returns [(rank, left, right, pair_count)].

    ONE corpus-sized Spark pass (pre-tokenize + word-frequency groupBy),
    ONE vocab-sized collect, then the merge loop runs driver-side in pure
    Python (VERDICT r7 #4): the loop is inherently sequential in merges,
    so the earlier per-round Spark top-1 meant one driver round-trip PER
    MERGE — 8 jobs at the registered N_MERGES, but 32 k sequential jobs
    at a production vocabulary. The pair-count state is vocab-sized
    either way; collecting the vocabulary once moves the sequential part
    where sequential work belongs. The pick rule (count DESC, pair ASC
    over code points = UTF-8 byte order) and the leftmost non-overlapping
    application are bitwise-identical to the per-round Spark form, so
    both registered oracles are unchanged. At 100 TB the corpus pass and
    the collect bound memory by DISTINCT word types, not corpus size;
    a vocabulary too large to collect caps itself with a min-frequency
    gate upstream (standard practice), not a distributed merge loop."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(_BPE_PAT), F.lit(0))
        ).alias("word")
    )
    vocab = (
        tok.groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .collect()
    )
    return _merge_loop([(list(r.word), int(r.freq)) for r in vocab], n_merges)


# --------------------------------------------------------------- oracle SQL


def _training_ctes() -> str:
    """The shared WITH-chain: tok -> w0 -> (p{r}, m{r}, w{r})* — reused by
    both queries' oracles. ``list_reduce`` over the symbol-singleton lists
    seeds the accumulator with the first symbol (same result as Spark's
    empty-seed fold); the merge rule arrives as correlated columns from
    ``m{r}`` via LEFT JOIN ON TRUE, which also keeps w{r} intact if a
    round runs dry."""
    parts = [
        f"""tok AS (
        SELECT doc_id,
               UNNEST(regexp_extract_all(lower(text), '{_BPE_PAT}')) AS word
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
    return "".join(parts)


def _train_oracle() -> str:
    selects = "\n    UNION ALL ".join(
        f"SELECT {r} AS merge_rank, a AS left_sym, b AS right_sym,"
        f" cnt AS pair_count FROM m{r}"
        for r in range(1, N_MERGES + 1)
    )
    return f"\n    WITH {_training_ctes()}\n    {selects}"


def _encode_oracle() -> str:
    parts = [
        f"\n    WITH {_training_ctes()}",
        """, per AS (
        SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM tok GROUP BY doc_id, word
    ), v0 AS (
        SELECT word, string_split(word, '') AS l
        FROM (SELECT DISTINCT word FROM tok)
    )""",
    ]
    for r in range(1, N_MERGES + 1):
        parts.append(
            f""", v{r} AS (
        SELECT v.word,
               list_reduce(
                   list_transform(v.l, s -> [s]),
                   (acc, x) -> CASE WHEN acc[-1] = m.a AND x[1] = m.b
                               THEN acc[1:len(acc) - 1] || [acc[-1] || x[1]]
                               ELSE acc || x END
               ) AS l
        FROM v{r - 1} v LEFT JOIN m{r} m ON TRUE
    )"""
        )
    parts.append(
        f""", syms AS (
        SELECT word, CAST(len(l) AS BIGINT) AS n_syms FROM v{N_MERGES}
    )
    SELECT per.doc_id,
           CAST(SUM(per.cnt) AS BIGINT) AS n_words,
           CAST(SUM(per.cnt * syms.n_syms) AS BIGINT) AS n_bpe_tokens
    FROM per JOIN syms ON per.word = syms.word
    GROUP BY per.doc_id"""
    )
    return "".join(parts)


@query("text_bpe_train", oracle=_train_oracle())
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the top-{N_MERGES} BPE merge table over `documents`: per round
    the most frequent adjacent symbol pair (freq-weighted, lexicographic
    tie-break) with its count at merge time."""
    return spark.createDataFrame(learn_merges(spark, sf_dir), _OUT_SCHEMA)


@query("text_bpe_encode", oracle=_encode_oracle())
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merge table: per-document pre-token count and
    BPE-token count. The fold chain runs over the DISTINCT vocabulary once
    (one projection, all {N_MERGES} rules nested); per-doc counts come
    from a vocab-sized join back — the corpus is never re-folded."""
    rules = learn_merges(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    dw = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(_BPE_PAT), F.lit(0))
        ).alias("word"),
    )
    per = dw.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    vocab = per.select("word").distinct().select(
        "word", F.split("word", "").alias("l")
    )
    for _, a, b, _ in rules:
        vocab = vocab.select("word", _merge_fold(a, b).alias("l"))
    syms = vocab.select("word", F.size("l").cast("long").alias("n_syms"))
    return (
        per.join(syms, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_syms")).cast("long").alias("n_bpe_tokens"),
        )
    )
