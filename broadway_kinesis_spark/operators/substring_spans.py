"""Exact-substring deduplication at SPAN granularity (Lee et al. 2022).

``dedup_boilerplate`` (paragraphs.py) removes repeated fixed-anchor
segments; this is the finer-grained pass from "Deduplicating Training
Data Makes Language Models Better": flag every >= K_SPAN-token span that
occurs in MORE THAN ONE document, and mask the tokens those spans cover —
span-level masking, not document- or segment-level removal. The
suffix-array of the paper is replaced by its k-gram-anchor
approximation, expressible as pure DataFrame algebra: every K_SPAN-token
window at stride 1 is a candidate anchor (the ``chunking.py`` projection
at stride 1), and a span shared by >= MIN_DOCS docs marks all K_SPAN of
its token positions in every document that carries it. Any shared
substring of length >= K_SPAN tokens is the union of its K_SPAN-grams,
so the masked-token set equals the paper's (for spans measured in
whole tokens).

Shape: one explode (no shuffle) -> span-frequency aggregation
(map-side-combinable count distinct, shuffle on span) -> semi-join of
positions against the shared-span set (reuses the span partitioning) ->
position-union mask + per-doc rollups (shuffle on doc_id). No window
over data-sized input, no cartesian, no Python.

Output per document: token/span totals, how many span positions are
shared, how many token positions the shared spans cover, and the masked
fraction — the quantities a masking rewrite pass consumes.

Reference parity: [TGT] — no relational surface in the reference; engine
extension beyond it (SURVEY §2.B dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load, spread_small_scan

K_SPAN = 8  # span width in whitespace tokens
MIN_DOCS = 2  # a span in >= this many distinct docs is "shared"


@query(
    "dedup_substring_spans",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents
    ), spans AS (
        SELECT doc_id, i AS pos,
               array_to_string(l[CAST(i + 1 AS INTEGER):CAST(i + {K_SPAN} AS INTEGER)], ' ') AS span
        FROM (SELECT doc_id, l, UNNEST(range(0, len(l) - {K_SPAN} + 1)) AS i
              FROM tok)
    ), shared AS (
        SELECT span FROM spans GROUP BY span
        HAVING COUNT(DISTINCT doc_id) >= {MIN_DOCS}
    ), flagged AS (
        SELECT s.doc_id, s.pos FROM spans s JOIN shared sh ON s.span = sh.span
    ), masked AS (
        SELECT doc_id, CAST(COUNT(DISTINCT t) AS BIGINT) AS n_masked_tokens
        FROM (SELECT doc_id, UNNEST(range(pos, pos + {K_SPAN})) AS t
              FROM flagged)
        GROUP BY doc_id
    ), per_doc_spans AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans FROM spans
        GROUP BY doc_id
    ), per_doc_flagged AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_spans FROM flagged
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(string_split(lower(d.text), ' ')) AS BIGINT) AS n_tokens,
           COALESCE(ps.n_spans, 0) AS n_spans,
           COALESCE(pf.n_shared_spans, 0) AS n_shared_spans,
           COALESCE(m.n_masked_tokens, 0) AS n_masked_tokens,
           CAST(COALESCE(m.n_masked_tokens, 0) AS DOUBLE)
               / len(string_split(lower(d.text), ' ')) AS masked_frac
    FROM documents d
    LEFT JOIN per_doc_spans ps ON d.doc_id = ps.doc_id
    LEFT JOIN per_doc_flagged pf ON d.doc_id = pf.doc_id
    LEFT JOIN masked m ON d.doc_id = m.doc_id
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document exposure to cross-document exact {K_SPAN}-token spans:
    span/position totals, shared-span positions, masked token-position
    count (union of all shared spans), and the masked fraction."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.split(F.lower("text"), " ").alias("l"))
    # The stride-1 span explode (slice + array_join per position) is the
    # query's dominant compute: spread the scan across the session's
    # parallelism before it (no-op at scale — guard in session.py). The
    # cheap per-row branches (n_tokens, n_spans arithmetic) stay on the
    # unspread scan.
    tok_spread = spread_small_scan(
        docs.select("doc_id", "text"), sf_dir, ("documents",), "doc_id"
    ).select("doc_id", F.split(F.lower("text"), " ").alias("l"))
    spans = (
        tok_spread.filter(F.size("l") >= K_SPAN)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.size("l") - K_SPAN)).alias("pos"),
            "l",
        )
        .select(
            "doc_id",
            "pos",
            F.array_join(
                F.slice("l", F.col("pos") + 1, F.lit(K_SPAN)), " "
            ).alias("span"),
        )
    )
    shared = (
        spans.groupBy("span")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= MIN_DOCS)
        .select("span")
    )
    flagged = spans.join(shared, "span").select("doc_id", "pos")
    # count_distinct instead of distinct()+count (round 13): one aggregate
    # keyed by doc_id with a map-side partial dedup of (doc_id, t), not a
    # corpus-wide distinct exchange followed by a second count exchange.
    masked = (
        flagged.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (K_SPAN - 1))
            ).alias("t"),
        )
        .groupBy("doc_id")
        .agg(F.count_distinct("t").alias("n_masked_tokens"))
    )
    # n_spans is pure arithmetic on the token count — size(l) - K_SPAN + 1
    # positions per doc with >= K_SPAN tokens — so the span stream never
    # re-explodes (round 13: this branch re-ran the scan+explode+slice
    # projection a second time; the count it fed was derivable row-wise).
    per_doc_spans = tok.filter(F.size("l") >= K_SPAN).select(
        "doc_id",
        (F.size("l") - (K_SPAN - 1)).cast("long").alias("n_spans"),
    )
    per_doc_flagged = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared_spans")
    )
    n_tok = F.size(F.split(F.lower("text"), " ")).cast("long")
    base = docs.select("doc_id", n_tok.alias("n_tokens"))
    out = (
        base.join(per_doc_spans, "doc_id", "left")
        .join(per_doc_flagged, "doc_id", "left")
        .join(masked, "doc_id", "left")
    )
    zero = F.lit(0).cast("long")
    n_masked = F.coalesce("n_masked_tokens", zero)
    return out.select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_spans", zero).alias("n_spans"),
        F.coalesce("n_shared_spans", zero).alias("n_shared_spans"),
        n_masked.alias("n_masked_tokens"),
        (n_masked.cast("double") / F.col("n_tokens")).alias("masked_frac"),
    )
