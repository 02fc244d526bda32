"""Cross-document boilerplate removal — segment-level exact dedup.

The third granularity of the dedup family: ``dedup.py`` decides per
DOCUMENT (drop whole near-duplicates), ``clustering.py`` groups them;
this module edits WITHIN documents — the CCNet/RefinedWeb-style pass
that strips segments repeated verbatim across many documents (headers,
footers, navigation chrome, license blurbs) while keeping the documents
themselves. Lives in its own module so boilerplate-policy changes never
stale the document-level dedup driver rows and vice versa (per-file
staleness rule, tests/test_registry_window.py).

The fixture corpus has no newline/sentence markup, so the segment unit
is a fixed window of ``CHUNK_W`` consecutive words anchored at fixed
offsets (pos 0, W, 2W, …) — deterministic in both engines, and exactly
the shape a production pass uses when a corpus's line structure is
unreliable.

Reference parity: [TGT] — the reference has no processing surface;
engine extension per the BASELINE.json north star (CCNet: Wenzek et al.
2020; RefinedWeb: Penedo et al. 2023 — public literature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

CHUNK_W = 8        # words per segment window
BOILER_MIN_DOCS = 3  # segment is boilerplate if it appears in >= this many docs


@query(
    "dedup_boilerplate",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), ch AS (
        SELECT doc_id, i AS chunk_id,
               array_to_string(
                   list_slice(w, i * {CHUNK_W} + 1, i * {CHUNK_W} + {CHUNK_W}),
                   ' ') AS chunk
        FROM (SELECT doc_id, w,
                     unnest(generate_series(
                         0, (len(w) + {CHUNK_W} - 1) // {CHUNK_W} - 1)) AS i
              FROM d)
    ), boiler AS (
        SELECT chunk FROM ch GROUP BY chunk
        HAVING COUNT(DISTINCT doc_id) >= {BOILER_MIN_DOCS}
    )
    SELECT ch.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(b.chunk) AS BIGINT) AS n_boiler,
           md5(COALESCE(
               string_agg(ch.chunk, ' ' ORDER BY ch.chunk_id)
                   FILTER (WHERE b.chunk IS NULL),
               '')) AS clean_fp
    FROM ch LEFT JOIN boiler b ON ch.chunk = b.chunk
    GROUP BY ch.doc_id
    """,
)
def dedup_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip segments repeated verbatim across >= BOILER_MIN_DOCS (3)
    documents, keeping surviving segments in original order. Output per
    document: segment count, boilerplate count, and an md5 fingerprint of
    the cleaned text (fingerprint rather than the text itself so the driver
    hash stays narrow).

    Scale posture — the corpus-sized data never shuffles twice and never
    re-explodes for the edit:

    * segmenting is a pure projection (``transform`` over a ``sequence``
      of window anchors + ``slice`` — no word-level explode);
    * the only corpus-wide shuffle is the segment-frequency count, and it
      is a single map-side-combinable exchange: segments are
      array_distinct-ed per document before the explode, so the
      cross-document frequency is a plain COUNT, not a two-exchange
      count-distinct expansion;
    * the boilerplate set is by construction SMALL (segments repeated in
      >= BOILER_MIN_DOCS distinct docs), so applying the edit is a
      broadcast single-row cross join carrying the set as an array; each
      document filters its own segment array in place — a projection, so
      the cleaned corpus needs no join and no per-doc re-aggregation.
      At 100 TB, if the boilerplate set ever outgrew a broadcast, the
      application tier degrades to the exploded left-anti equi-join the
      oracle spells — same semantics, one more shuffle.
    """
    from broadway_kinesis_spark.session import spread_small_scan

    # Round 14 (VERDICT r13 #6 re-measure): spread the scan before the
    # chunk projection — the segment transform runs TWICE (frequency pass
    # + edit pass) and on a single-row-group input both passes serialized
    # onto one task; interleaved A/B at sf0.1: 0.76 s -> 0.38 s. Caching
    # the chunk arrays instead was re-measured and is still a wash on top
    # of the spread (0.375 vs 0.381 min-of-4 same session): recompute of
    # a projection-only subtree beats materializing corpus-sized arrays,
    # confirming the round-6 call — so the double projection stays.
    docs = spread_small_scan(
        load(spark, sf_dir, "documents").select("doc_id", "text"),
        sf_dir,
        ("documents",),
        "doc_id",
    )
    words = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("w")
    )
    n_chunks = F.expr(f"(size(w) + {CHUNK_W - 1}) div {CHUNK_W}")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(F.col("w"), i * CHUNK_W + 1, CHUNK_W), " "),
    )
    chunked = words.select("doc_id", chunks.alias("chunks"))

    # Per-doc array_distinct BEFORE the explode turns the cross-document
    # frequency into a plain count — one map-side-combinable exchange
    # instead of the two a countDistinct(doc_id) expansion would plan.
    freq = (
        chunked.select(F.explode(F.array_distinct("chunks")).alias("chunk"))
        .groupBy("chunk")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= BOILER_MIN_DOCS)
    )
    boiler_arr = freq.agg(F.collect_list("chunk").alias("boiler"))

    kept = F.filter(
        F.col("chunks"), lambda c: ~F.array_contains(F.col("boiler"), c)
    )
    return (
        chunked.crossJoin(F.broadcast(boiler_arr))
        .select(
            "doc_id",
            F.size("chunks").cast("long").alias("n_chunks"),
            (F.size("chunks") - F.size(kept)).cast("long").alias("n_boiler"),
            F.md5(F.array_join(kept, " ")).alias("clean_fp"),
        )
    )
