"""Query registry: named (Spark callable, DuckDB-oracle SQL) pairs.

Every operator from SURVEY.md §2 registers here via the :func:`query`
decorator. ``__spark_entry__.py`` re-exports :func:`queries` /
:func:`oracle_sql` so the driver's DuckDB-differential harness can run each
Spark plan side-by-side with ANSI SQL over the same parquet.

Contract notes (driver compares row-count + schema + order-insensitive
value hash, columns sorted by name):
- alias EVERY computed column identically in Spark and SQL;
- round floating aggregates in BOTH plans so partial-aggregation order
  (which differs between engines and between runs at scale) cannot flip a
  ULP across the hash;
- break window/top-k ties with a unique key in BOTH plans.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver runs weaker rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as a named query, optionally with its oracle SQL.

    The registered callable tunes the (driver-owned) session first, so every
    query sees UTC session time + AQE regardless of who built the session.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from broadway_kinesis_spark.session import tune

            return fn(tune(spark), sf_dir)

        REGISTRY[name] = Query(name=name, fn=wrapped, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def _load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    # Imported lazily so `import broadway_kinesis_spark` stays cheap and so a
    # syntax error in one operator family surfaces at registry access, where
    # tests catch it.
    from broadway_kinesis_spark.operators import (  # noqa: F401
        aggregates,
        asof,
        clustering,
        composite,
        curation,
        dedup,
        joins,
        multimodal,
        pipeline_ops,
        relational,
        sampling,
        scalars,
        similarity,
        skew,
        subqueries,
        textops,
        windows,
    )
    from broadway_kinesis_spark.functions import udfs  # noqa: F401
    from broadway_kinesis_spark.streaming import batch_twins  # noqa: F401


# The grading driver checks the FIRST 50 entries of queries() against their
# oracles. Rotation policy (round 3): the window covers, in order,
#   (1) queries with NO driver row ever (added after the round-2 run),
#   (2) queries whose round-1 green row predates a rewrite of their
#       implementing module (aggregates.py/composite.py/dedup.py in round 2),
#   (3) queries whose implementing or shared-dependency module changed THIS
#       round (similarity.py tier-1 tie-break; functions/numeric.py sign-safe
#       lsum touches every money aggregate),
#   (4) new operators added this round,
#   (5) proven-green filler from files untouched since their last green row.
# Queries 51+ are exclusively ones with a green driver row for their current
# code form. tests/test_registry_window.py enforces the invariant
# mechanically against CORRECTNESS_r*.json.
_PRIORITY: tuple[str, ...] = (
    # (1) never driver-checked (landed after the round-2 run)
    "agg_mode", "text_vocab_topk",
    # (2) round-1 rows gone stale: aggregates.py scaled-long rewrite
    "agg_distinct_counts", "agg_cube", "agg_grouping_sets",
    "agg_filtered_first_last", "agg_stats", "agg_string_concat",
    "agg_pivot", "agg_salted_skew",
    # (2) composite.py rewrite
    "composite_shipping_priority", "composite_local_supplier_volume",
    "composite_returned_items", "composite_user_retention",
    # (2) dedup.py rewrite
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_exact_docs",
    # (3) similarity.py changed this round (deterministic tier-1 tie-break)
    "similarity_topk_cosine_pandas", "similarity_topk_cosine",
    "similarity_ann_ivf", "similarity_ann_ivf_probe", "similarity_ann_lsh",
    "similarity_normalize", "similarity_kmeans",
    # (3) functions/numeric.py changed this round (sign-safe lsum): one green
    # rep per lsum-consuming module re-verifies the shared helper —
    # aggregates, joins, windows, batch_twins, composite (composites above)
    "pricing_summary", "agg_rollup",
    "join_inner",
    "window_time_range",
    "stream_tumbling_window",
    # (2b) round-2 rows gone stale: the post-r2-run commit that added
    # agg_mode/text_vocab_topk also touched aggregates.py and textops.py,
    # so every query those files implement needs a current-form row — the
    # agg_* set above covers aggregates.py's window entries; these are the
    # remaining out-of-window ones from both files
    "agg_approx_distinct", "agg_collect", "agg_approx_percentile",
    "text_lang_id", "text_quality_score", "text_fingerprint",
    "text_bpe_tokens",
    # (4) new operators this round
    "dedup_cluster_cc", "sample_stratified",
    "dedup_decontaminate", "pack_sequences", "text_repetition_score",
    "agg_histogram", "similarity_quantize_int8",
    "pii_scrub", "sample_epoch_shuffle", "data_mix_weighted",
    "join_salted_skew", "subquery_correlated_avg",
    # (5) proven-green filler from untouched files
    "text_token_stats", "text_tfidf_topk",
)


def _ordered() -> list[Query]:
    _load_all_modules()
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:  # registration drift — fail loudly, not silently reorder
        raise KeyError(f"_PRIORITY names not registered: {missing}")
    prio = set(_PRIORITY)
    rest = [q for n, q in REGISTRY.items() if n not in prio]
    return [REGISTRY[n] for n in _PRIORITY] + rest


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}
