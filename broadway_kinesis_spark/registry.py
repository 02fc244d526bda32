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
            from broadway_kinesis_spark.session import (
                reset_shuffle_partitions,
                tune,
            )

            s = tune(spark)
            # undo any prior query's corpus-sized shuffle inflation before
            # this one plans (session.size_shuffle_partitions / ADVICE r7)
            reset_shuffle_partitions(s)
            return fn(s, sf_dir)

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
        ann_persist,
        ann_report,
        asof,
        audiohash,
        bigram,
        bloom,
        bpe_train,
        bucketed,
        cdc,
        chunking,
        classifier,
        clustering,
        composite,
        containment,
        containment_bottomk,
        contrastive,
        cumdistinct,
        curation_report,
        curation,
        decay,
        dedup,
        dedup_report,
        epoch_build,
        funnel,
        graph,
        heavyhitters,
        imagehash,
        interpolate,
        joins,
        multimodal,
        paragraphs,
        partitioned,
        pipeline_ops,
        profiling,
        quantiles,
        rangejoin,
        regression,
        relational,
        rolling,
        sampling,
        scalars,
        scd,
        scenecut,
        semantic,
        similarity,
        sketch_merge,
        skew,
        splits,
        subqueries,
        substring_spans,
        textops,
        textstats,
        triangles,
        urls,
        videohash,
        windows,
        winsorize,
    )
    from broadway_kinesis_spark.functions import udfs  # noqa: F401
    from broadway_kinesis_spark.streaming import batch_twins  # noqa: F401


# The grading driver checks the FIRST 50 entries of queries() against their
# oracles; the explicit _PRIORITY tuple IS that window. The rotation policy
# is MECHANICAL, enforced by tests/test_registry_window.py (the source of
# truth): (a) every never-green query must hold a slot; (b) every query
# whose implementing code (module + transitive intra-package imports)
# changed since its last green driver round must hold a slot; (c) remaining
# slots fill with the OLDEST-green rows so signal currency improves across
# the registry. Any overflow must be declared in _DEFERRED explicitly.
_PRIORITY: tuple[str, ...] = (
    # (a) round-9 never-green operators
    "dedup_split_leakage_safe_tiered", "pipeline_clean_corpus_best",
    "sample_temperature_mix",
    # (b) staled this round: splits.py's tiered evidence union (stales
    # both split tiers); containment_bottomk.py's edge-CTE export;
    # clustering.py's candidate-bounded keep-best scoring (stales the
    # cluster family); textops.py's quality_scored extraction (stales
    # the textops family and bpe_train's importers); composite.py's
    # keep-best pipeline (stales the composite family);
    # functions/table_build.py's atomic thread-safe lock (stales the
    # layout-backed queries); curation.py's temperature mix (stales the
    # curation family)
    "composite_local_supplier_volume", "composite_returned_items",
    "composite_shipping_priority", "composite_user_retention",
    "data_mix_weighted", "dedup_cluster_cc", "dedup_containment_bottomk",
    "dedup_keep_best",
    "dedup_split_leakage_safe", "dedup_split_leakage_safe_persisted",
    "graph_pagerank", "graph_pagerank_bucketed", "join_bucketed",
    "pii_scrub", "pipeline_clean_corpus", "pipeline_epoch_build",
    "sample_epoch_shuffle",
    "scan_partition_pruned", "text_bpe_encode",
    "text_bpe_tokens", "text_bpe_train", "text_fingerprint",
    "text_lang_id", "text_quality_score", "text_tfidf_topk",
    "text_token_stats", "text_vocab_topk",
    # (c) filler, oldest green first (round-4 cohort alphabetically,
    # then the round-5 agg cohort)
    "scalar_string", "scan_project_filter", "setops_union_all",
    "setops_union_distinct", "sort_limit_topk", "subquery_correlated_avg",
    "text_unigram_logprob", "text_vocab_coverage", "unpivot_measures",
    "window_analytic", "window_distribution", "window_forward_fill",
    "window_interpolate_linear", "window_ranking",
    "window_rolling_distinct", "window_running", "window_topk_per_group",
    "agg_approx_distinct", "agg_approx_percentile", "agg_collect",
    )

# Queries whose staleness rule demands a window slot but which the 50-slot
# window cannot hold. Round 9: EMPTY — demand is 30 (3 new operators + 27
# staled by this round's edits, the curation family included), leaving 20
# slots of oldest-green filler (counts per test_registry_window.py, the
# source of truth). test_registry_window.py keeps enforcing that any
# future overflow must be declared here explicitly.
_DEFERRED: tuple[str, ...] = ()


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
