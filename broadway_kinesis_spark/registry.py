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
        ann_incremental,
        ann_persist,
        ann_report,
        asof,
        audiohash,
        audiohash_incremental,
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
        containment_incremental,
        contrastive,
        cumdistinct,
        curation_report,
        daily_increment,
        curation,
        decay,
        dedup,
        dedup_persist,
        dedup_report,
        embedding_incremental,
        fingerprint_incremental,
        fuzzy_incremental,
        epoch_build,
        funnel,
        graph,
        heavyhitters,
        imagehash,
        incremental_batch,
        interpolate,
        joins,
        minhash_incremental,
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
        semantic_incremental,
        simhash_incremental,
        similarity,
        sketch_merge,
        skew,
        split_incremental,
        splits,
        subqueries,
        substring_incremental,
        substring_spans,
        textops,
        textstats,
        triangles,
        urls,
        videohash,
        videohash_incremental,
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
    # (a) round-11 never-green operators: the incremental leakage-safe
    # split assignment (VERDICT r10 #4), the session-2 extension of the
    # incremental loop to the embedding + fingerprint channels, and the
    # session-3 completion of the matrix (fuzzy / semantic / audio /
    # video / substring-span incremental channels)
    "dedup_split_incremental_assign",
    "dedup_incremental_containment", "dedup_incremental_embedding",
    "dedup_incremental_imagehash", "dedup_incremental_minhash",
    "dedup_incremental_simhash", "similarity_ann_ivf_incremental",
    "dedup_incremental_audiohash", "dedup_incremental_fuzzy",
    "dedup_incremental_semantic", "dedup_incremental_substring",
    "dedup_incremental_video", "pipeline_daily_increment",
    # (b) staled this round: functions/table_build.py's errno-scoped
    # lock fallback (ADVICE r10 — stales every layout-backed query: the
    # split family, the bucketed join/pagerank twins, the
    # partition-pruned scan); operators/incremental_batch.py's
    # roll-forward additions + probe-table overrides (stales the
    # incremental pair); operators/dedup_persist.py's docstring
    # measurement citation (stales the persisted pair tiers);
    # operators/ann_persist.py's bounded-training + extracted-probe
    # refactor (stales the persisted IVF probe)
    "dedup_containment_bottomk_persisted", "dedup_incremental_ngram",
    "dedup_incremental_persisted", "dedup_ngram_jaccard_persisted",
    "dedup_split_leakage_safe", "dedup_split_leakage_safe_persisted",
    "dedup_split_leakage_safe_tiered",
    "dedup_split_leakage_safe_tiered_persisted",
    "graph_pagerank", "graph_pagerank_bucketed", "join_bucketed",
    "scan_partition_pruned", "similarity_ann_ivf_persisted",
    # (c) filler, oldest green first: the FULL round-6 cohort (26 — the
    # stalest greens, all independently HEAD-re-verified by the round-10
    # judge; session 3's five new channels displaced the round-7 tail)
    "agg_pivot", "agg_salted_skew", "agg_stats", "agg_time_decay",
    "asof_join", "asof_join_forward", "asof_join_nearest",
    "asof_join_tolerance", "composite_curation_report",
    "dedup_decontaminate", "dedup_substring_spans",
    "graph_triangle_count", "join_inner", "join_salted_skew",
    "multimodal_scene_cut", "pack_sequences", "sample_hash_split",
    "sample_reservoir_group", "sample_stratified",
    "similarity_quantize_int8", "stream_tumbling_window",
    "text_bigram_logprob", "udf_pandas_vectorized", "udf_python_row",
    )

# Queries whose staleness rule demands a window slot but which the 50-slot
# window cannot hold. Round 11: EMPTY — demand is 26 (13 new operators:
# the incremental split assignment, the session-2 containment/embedding/
# fingerprint/minhash/simhash/IVF incremental channels, session 3's
# fuzzy/semantic/audio/video/substring incremental channels + the daily
# ingest-gate composite, + 13 staled by this round's table_build/
# incremental_batch/dedup_persist/ann_persist edits), leaving 24 slots
# of oldest-green filler (counts per
# test_registry_window.py, the source of truth). test_registry_window.py
# keeps enforcing that any future overflow must be declared here
# explicitly.
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
