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
        composite,
        dedup,
        joins,
        multimodal,
        relational,
        scalars,
        similarity,
        textops,
        windows,
    )
    from broadway_kinesis_spark.functions import udfs  # noqa: F401
    from broadway_kinesis_spark.streaming import batch_twins  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _load_all_modules()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all_modules()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
