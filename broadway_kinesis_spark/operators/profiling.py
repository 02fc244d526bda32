"""Table-statistics profiling — the ANALYZE/optimizer-stats surface.

Every warehouse keeps per-column statistics (row count, null count,
distinct count, min/max) to drive join reordering, filter selectivity,
and data-quality monitoring; collecting them is a standing batch job over
every table of a 100 TB lake. This operator emits that statistics table
for ``events``: one row per column, computed in ONE scan — all the
per-column aggregates (conditional null counts, distincts, extrema) fold
into a single aggregation pass, then pivot into rows.

Exactness: counts are integers; extrema are reported on a CANONICAL
INTEGER projection per column (ids as themselves, timestamps as epoch
micros, money as exact cents, strings as NULL) because min/max of a
string-CAST double or timestamp differs textually between engines while
the underlying VALUES agree — the projection keeps the statistic useful
and the hash engine-independent. ``null_frac`` is one exact int/int
division.

Scale posture: one exchange for the global aggregate (count_distinct
rewrites to two-phase partial aggregation per column); the pivot operates
on ONE row. At scale this runs per PARTITION and the per-partition stat
rows are themselves mergeable (sums add, distincts re-merge via sketches
— operators/sketch_merge.py; extrema take min/max), which is how ANALYZE
stays incremental.

Reference parity: [TGT] — no relational surface in the reference; engine
extension beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

US_PER_DAY = 86_400_000_000

#: column -> canonical integer projection (None: no numeric extrema)
_CANON = {
    "event_id": "event_id",
    "ts": "epoch_us",  # engine-specific spelling handled per side
    "user_id": "user_id",
    "event_type": None,
    "value": "cents",
    "props": None,
}


def _oracle() -> str:
    selects = []
    for col, canon in _CANON.items():
        if canon == "epoch_us":
            lo, hi = f"MIN(epoch_us({col}))", f"MAX(epoch_us({col}))"
        elif canon == "cents":
            lo = f"MIN(CAST(ROUND({col} * 100) AS BIGINT))"
            hi = f"MAX(CAST(ROUND({col} * 100) AS BIGINT))"
        elif canon:
            lo, hi = f"MIN({canon})", f"MAX({canon})"
        else:
            lo, hi = "NULL", "NULL"
        selects.append(f"""
    SELECT '{col}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_null,
           CAST(COUNT(*) - COUNT({col}) AS DOUBLE) / COUNT(*) AS null_frac,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
           CAST({lo} AS BIGINT) AS min_canon,
           CAST({hi} AS BIGINT) AS max_canon
    FROM events""")
    return " UNION ALL ".join(selects)


@query("profile_columns", oracle=_oracle())
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer-statistics row per events column: row/null/distinct
    counts, null fraction, and canonical-integer extrema — one scan, one
    aggregation, a one-row pivot."""
    events = load(spark, sf_dir, "events")
    aggs = []
    for col, canon in _CANON.items():
        c = F.col(col)
        aggs += [
            F.count(F.lit(1)).alias(f"{col}__n"),
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"{col}__null"),
            F.count_distinct(c).alias(f"{col}__nd"),
        ]
        if canon == "epoch_us":
            proj = F.expr(f"unix_micros({col})")
        elif canon == "cents":
            proj = F.round(c * 100).cast("long")
        elif canon:
            proj = F.col(canon)
        else:
            proj = F.lit(None).cast("long")
        aggs += [
            F.min(proj).cast("long").alias(f"{col}__min"),
            F.max(proj).cast("long").alias(f"{col}__max"),
        ]
    one = events.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', {col}__n, {col}__null, {col}__nd, {col}__min, {col}__max"
        for col in _CANON
    )
    stacked = one.select(
        F.expr(
            f"stack({len(_CANON)}, {stack_args}) AS "
            "(column_name, n_rows, n_null, n_distinct, min_canon, max_canon)"
        )
    )
    return stacked.select(
        "column_name",
        "n_rows",
        "n_null",
        (F.col("n_null").cast("double") / F.col("n_rows")).alias("null_frac"),
        "n_distinct",
        "min_canon",
        "max_canon",
    )
