"""Gap-fill by LINEAR interpolation — the second densification policy.

``window_forward_fill`` (operators/windows.py) densifies a sparse series
with last-observation-carried-forward; this module adds the policy a
metric/sensor pipeline usually wants instead: missing buckets take the
value linearly interpolated between their nearest observed neighbors.
Own module per the per-file staleness rule (tests/test_registry_window.py).

Exactness design: interpolation is a division, and float division then
cross-engine rounding is exactly the ULP trap functions/numeric.py
documents. So the entire computation stays in INTEGER micro-units —
per-bucket sums are exact longs, the interpolated value is the integer
round-half-up of an exact rational floor((2*num + den) / (2*den)), and
the reported double is derived from that one integer by a single
identical division in both engines. Nothing anywhere rounds a float.
BOTH plans spell FLOOR division explicitly: Spark's ``div`` and DuckDB's
``//`` each truncate toward zero, which breaks the round-half-up
identity by one for negative numerators — and negative bucket sums are
legal for delta-like metrics.

Reference parity: [TGT] — BASELINE.json north star; no processing
surface in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

US_PER_HOUR = 3_600_000_000  # one hour in microseconds


def _sql_floordiv(a: str, b: str) -> str:
    """FLOOR division for the oracle: DuckDB's ``//`` truncates toward zero
    on integers (verified: -7 // 2 = -3), same as Spark's ``div`` — but the
    round-half-up identity floor((2*num+den)/(2*den)) NEEDS floor, and
    truncation is off by one for negative numerators (legal here: a
    delta-like metric makes bucket sums negative). Both engines therefore
    spell the identical explicit correction; denominators are always
    positive (counts and forward gaps)."""
    return (
        f"(({a}) // ({b}))"
        f" - (CASE WHEN ({a}) % ({b}) != 0 AND ({a}) < 0 THEN 1 ELSE 0 END)"
    )


_ORACLE_NUM = (
    "2 * (sp_ * cn * (nt - hour_id) + sn * cp * (hour_id - pt))"
    " + cp * cn * (nt - pt)"
)
_ORACLE_DEN = "2 * (cp * cn * (nt - pt))"


@query(
    "window_interpolate_linear",
    oracle=f"""
    WITH obs AS (
        SELECT event_type,
               epoch_us(ts) // {US_PER_HOUR} AS hour_id,
               CAST(SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s,
               COUNT(*) AS c
        FROM events
        GROUP BY event_type, epoch_us(ts) // {US_PER_HOUR}
    ), spine AS (
        SELECT event_type,
               unnest(generate_series(MIN(hour_id), MAX(hour_id))) AS hour_id
        FROM obs GROUP BY event_type
    ), grid AS (
        SELECT sp.event_type, sp.hour_id, o.s, o.c,
               last_value(CASE WHEN o.c IS NOT NULL THEN sp.hour_id END
                          IGNORE NULLS) OVER w_prev AS pt,
               last_value(o.s IGNORE NULLS) OVER w_prev AS sp_,
               last_value(o.c IGNORE NULLS) OVER w_prev AS cp,
               first_value(CASE WHEN o.c IS NOT NULL THEN sp.hour_id END
                           IGNORE NULLS) OVER w_next AS nt,
               first_value(o.s IGNORE NULLS) OVER w_next AS sn,
               first_value(o.c IGNORE NULLS) OVER w_next AS cn
        FROM spine sp LEFT JOIN obs o USING (event_type, hour_id)
        WINDOW
          w_prev AS (PARTITION BY sp.event_type ORDER BY sp.hour_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          w_next AS (PARTITION BY sp.event_type ORDER BY sp.hour_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ), vals AS (
        SELECT event_type, hour_id,
               CASE WHEN c IS NOT NULL
                    THEN {_sql_floordiv("2 * s + c", "2 * c")}
                    ELSE {_sql_floordiv(_ORACLE_NUM, _ORACLE_DEN)}
               END AS value_micro,
               CASE WHEN c IS NOT NULL THEN 'obs' ELSE 'interp' END AS src
        FROM grid
    )
    SELECT event_type, hour_id, value_micro,
           CAST(value_micro AS DOUBLE) / 1e6 AS value, src
    FROM vals
    """,
)
def window_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-event-type series, densified over each type's observed
    [first, last] hour span; missing hours get the linear interpolation
    between nearest observed neighbors, observed hours get the bucket
    mean. ``value_micro`` is the exact integer result (micro-units,
    round-half-up); ``value`` is its single-division double rendering.

    Scale posture: ONE scan of the event stream, collapsed by one
    map-side-combinable aggregation to (type, hour) cells — everything
    after runs on the DENSIFIED grid, whose size is span x types,
    independent of event volume. The per-type series rides a single row
    as a map (a metric series is tiny next to its raw events), the spine
    explodes off that same row (``sequence`` — no driver loop, no second
    scan, no spine-obs join), and the neighbor lookup is two
    frame-bounded window passes that reuse the per-type partitioning the
    series aggregation already established — no further exchange. At
    100 TB the grid is still tiny relative to events; if a single type's
    span ever made one partition hot, the window key gains a coarse
    time-range component (the same re-keying escape documented for
    sample_epoch_shuffle)."""
    e = load(spark, sf_dir, "events")
    hour_id = F.expr(f"unix_micros(ts) div {US_PER_HOUR}").alias("hour_id")
    value_u = F.expr("CAST(floor(value * 1e6 + 0.5) AS BIGINT)")
    obs = (
        e.select("event_type", hour_id, value_u.alias("vu"))
        .groupBy("event_type", "hour_id")
        .agg(F.sum("vu").alias("s"), F.count(F.lit(1)).alias("c"))
    )
    # One row per type carrying the whole (tiny) series as a map — the
    # spine explodes off the same row, so events is scanned ONCE and the
    # spine/obs alignment is a map lookup, not a join.
    series = obs.groupBy("event_type").agg(
        F.min("hour_id").alias("h0"),
        F.max("hour_id").alias("h1"),
        F.map_from_arrays(
            F.collect_list("hour_id"),
            F.collect_list(F.struct("s", "c")),
        ).alias("m"),
    )
    grid = series.select(
        "event_type",
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hour_id"),
        "m",
    ).select(
        "event_type",
        "hour_id",
        F.col("m")[F.col("hour_id")]["s"].alias("s"),
        F.col("m")[F.col("hour_id")]["c"].alias("c"),
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("c").isNotNull(), F.col("hour_id"))
    g = grid.select(
        "event_type", "hour_id", "s", "c",
        F.last(obs_hour, ignorenulls=True).over(w_prev).alias("pt"),
        F.last("s", ignorenulls=True).over(w_prev).alias("sp_"),
        F.last("c", ignorenulls=True).over(w_prev).alias("cp"),
        F.first(obs_hour, ignorenulls=True).over(w_next).alias("nt"),
        F.first("s", ignorenulls=True).over(w_next).alias("sn"),
        F.first("c", ignorenulls=True).over(w_next).alias("cn"),
    )
    # FLOOR division, spelled out with the same correction as the oracle's
    # _sql_floordiv: BOTH engines' integer division truncates toward zero
    # (Spark `div`, DuckDB `//`), and truncation breaks the round-half-up
    # identity by one for negative numerators — legal here, since nothing
    # guarantees non-negative values (delta/temperature-like metrics).
    def _floordiv(a: str, b: str) -> str:
        return (
            f"(({a}) div ({b}))"
            f" - (CASE WHEN ({a}) % ({b}) != 0 AND ({a}) < 0 THEN 1 ELSE 0 END)"
        )

    _NUM = "2 * (sp_ * cn * (nt - hour_id) + sn * cp * (hour_id - pt)) + cp * cn * (nt - pt)"
    _DEN = "2 * (cp * cn * (nt - pt))"
    return g.select(
        "event_type", "hour_id",
        F.when(F.col("c").isNotNull(), F.expr(_floordiv("2 * s + c", "2 * c")))
        .otherwise(F.expr(_floordiv(_NUM, _DEN)))
        .alias("value_micro"),
        F.when(F.col("c").isNotNull(), F.lit("obs"))
        .otherwise(F.lit("interp"))
        .alias("src"),
    ).select(
        "event_type", "hour_id", "value_micro",
        (F.col("value_micro").cast("double") / F.lit(1e6)).alias("value"),
        "src",
    )
