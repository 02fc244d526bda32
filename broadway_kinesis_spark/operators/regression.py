"""Per-group OLS trend fitting with exact integer sufficient statistics.

``REGR_SLOPE``-family analytics (SQL:2003 linear regression aggregates),
done the way a distributed engine should: ordinary least squares needs
only five SUFFICIENT STATISTICS per group — n, Σx, Σy, Σxy, Σx² — all of
which are order-free sums, i.e. ONE map-side-combinable aggregation no
matter how many rows feed each fit. Fitting "value trend per event_type
over days" is the canonical metrics-drift / data-freshness check a
pipeline runs over every partition of a 100 TB corpus.

Exactness: built-in ``regr_slope`` sums FLOATS, so partial-aggregation
order can flip last-ULP bits between engines (and between runs). Here
every statistic is an exact BIGINT — x is the day offset from a pinned
epoch (small ints), y is exact cents via ``ROUND(value*100)`` (the
functions/numeric.py scaled-long trick) — and the closed forms

    slope     = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
    intercept = (ΣyΣx² − ΣxΣxy) / (nΣx² − (Σx)²)
    r²        = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))

are evaluated with EVERY statistic cast to double BEFORE any product:
each statistic is individually exact as a double (< 2^53 up to ~1 B rows
per group at this value range — the documented bound), and from there
every multiply/subtract/divide is a correctly-rounded IEEE op with the
identical expression shape in both engines, so results hash bit-equal.
Products of raw BIGINTs would be exact only at toy scale: ``n·Σy²``
overflows int64 already at ~10x the bench corpus (caught by the x100
scaling run — with ANSI off the overflow would WRAP SILENTLY), so
double-domain products are the scale-correct form, not a compromise.

Scale posture: one exchange (the groupBy), constant state per group, no
window, no join. The sufficient-statistic shape is also what makes the
fit INCREMENTAL at scale: per-shard/day partials of the same five sums
merge by addition, like the sketch and histogram summaries.

Reference parity: [TGT] — no relational surface in the reference; engine
extension beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

X0 = 19723  # day_id of 2024-01-01 (pinned x-origin keeps Σx² tiny)
US_PER_DAY = 86_400_000_000


@query(
    "agg_group_regression",
    oracle=f"""
    WITH pts AS (
        SELECT event_type,
               epoch_us(ts) // {US_PER_DAY} - {X0} AS x,
               CAST(ROUND(value * 100) AS BIGINT) AS y
        FROM events
    ), s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM pts GROUP BY event_type
    )
    , d AS (
        SELECT event_type, n, sx, sy,
               CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
               CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
               CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS den_y,
               CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE) AS inum
        FROM s
    )
    SELECT event_type, n, sx, sy,
           CASE WHEN den <> 0 THEN num / den END AS slope_cents_per_day,
           CASE WHEN den <> 0 THEN inum / den END AS intercept_cents,
           CASE WHEN den <> 0 AND den_y <> 0
                THEN (num * num) / (den * den_y) END AS r2
    FROM d
    """,
)
def agg_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS of value (cents) on day offset, per event_type: slope,
    intercept at day {X0}, and r² — all from five exact integer sums."""
    events = load(spark, sf_dir, "events")
    pts = events.select(
        "event_type",
        (F.expr(f"unix_micros(ts) div {US_PER_DAY}") - X0).alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    s = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    sxxd = F.col("sxx").cast("double")
    syyd = F.col("syy").cast("double")
    num = nd * sxyd - sxd * syd
    den = nd * sxxd - sxd * sxd
    den_y = nd * syyd - syd * syd
    # Degenerate groups (ADVICE r5): all-equal x gives den = 0 (and constant
    # y gives den_y = 0) — a 0-division would emit NaN/±Inf whose cross-engine
    # hash equality rests on both engines' IEEE division-by-zero quirks.
    # Both engines emit NULL instead, by the same CASE shape.
    return s.select(
        "event_type",
        "n",
        "sx",
        "sy",
        F.when(den != 0, num / den).alias("slope_cents_per_day"),
        F.when(den != 0, (syd * sxxd - sxd * sxyd) / den).alias("intercept_cents"),
        F.when((den != 0) & (den_y != 0), (num * num) / (den * den_y)).alias("r2"),
    )
