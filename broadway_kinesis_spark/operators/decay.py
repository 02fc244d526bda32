"""Exponentially time-decayed aggregation — recency-weighted rollups.

The standard freshness-aware score every ranking/engagement/trust
pipeline keeps: ``score = Σ value · e^(−λ·age)``, where old events decay
smoothly instead of falling off a window cliff. Computed per
``event_type`` over ``events`` with age in whole days behind the
corpus's own latest day.

Exactness — the textstats.py one-transcendental-then-quantize pattern:
age is an exact integer day difference; the decay factor is quantized
ONCE per distinct age to integer micro-units,
``ROUND(EXP(−(Λ_NUM·age)/Λ_DEN) · 1e6)`` (the exp input is one exact
int-by-int division, so both engines feed exp the identical double; a
1-ULP exp divergence cannot move the micro-unit rounding), and the
decayed sum is then an EXACT integer Σ(cents · decay_micro) — order-free,
partial-aggregation-proof — with one final division to a double score.

Scale posture: the anchor day (max event day) is a scalar aggregate that
broadcasts onto the scan; the decayed sum is one map-side-combinable
exchange. At 100 TB the decayed partials are NOT mergeable across runs
(age shifts as the anchor moves) — the deployment recipe is per-day
partials of raw Σcents (mergeable) decayed at READ time by the then-
current anchor, which is exactly the day-partial layout
``operators/rolling.py`` and ``quantiles.py`` persist; the in-plan form
here keeps the operator self-contained and oracle-checkable.

Reference parity: [TGT] — no relational surface in the reference; engine
extension beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

US_PER_DAY = 86_400_000_000
L_NUM, L_DEN = 5, 100  # λ = 0.05/day as an exact ratio (half-life ~14 days)
D_SCALE = 1_000_000  # decay factors quantized to micro-units


@query(
    "agg_time_decay",
    oracle=f"""
    WITH pts AS (
        SELECT event_type,
               epoch_us(ts) // {US_PER_DAY} AS day_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ), anchor AS (
        SELECT MAX(day_id) AS d0 FROM pts
    ), weighted AS (
        SELECT event_type, cents,
               CAST(ROUND(EXP(-CAST((d0 - day_id) * {L_NUM} AS DOUBLE)
                               / {L_DEN}) * {D_SCALE}) AS BIGINT) AS w6
        FROM pts, anchor
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS raw_cents,
           CAST(SUM(cents * w6) AS BIGINT) AS decayed_micro,
           CAST(SUM(cents * w6) AS DOUBLE) / ({D_SCALE} * 100.0)
               AS decayed_value
    FROM weighted
    GROUP BY event_type
    """,
)
def agg_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted value per event_type: each event's cents weighted
    by e^(−0.05·age_days) quantized to micro-units; ``decayed_micro`` is
    the exact integer accumulator, ``decayed_value`` its float rendering."""
    events = load(spark, sf_dir, "events")
    pts = events.select(
        "event_type",
        F.expr(f"unix_micros(ts) div {US_PER_DAY}").alias("day_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    anchor = pts.agg(F.max("day_id").alias("d0"))
    w6 = F.round(
        F.exp(-((F.col("d0") - F.col("day_id")) * L_NUM).cast("double") / L_DEN)
        * D_SCALE
    ).cast("long")
    weighted = pts.crossJoin(F.broadcast(anchor)).withColumn("w6", w6)
    return weighted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("long").alias("raw_cents"),
        F.sum(F.col("cents") * F.col("w6")).cast("long").alias("decayed_micro"),
        (
            F.sum(F.col("cents") * F.col("w6")).cast("double")
            / (D_SCALE * 100.0)
        ).alias("decayed_value"),
    )
