"""Exponentially time-decayed aggregation — recency-weighted rollups.

The standard freshness-aware score every ranking/engagement/trust
pipeline keeps: ``score = Σ value · e^(−λ·age)``, where old events decay
smoothly instead of falling off a window cliff. Computed per
``event_type`` over ``events`` with age in whole days behind the
corpus's own latest day.

Exactness — PROVABLY identical in both engines (ADVICE r5): the decay
factor per integer age is not computed by each engine's ``exp`` (a 1-ULP
libm divergence could in principle flip ``ROUND(x·1e6)`` at a .5
boundary). Instead the whole finite weight table
``w6[age] = half_up(e^(−λ·age)·1e6)`` is computed ONCE driver-side at
import (λ = 0.05/day ⇒ w6 rounds to 0 for every age ≥ 291, so the table
has 291 entries) and broadcast as IDENTICAL literals to both engines —
an array literal indexed by age in the Spark plan, the same list literal
in the oracle SQL. From there the decayed sum is an EXACT integer
Σ(cents · w6) — order-free, partial-aggregation-proof — with one final
division to a double score. Hash equality is by construction, not by
libm agreement.

Scale posture: the anchor day (max event day) is a scalar aggregate that
broadcasts onto the scan; the weight table is a ~291-element literal in
the projection (no join); the decayed sum is one map-side-combinable
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

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

US_PER_DAY = 86_400_000_000
L_NUM, L_DEN = 5, 100  # λ = 0.05/day as an exact ratio (half-life ~14 days)
D_SCALE = 1_000_000  # decay factors quantized to micro-units


def _build_w6_table() -> list[int]:
    """w6[age] = round-half-up(e^(−λ·age)·1e6) for every age with a
    non-zero weight. e^(−λ·age) is monotone decreasing, so the first age
    rounding to 0 bounds the table; all later ages contribute 0."""
    out: list[int] = []
    age = 0
    while True:
        w = math.floor(math.exp(-(age * L_NUM) / L_DEN) * D_SCALE + 0.5)
        if w == 0:
            return out
        out.append(w)
        age += 1


W6_TABLE = _build_w6_table()  # 291 entries at λ=0.05
_W6_SQL_LIST = "[" + ", ".join(str(w) for w in W6_TABLE) + "]"


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
               CASE WHEN d0 - day_id < {len(W6_TABLE)}
                    THEN list_extract(CAST({_W6_SQL_LIST} AS BIGINT[]),
                                      CAST(d0 - day_id + 1 AS INTEGER))
                    ELSE 0 END AS w6
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
    by the driver-computed micro-unit table ``W6_TABLE[age_days]`` (0 past
    its end); ``decayed_micro`` is the exact integer accumulator,
    ``decayed_value`` its float rendering."""
    events = load(spark, sf_dir, "events")
    pts = events.select(
        "event_type",
        F.expr(f"unix_micros(ts) div {US_PER_DAY}").alias("day_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    anchor = pts.agg(F.max("day_id").alias("d0"))
    age = F.col("d0") - F.col("day_id")
    w6 = F.when(
        age < len(W6_TABLE),
        F.element_at(
            F.lit(W6_TABLE).cast("array<bigint>"), (age + 1).cast("int")
        ),
    ).otherwise(F.lit(0).cast("bigint"))
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
