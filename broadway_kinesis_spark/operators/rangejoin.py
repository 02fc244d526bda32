"""Binned range join — the equi-join rewrite of a bounded interval join.

``join_range_interval`` (operators/joins.py) evaluates its time-range
predicate INSIDE a user-keyed hash join, which is fine while the equi key
bounds fan-out — but at skewed scale (one hot user, or no usable equi key
at all) the range residual degenerates to per-key quadratic work. The
standard engine rewrite (DuckDB's IEJoin, Databricks' range-join
optimization — both published) turns the range into an EQUI key:

1. pick bin width = the interval bound L; every match with
   ``b.t − a.t ∈ (0, L]`` has ``floor(b.t/L)`` ∈ {floor(a.t/L),
   floor(a.t/L)+1} — two bins, by construction;
2. explode the probe side into exactly those two (user, bin) keys;
3. plain equi-join on (user, bin) — hash-partitioned both sides, AQE
   skew-split capable, NO inequality in the join condition;
4. re-apply the exact range as a residual FILTER (also dedups the two-bin
   overlap: a pair can match through only one of the two bins since the
   build row's bin is a function of its own timestamp).

Per-task pair volume is bounded by 2× bin occupancy regardless of key
skew — the property the docstring of ``join_range_interval`` promises and
this operator delivers. The oracle is the SAME inequality-join SQL as the
plain variant: the driver's hash-match proves the rewrite is lossless.

Exactness: integer epoch-µs arithmetic throughout (asof.py's ns-fixture
note applies); bin math is exact integer division.

Reference parity: [TGT] — no relational surface in the reference; engine
extension beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

L_US = 60_000_000  # interval bound AND bin width: 60 s in µs


@query(
    "join_range_binned",
    oracle=f"""
    SELECT a.event_id AS click_id, b.event_id AS purchase_id,
           b.us - a.us AS gap_us
    FROM (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
          WHERE event_type = 'click') a
    JOIN (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
          WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id
     AND b.us > a.us
     AND b.us - a.us <= {L_US}
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases within 60 s after a click by the same user — identical
    semantics (and oracle) to ``join_range_interval``, but planned as a
    pure equi-join on (user, time_bin) with the range as a residual
    filter. The click side explodes into its own bin and the next (every
    in-bound purchase lands in one of the two); no inequality reaches the
    join condition."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("a_us"),
    )
    a_binned = a.select(
        "click_id",
        "user_id",
        "a_us",
        F.explode(
            F.array(
                F.expr(f"a_us div {L_US}"), F.expr(f"a_us div {L_US}") + 1
            )
        ).alias("bin"),
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("b_user"),
        F.unix_micros("ts").alias("b_us"),
        F.expr(f"unix_micros(ts) div {L_US}").alias("b_bin"),
    )
    return (
        a_binned.join(
            b,
            (F.col("user_id") == F.col("b_user")) & (F.col("bin") == F.col("b_bin")),
        )
        .filter(
            (F.col("b_us") > F.col("a_us"))
            & (F.col("b_us") - F.col("a_us") <= L_US)
        )
        .select(
            "click_id",
            "purchase_id",
            (F.col("b_us") - F.col("a_us")).alias("gap_us"),
        )
    )
