"""Exact cumulative distinct count — the running-coverage window.

"How many distinct event types has this user touched as of each event?"
— the feature-adoption / coverage curve. Spark (like every SQL engine)
rejects ``COUNT(DISTINCT) OVER (... ROWS UNBOUNDED PRECEDING)``, and the
naive emulation is a quadratic per-row set rebuild. The standard exact
rewrite is FIRST-OCCURRENCE FLAGGING: an event raises the distinct count
iff it is its (user, type)'s first occurrence, so

    running_distinct = SUM(is_first) OVER (user ORDER BY time)

Two window passes over two partitionings ((user, type) then (user)) —
both hash exchanges on bounded key spaces, no per-row state, no
quadratic anything. The ``window_rolling_distinct`` sketch family
answers the SLIDING version of this question approximately; this is the
exact cumulative form, and the same flag column is what an incremental
implementation would checkpoint.

Determinism: both windows order by (ts, event_id) — the unique-key
tiebreak the driver contract requires.

Reference parity: [TGT] — engine extension (SURVEY §2.B window family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load


@query(
    "window_cumulative_distinct",
    oracle="""
    WITH flagged AS (
        SELECT event_id, user_id, epoch_us(ts) AS event_us,
               CASE WHEN ROW_NUMBER() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY epoch_us(ts), event_id) = 1
                    THEN 1 ELSE 0 END AS is_first
        FROM events
    )
    SELECT event_id, user_id, event_us,
           CAST(SUM(is_first) OVER (
                    PARTITION BY user_id
                    ORDER BY event_us, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_seen
    FROM flagged
    """,
)
def window_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: how many distinct event types its user has produced up
    to and including it (first-occurrence flag + running sum)."""
    ev = load(spark, sf_dir, "events")
    t = F.unix_micros("ts").alias("event_us")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "event_us", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("event_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select("event_id", "user_id", "event_type", t)
        .withColumn(
            "is_first",
            F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
        )
        .select(
            "event_id",
            "user_id",
            "event_us",
            F.sum("is_first").over(w_run).cast("long").alias("n_types_seen"),
        )
    )
