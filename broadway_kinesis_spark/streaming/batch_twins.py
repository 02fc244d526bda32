"""Streaming operators, registered through their batch-equivalent twins
(SURVEY.md §2.B "Streaming" rows).

Structured Streaming's windowed aggregations are *incremental* evaluations
of the same logical plan a batch query declares — Catalyst compiles
``groupBy(window(ts, ...))`` identically either way, so each operator here
is (a) registered as a batch query on `events` with a DuckDB oracle (the
correctness gate the driver hashes) and (b) exercised as a REAL stream —
watermarks, late-data drops, state eviction — in
tests/test_streaming_windows.py over the replay source.

Determinism contract: all window bounds are integer epoch-microseconds
(`unix_micros` / `epoch_us`) — the events fixture is TIMESTAMP(NANOS) which
Spark floors to µs at load while DuckDB keeps ns, so bucket math in the
timestamp domain could disagree at ns boundaries; integer µs math cannot.
Value sums are decimal-stabilized (functions/numeric.py).

Scale posture: event-time windowing shuffles once on the grouping key
(window start is derived, not shuffled separately); session windows
hash-partition by user and sort in-partition (same cost shape as the as-of
join); in streaming the same plans run incrementally with state bounded by
the watermark horizon — the knob that makes 100 TB/day streams tractable.

Reference parity: the reference delivers raw events with no windowing
([TGT]); its at-least-once + resume semantics are what the replay-source
tests exercise underneath these operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.functions.numeric import lsum, sql_lsum
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

_5MIN_US = 5 * 60 * 1_000_000
_10MIN_US = 10 * 60 * 1_000_000
_30MIN_US = 30 * 60 * 1_000_000


@query(
    "stream_tumbling_window",
    oracle=f"""
    SELECT (epoch_us(ts) // {_5MIN_US}) * {_5MIN_US} AS window_start_us,
           event_type,
           COUNT(*) AS n_events,
           {sql_lsum("value", "sum_value")}
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling event-time window per event type — the batch twin
    of ``groupBy(window(ts, '5 minutes'), event_type)`` with a watermark.
    ``window()`` aligns buckets to the epoch, so the bucket start is exactly
    ``floor(epoch_us / 5min)`` — asserted by using window() itself here."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), lsum("value", "sum_value"))
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_sliding_window",
    oracle=f"""
    SELECT window_start_us, COUNT(*) AS n_events, {sql_lsum("value", "sum_value")}
    FROM (
        SELECT UNNEST([
                   (epoch_us(ts) // {_5MIN_US}) * {_5MIN_US} - {_5MIN_US},
                   (epoch_us(ts) // {_5MIN_US}) * {_5MIN_US}
               ]) AS window_start_us,
               value
        FROM events
    )
    GROUP BY 1
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute window sliding every 5 minutes: each event lands in exactly
    two windows (Spark expands this before the aggregate — the oracle makes
    the expansion explicit with UNNEST)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), lsum("value", "sum_value"))
        .select(F.unix_micros("w.start").alias("window_start_us"), "n_events", "sum_value")
    )


@query(
    "stream_session_window",
    oracle=f"""
    WITH t AS (
        SELECT user_id, event_id, epoch_us(ts) AS t, value,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= {_30MIN_US}
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), s AS (
        -- Same (t, event_id) ordering as the LAG window: ordering by value
        -- here could split equal-timestamp rows across sessions when one
        -- of them carries the new_session flag.
        SELECT user_id, t, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY t, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM t
    )
    SELECT user_id,
           MIN(t) AS session_start_us,
           MAX(t) + {_30MIN_US} AS session_end_us,
           COUNT(*) AS n_events,
           {sql_lsum("value", "sum_value")}
    FROM s
    GROUP BY user_id, sid
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap session windows per user — the batch twin of
    ``groupBy(session_window(ts, '30 minutes'), user_id)``. The oracle is the
    classic gap-and-island rewrite; Spark's session semantics (events merge
    while the gap is < 30 min, session end = last event + gap) are mirrored
    with a `>=` break condition in integer µs."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), lsum("value", "sum_value"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_dedup_twin",
    oracle="""
    SELECT user_id, event_type, event_id, t_us FROM (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS t_us,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY epoch_us(ts), event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def stream_dedup_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keep-first dedup per (user, event type) — the batch twin
    of streaming ``dropDuplicatesWithinWatermark``: same keys, with the
    arbitrary-survivor choice pinned to earliest (ts, event_id) so batch and
    oracle agree row-for-row."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.unix_micros("ts"), "event_id")
    return (
        e.select(
            "user_id",
            "event_type",
            "event_id",
            F.unix_micros("ts").alias("t_us"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "stream_stream_join_twin",
    oracle=f"""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           epoch_us(c.ts) AS click_us,
           epoch_us(p.ts) AS purchase_us
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND p.event_type = 'purchase'
     AND epoch_us(p.ts) > epoch_us(c.ts)
     AND epoch_us(p.ts) <= epoch_us(c.ts) + {_10MIN_US}
    """,
)
def stream_stream_join_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, batch twin: clicks joined to the same
    user's purchases within 10 minutes AFTER the click — the batch plan of
    ``clicks.join(buys, expr(...interval...))`` with watermarks on both
    sides (the live streaming version, state bounded by the watermark
    horizon, runs in tests/test_stream_stream_join.py). Equi-key on
    user_id carries the join; the interval predicate filters post-match,
    so the plan is a hash join, not a cartesian. Bucket math in integer
    µs (module determinism contract)."""
    e = load(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("click_us"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.unix_micros("ts").alias("purchase_us"),
    )
    joined = c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_us") > F.col("click_us"))
        & (F.col("purchase_us") <= F.col("click_us") + _10MIN_US),
    )
    return joined.select("click_id", "purchase_id", "user_id", "click_us", "purchase_us")
