"""Change-data-capture merge: classify an update stream against a base
snapshot — the MERGE INTO shape every incremental warehouse/lakehouse
pipeline runs (Delta/Iceberg/Hudi upserts), expressed engine-side.

The fixture ``events`` table is the change log: key = (user_id,
event_type), ordered by (ts, event_id). Rows before ``CDC_CUTOFF`` form
the base snapshot (latest value per key); rows at/after it are the
incoming update batch. The operator emits one row per key with the MERGE
action a writer would take: ``insert`` (new key), ``update`` (key exists,
value changed), ``noop`` (key exists, latest update carries the same
value), ``retain`` (key untouched by the batch). Own module per the
per-file staleness rule (tests/test_registry_window.py).

Reference parity: [TGT] — BASELINE.json north star; no processing
surface in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

CDC_CUTOFF = "2024-01-24 00:00:00"


@query(
    "cdc_merge_upsert",
    oracle=f"""
    WITH ranked AS (
        SELECT user_id, event_type, value, ts,
               (ts >= TIMESTAMP '{CDC_CUTOFF}') AS is_new,
               -- ORDER BY epoch_us(ts), not ts: DuckDB reads the fixture's
               -- TIMESTAMP(NANOS) at full precision while Spark truncates to
               -- microseconds, so ns-level ordering could pick a different
               -- "latest" row per engine (FIXTURES.md: compare at us or
               -- coarser).
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type,
                                (ts >= TIMESTAMP '{CDC_CUTOFF}')
                   ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events
    ), latest AS (
        SELECT user_id, event_type,
               MAX(CASE WHEN NOT is_new THEN value END) AS old_value,
               MAX(CASE WHEN is_new THEN value END) AS new_value,
               MAX(CASE WHEN is_new THEN ts END) AS new_ts,
               BOOL_OR(NOT is_new) AS has_old,
               BOOL_OR(is_new) AS has_new
        FROM ranked WHERE rn = 1
        GROUP BY user_id, event_type
    )
    SELECT user_id, event_type,
           CASE WHEN NOT has_old THEN 'insert'
                WHEN NOT has_new THEN 'retain'
                WHEN new_value IS NOT DISTINCT FROM old_value THEN 'noop'
                ELSE 'update' END AS action,
           old_value, new_value,
           COALESCE(epoch_us(new_ts), -1) AS new_epoch_us
    FROM latest
    """,
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-classification over a keyed change log: latest pre-cutoff row
    per key is the base snapshot, latest post-cutoff row is the update
    candidate, and the output row carries the action + old/new values a
    MERGE INTO writer would apply. Value comparison is null-safe
    (``<=>`` / IS NOT DISTINCT FROM) and compares the stored doubles
    verbatim — no arithmetic, so nothing to round.

    Scale posture: ONE scan of the change log and one shuffle — the
    latest-per-(key, side) window hash-partitions on (user_id,
    event_type, side), and the side-pivoting aggregation that follows
    groups on a prefix of the same key, which AQE coalesces onto the
    existing exchange rather than reshuffling. No join: base and batch
    are sides of the same window, so the classic full-outer
    snapshot-vs-batch merge join disappears into conditional
    aggregation. At 100 TB the base side would come pre-compacted
    (snapshot table) and the window runs only over the update batch —
    same plan, smaller left side; the action taxonomy is unchanged."""
    e = load(spark, sf_dir, "events")
    is_new = F.col("ts") >= F.lit(CDC_CUTOFF).cast("timestamp")
    w = Window.partitionBy("user_id", "event_type", "is_new").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = (
        e.select(
            "user_id", "event_type", "value", "ts", "event_id",
            is_new.alias("is_new"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    latest = ranked.groupBy("user_id", "event_type").agg(
        F.max(F.when(~F.col("is_new"), F.col("value"))).alias("old_value"),
        F.max(F.when(F.col("is_new"), F.col("value"))).alias("new_value"),
        F.max(F.when(F.col("is_new"), F.col("ts"))).alias("new_ts"),
        F.max(~F.col("is_new")).alias("has_old"),
        F.max(F.col("is_new")).alias("has_new"),
    )
    action = (
        F.when(~F.col("has_old"), F.lit("insert"))
        .when(~F.col("has_new"), F.lit("retain"))
        .when(F.col("new_value").eqNullSafe(F.col("old_value")), F.lit("noop"))
        .otherwise(F.lit("update"))
    )
    return latest.select(
        "user_id", "event_type", action.alias("action"),
        "old_value", "new_value",
        F.coalesce(F.unix_micros("new_ts"), F.lit(-1)).alias("new_epoch_us"),
    )
