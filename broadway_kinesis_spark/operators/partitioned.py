"""Hive-partitioned storage + partition-pruned scans as a checked operator.

The FIRST-line 100 TB scan technique, before bucketing, before indexes:
lay the table out ``partitionBy(<low-cardinality column>)`` so a filtered
query never LISTS — let alone reads — the partitions it doesn't name.
operators/bucketed.py proved the pay-the-shuffle-once join layout; this
module proves the prune-the-scan layout the same way: build the
partitioned twin once per corpus version, answer a filtered aggregate
from it, and let the oracle (raw un-partitioned parquet) certify layout
invariance while the plan test pins ``PartitionFilters`` actually pruned.

Partition column: ``event_type`` (5 values — the daily-pipeline shape is
``partitionBy(day)``; any low-cardinality column demonstrates the
machinery). The query reads ONE of five partitions: at 100 TB that is
literally 4/5 of the corpus never touched, visible in the plan as
``PartitionFilters: [isnotnull(event_type), (event_type = purchase)]``
with zero data filters left over.

Exactness: counts are integers; the money-style sum rides the scaled-long
path (functions/numeric.py lsum — exact integer units, identical in both
engines); the day derivation is integer microsecond division.

Reference parity: [TGT] — no relational surface in the reference; engine
extension beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.functions.numeric import lsum, sql_lsum
from broadway_kinesis_spark.functions.table_build import corpus_sig, ensure_table
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

TARGET_TYPE = "purchase"
US_PER_DAY = 86_400_000_000


def ensure_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Create (once per corpus version) the event table partitioned by
    ``event_type``. Build/idempotence/orphan protocol:
    functions/table_build.py."""
    return ensure_table(
        spark,
        f"_bks_part_events_{corpus_sig(sf_dir, ('events',))}",
        lambda: load(spark, sf_dir, "events"),
        partition_by="event_type",
    )


@query(
    "scan_partition_pruned",
    oracle=f"""
    SELECT epoch_us(ts) // {US_PER_DAY} AS day_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           {sql_lsum("value", "total_value")}
    FROM events
    WHERE event_type = '{TARGET_TYPE}'
    GROUP BY day_id
    """,
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup of one event_type, answered from the partitioned twin:
    the scan lists and reads exactly one of five partition directories
    (pinned in tests/test_round5_ops.py); the oracle aggregates the raw
    un-partitioned parquet, so the driver hash proves the layout changed
    nothing but the I/O."""
    name = ensure_partitioned_events(spark, sf_dir)
    t = spark.table(name).filter(F.col("event_type") == TARGET_TYPE)
    return (
        t.select(
            F.expr(f"unix_micros(ts) div {US_PER_DAY}").alias("day_id"),
            "user_id",
            "value",
        )
        .groupBy("day_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            lsum("value", "total_value"),
        )
    )
