"""SCD Type-2 history build: a change stream becomes validity intervals.

The other half of the CDC story (operators/cdc.py classifies and
streaming/upsert.py materializes LATEST state): warehouse dimensions keep
EVERY version of a key as a row with a validity window — Kimball's
slowly-changing-dimension type 2, the layout every as-of join
(operators/asof.py) and point-in-time training-data reconstruction reads.
Each change row (key = (user_id, event_type), ordered by (ts, event_id))
becomes:

- ``valid_from``   the change's own timestamp;
- ``valid_to``     the NEXT change's timestamp (half-open intervals tile
  with no overlap); the live row carries a high-date sentinel rather than
  NULL — the convention BETWEEN-style as-of predicates rely on (and
  NULL-free interval columns keep every engine's NULL-comparison
  semantics out of the picture; see ``HIGH_DATE`` for why not 9999);
- ``version``      1-based change ordinal within the key;
- ``is_current``   exactly one per key.

Exactness: pure window functions over exact columns — lead/row_number
with a total per-key order (ts ties broken on event_id); no floats are
computed, only carried.

Scale posture: ONE exchange (the per-key window partition), no joins, no
second scan — the history table falls out of a single pass over the
change log. At 100 TB the output is what you'd ``partitionBy(bucket(key))``
next to the upsert snapshot; building it costs exactly one shuffle of the
changes, which is the floor for any per-key ordering.

Reference parity: [TGT] — no relational surface in the reference; engine
extension beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

#: open-interval sentinel. Classic SCD2 uses 9999-12-31, but that
#: overflows Arrow/pandas datetime64[ns] (max 2262-04-11) in every
#: toPandas boundary the harness (and many consumers) cross — so the
#: sentinel is pinned just under it. Same BETWEEN semantics, no NULLs.
HIGH_DATE = "2262-01-01 00:00:00"


@query(
    "cdc_scd2_history",
    oracle=f"""
    SELECT user_id, event_type,
           ts AS valid_from,
           COALESCE(LEAD(ts) OVER w, TIMESTAMP '{HIGH_DATE}') AS valid_to,
           value,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
           LEAD(ts) OVER w IS NULL AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full SCD2 history of (user_id, event_type): one row per change with
    its half-open validity interval, version ordinal, and current flag."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.coalesce(
            F.lead("ts").over(w), F.lit(HIGH_DATE).cast("timestamp")
        ).alias("valid_to"),
        "value",
        F.row_number().over(w).cast("long").alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )
