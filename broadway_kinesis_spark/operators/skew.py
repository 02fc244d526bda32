"""Skew-salted join: bound per-task key cardinality when broadcast can't.

At 100 TB a handful of hot join keys (one mega-supplier, one viral
document) can put an entire shuffle partition on one task. Spark's two
built-in escapes both have limits: broadcasting needs the dim side to fit
in memory, and AQE's skew-join splits oversized PARTITIONS but still
cannot split a single hot KEY — every row of one key hashes to one task.
Salting is the standard third tool: widen the join key with a salt in
``[0, S)`` derived from non-key columns on the fact side, replicate each
dim row ``S`` times (one per salt), and join on ``(key, salt)``. A hot
key's rows now spread across ``S`` tasks at the cost of an ``S``-times
larger dim side — the classic skew/replication trade.

``join_salted_skew`` demonstrates the rewrite end-to-end with the
broadcast path deliberately disabled (a ``merge`` hint — modeling the
regime where the dim is too big to broadcast, which is exactly when
salting matters). Its oracle is the PLAIN unsalted join: identical output
proves the rewrite is semantics-preserving, which is the whole point —
salting must never change the answer.

Reference parity: [TGT] — the reference (single-shard Kinesis connector,
lib/broadway_kinesis/producer.ex) has no join surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.functions.numeric import lsum, sql_lsum
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

SALTS = 8


@query(
    "join_salted_skew",
    oracle=f"""
    SELECT s_nationkey,
           COUNT(*)::BIGINT AS n_items,
           {sql_lsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per supplier nation through a salted fact-dim join.

    The fact side (lineitem) gets a deterministic salt from its OWN row
    identity (never from the join key — hashing the key would re-create
    the hot spot); the dim side (supplier) is exploded across all S salts.
    The join runs on ``(suppkey, salt)`` under a ``merge`` hint so the
    plan is the shuffled sort-merge join salting is designed for, and the
    downstream per-nation aggregate is unchanged. Output is bit-identical
    to the unsalted join (the oracle), for any S.
    """
    li = load(spark, sf_dir, "lineitem").withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALTS))
    )
    sup = load(spark, sf_dir, "supplier").withColumn(
        "_salt_r", F.explode(F.array(*[F.lit(i) for i in range(SALTS)]))
    )
    joined = li.hint("merge").join(
        sup,
        (li["l_suppkey"] == sup["s_suppkey"])
        & (li["_salt"] == sup["_salt_r"].cast("long")),
    )
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        lsum("l_extendedprice * (1 - l_discount)", "revenue"),
    )
