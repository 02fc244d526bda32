"""Sinks + Broadway-batcher analogue: batch parquet roundtrip with partition
pruning, streaming parquet with checkpoint, and foreachBatch routing."""

from __future__ import annotations

import pytest

from broadway_kinesis_spark.sources.replay import ReplayDataSource
from broadway_kinesis_spark.sources.sinks import batcher, stream_to_parquet, write_parquet
from tests.test_streaming_source import ev, write_shard


def test_write_parquet_partitioned_prunes(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from broadway_kinesis_spark.plans.audit import formatted_plan
    from broadway_kinesis_spark.session import load

    out = str(tmp_path / "orders_by_status")
    write_parquet(
        load(spark, sf_dir, "orders"), out, mode="overwrite", partition_by=["o_orderstatus"]
    )
    back = spark.read.parquet(out)
    assert back.count() == load(spark, sf_dir, "orders").count()
    plan = formatted_plan(back.filter(F.col("o_orderstatus") == "F"))
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:200]


def test_write_parquet_default_mode_refuses_overwrite(spark, sf_dir, tmp_path):
    from broadway_kinesis_spark.session import load

    out = str(tmp_path / "once")
    d = load(spark, sf_dir, "region")
    write_parquet(d, out)
    with pytest.raises(Exception, match="already exists"):
        write_parquet(d, out)


def test_stream_to_parquet_checkpoints(spark, tmp_path):
    spark.dataSource.register(ReplayDataSource)
    d = str(tmp_path / "in")
    write_shard(d, "s", [ev(1, b"a"), ev(2, b"b")])
    q = stream_to_parquet(
        spark.readStream.format("kinesis_replay").option("path", d).option(
            "startingPosition", "trim_horizon"
        ).load(),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    assert q.awaitTermination(120)
    assert sorted(bytes(r.data) for r in spark.read.parquet(str(tmp_path / "out")).collect()) == [
        b"a",
        b"b",
    ]


def test_batcher_routes_by_predicate(spark, tmp_path):
    from pyspark.sql import functions as F

    spark.dataSource.register(ReplayDataSource)
    d = str(tmp_path / "in")
    write_shard(
        d,
        "s",
        [ev(1, b"apple", pk="fruit"), ev(2, b"carrot", pk="veg"), ev(3, b"pear", pk="fruit")],
    )
    got: dict[str, list[bytes]] = {"fruit": [], "rest": []}

    def fruit_handler(df, batch_id):
        got["fruit"] += [bytes(r.data) for r in df.collect()]

    def rest_handler(df, batch_id):
        got["rest"] += [bytes(r.data) for r in df.collect()]

    route = batcher(
        {"fruit": F.col("partition_key") == "fruit"},
        {"fruit": fruit_handler, "rest": rest_handler},
        default="rest",
    )
    q = (
        spark.readStream.format("kinesis_replay")
        .option("path", d)
        .option("startingPosition", "trim_horizon")
        .load()
        .writeStream.foreachBatch(route)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert sorted(got["fruit"]) == [b"apple", b"pear"]
    assert got["rest"] == [b"carrot"]


def test_batcher_validates_handlers():
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="missing"):
        batcher({"a": F.lit(True)}, {})


def test_batcher_null_predicate_rows_go_to_default(spark):
    """SQL three-valued logic: a row where every route predicate is NULL
    must still reach the default handler (null-safe negation), matching the
    docstring's 'rows matching no route go to default'."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a"), (2, None), (3, "b")], "id int, tag string")
    got = {"t": [], "rest": []}
    route = batcher(
        {"t": F.col("tag") == "a"},
        {"t": lambda d, _b: got["t"].extend(r.id for r in d.collect()),
         "rest": lambda d, _b: got["rest"].extend(r.id for r in d.collect())},
        default="rest",
    )
    route(df, 0)
    assert sorted(got["t"]) == [1]
    assert sorted(got["rest"]) == [2, 3]  # NULL-predicate row 2 included
