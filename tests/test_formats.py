"""Source-format coverage beyond parquet: CSV and JSON-lines round-trips of
fixture tables with explicit schemas (schema-on-read, no inference jobs in
the read path), plus the format knobs a production ingest needs (headers,
compression, malformed-row handling)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from broadway_kinesis_spark.session import load


def _nation(spark, sf_dir):
    return load(spark, sf_dir, "nation").orderBy("n_nationkey")


def test_csv_roundtrip_with_header(spark, sf_dir, tmp_path):
    src = _nation(spark, sf_dir)
    out = str(tmp_path / "nation_csv")
    src.write.option("header", True).csv(out)
    back = (
        spark.read.schema(src.schema)  # explicit schema: no inference pass
        .option("header", True)
        .csv(out)
        .orderBy("n_nationkey")
    )
    assert back.schema == src.schema
    assert [tuple(r) for r in back.collect()] == [tuple(r) for r in src.collect()]


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    src = _nation(spark, sf_dir)
    out = str(tmp_path / "nation_jsonl")
    src.write.json(out)
    back = spark.read.schema(src.schema).json(out).orderBy("n_nationkey")
    assert [tuple(r) for r in back.collect()] == [tuple(r) for r in src.collect()]


def test_csv_gzip_compression_roundtrip(spark, sf_dir, tmp_path):
    src = _nation(spark, sf_dir)
    out = str(tmp_path / "nation_gz")
    src.write.option("header", True).option("compression", "gzip").csv(out)
    back = spark.read.schema(src.schema).option("header", True).csv(out)
    assert back.count() == src.count()


def test_json_malformed_rows_to_corrupt_column(spark, tmp_path):
    """PERMISSIVE mode routes undecodable lines into the corrupt-record
    column instead of failing the scan — the ingest posture for dirty
    feeds (the engine-side analogue of the replay source's typed error
    events: quarantine, don't crash)."""
    p = tmp_path / "dirty.jsonl"
    p.write_text('{"a": 1}\nnot-json-at-all\n{"a": 3}\n', encoding="utf-8")
    df = spark.read.schema("a int, _corrupt_record string").json(str(p))
    rows = df.collect()
    good = sorted(r.a for r in rows if r.a is not None)
    bad = [r._corrupt_record for r in rows if r._corrupt_record is not None]
    assert good == [1, 3]
    assert bad == ["not-json-at-all"]


def test_json_failfast_raises_on_malformed(spark, tmp_path):
    p = tmp_path / "dirty2.jsonl"
    p.write_text('{"a": 1}\nnope\n', encoding="utf-8")
    df = spark.read.schema("a int").option("mode", "FAILFAST").json(str(p))
    with pytest.raises(Exception, match="FAILFAST|Malformed"):
        df.collect()


def test_partitioned_csv_prunes_directories(spark, sf_dir, tmp_path):
    """Directory-partitioned layout prunes at the FILE level for any format,
    not just parquet."""
    src = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    out = str(tmp_path / "orders_by_status")
    src.write.partitionBy("o_orderstatus").option("header", True).csv(out)
    back = spark.read.option("header", True).schema("o_orderkey long, o_orderstatus string").csv(out)
    from broadway_kinesis_spark.plans import formatted_plan

    plan = formatted_plan(back.filter(F.col("o_orderstatus") == "F"))
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
