"""Driver-mirror correctness: every registered query vs its DuckDB oracle."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, run_oracle

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    pdf = df.toPandas()
    if name in ORACLES:
        odf = run_oracle(ORACLES[name], sf_dir)
        compare(pdf, odf, name=name)
    else:
        # rows-only contract: must run and return a stable schema
        assert len(pdf) >= 0
        assert len(pdf.columns) > 0


def test_no_query_emits_non_atomic_columns(spark, sf_dir):
    """The driver's canonicalizer (pandas sort_values + value hash) crashes
    on array/map cells (round-1 postmortem: unhashable numpy.ndarray) and
    struct cells hash engine-specifically. Guard the whole surface at the
    SCHEMA level: every registered query must emit only atomic columns —
    serialize collections (array_join / to_json) inside the plan instead.
    Construction-only: no jobs run."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    import __spark_entry__ as entrymod

    offenders = {}
    for name, fn in entrymod.queries().items():
        schema = fn(spark, sf_dir).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"non-atomic output columns would crash driver canon: {offenders}"
