"""Correctness under the BENCH session config (ADVICE r3).

The bench session (bench.py) runs with AQE off, shuffle_partitions=8, and
``spark.sql.constraintPropagation.enabled=false``, while the driver's
correctness harness validates queries under the default config — so the
published headline numbers could in principle run plan shapes the oracle
hash-match never exercised. This module closes that gap: every headline
query is diffed against its DuckDB oracle with the session flipped to the
exact bench conf deltas, then the conf is restored.

Only runtime-settable confs differ between the two sessions (both go
through ``build_session`` with shuffle_partitions=8; static confs like
``files.maxPartitionBytes`` are identical), so setting the deltas on the
shared test session reproduces the bench configuration exactly.
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, run_oracle

import __spark_entry__ as entrymod
from bench import HEADLINE

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

# conf key -> bench value (bench.py: build_session(adaptive=False) + the
# explicit constraintPropagation override).
_BENCH_CONF = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.constraintPropagation.enabled": "false",
    "spark.sql.shuffle.partitions": "8",
}


@pytest.fixture(scope="module")
def bench_spark(spark):
    saved = {k: spark.conf.get(k) for k in _BENCH_CONF}
    for k, v in _BENCH_CONF.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        spark.conf.set(k, v)


@pytest.mark.parametrize("name", [n for n in HEADLINE if n in QUERIES])
def test_headline_query_matches_oracle_under_bench_conf(bench_spark, sf_dir, name):
    pdf = QUERIES[name](bench_spark, sf_dir).toPandas()
    if name in ORACLES:
        odf = run_oracle(ORACLES[name], sf_dir)
        compare(pdf, odf, name=name)
    else:
        assert len(pdf.columns) > 0
