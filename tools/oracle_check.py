#!/usr/bin/env python
"""Driver-mirror verification: run every registered query through the public
``__spark_entry__`` surface on a plain SparkSession and diff against its
DuckDB oracle at sf0.01, reporting per-query match status including bitwise
float equality (the strictest plausible driver hash).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import __spark_entry__ as entrymod  # noqa: E402
from oracle_harness import compare, run_oracle  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("oracle-check")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = sys.argv[2:] or sorted(qs)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            pdf = qs[name](spark, sf_dir).toPandas()
            if name in oracles:
                odf = run_oracle(oracles[name], sf_dir)
                compare(pdf, odf, name=name)
                status = f"OK     rows={len(pdf)}"
            else:
                status = f"ROWS-ONLY rows={len(pdf)}"
        except AssertionError as e:
            status = f"MISMATCH {e}"
            failed.append(name)
        except Exception:
            status = "ERROR\n" + traceback.format_exc(limit=10)
            failed.append(name)
        print(f"{name:32s} {time.time() - t0:6.2f}s  {status}")
    spark.stop()
    print(f"\n{len(names) - len(failed)}/{len(names)} matched; failed: {failed or 'none'}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
