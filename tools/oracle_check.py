#!/usr/bin/env python
"""Driver-mirror verification: run every registered query through the public
``__spark_entry__`` surface on a plain SparkSession and diff against its
DuckDB oracle at sf0.01, reporting per-query match status including bitwise
float equality (the strictest plausible driver hash).

Usage: python tools/oracle_check.py [sf_dir] [query ...]

Session hygiene (round 12, VERDICT r11 #6): a single long session sweeping
~180 queries accumulates JVM/broadcast pressure — round 11's session-3
sf0.1 certification lost ``graph_pagerank`` ~100 queries in to a transient
driver-broadcast OOM that re-ran clean standalone. The sweep therefore
RESTARTS the session every ``RESTART_EVERY`` queries, and a query that
ERRORS (infrastructure failure, not a mismatch) is retried ONCE in a fresh
session inside the same invocation, so a certification is never
"N-1/N + standalone re-run" again. MISMATCHes are never retried — a wrong
answer is a wrong answer.

Env knobs: ``SPARK_GRAFT_CPUS`` (local[N], default 8),
``BKS_RESTART_EVERY`` (default 60; 0 disables restarts).
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

RESTART_EVERY = int(os.environ.get("BKS_RESTART_EVERY", "60"))


def _new_session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("oracle-check")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _run_one(spark, qs, oracles, name: str, sf_dir: str) -> str:
    """OK / ROWS-ONLY status line body; raises on error/mismatch."""
    pdf = qs[name](spark, sf_dir).toPandas()
    if name in oracles:
        odf = run_oracle(oracles[name], sf_dir)
        compare(pdf, odf, name=name)
        return f"OK     rows={len(pdf)}"
    return f"ROWS-ONLY rows={len(pdf)}"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = _new_session()
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = sys.argv[2:] or sorted(qs)
    failed = []
    since_restart = 0
    for name in names:
        if RESTART_EVERY and since_restart >= RESTART_EVERY:
            spark.stop()
            spark = _new_session()
            since_restart = 0
            print(f"-- session restarted (every {RESTART_EVERY} queries)")
        since_restart += 1
        t0 = time.time()
        try:
            status = _run_one(spark, qs, oracles, name, sf_dir)
        except AssertionError as e:
            # a MISMATCH is a wrong answer — never retried
            status = f"MISMATCH {e}"
            failed.append(name)
        except Exception:
            first_tb = traceback.format_exc(limit=10)
            # infrastructure error: retry once in a fresh session before
            # recording a failure (the r11 graph_pagerank OOM lesson)
            try:
                spark.stop()
            except Exception:
                pass
            spark = _new_session()
            since_restart = 0
            try:
                status = _run_one(spark, qs, oracles, name, sf_dir)
                status += "  (after session restart)"
            except AssertionError as e:
                status = f"MISMATCH {e}"
                failed.append(name)
            except Exception:
                status = (
                    "ERROR (persisted across a fresh session)\nfirst:\n"
                    + first_tb
                    + "retry:\n"
                    + traceback.format_exc(limit=10)
                )
                failed.append(name)
        print(f"{name:32s} {time.time() - t0:6.2f}s  {status}")
    spark.stop()
    print(f"\n{len(names) - len(failed)}/{len(names)} matched; failed: {failed or 'none'}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
