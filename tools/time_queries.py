#!/usr/bin/env python
"""Time registered queries with the bench protocol (min of N collect runs,
one fresh bench-geometry session) — the round-13 optimization loop's
A/B instrument.

Usage: python tools/time_queries.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), BKS_N_RUNS (default 5).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from broadway_kinesis_spark import registry as _registry  # noqa: E402
from broadway_kinesis_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("BKS_N_RUNS", "5"))
    names = sys.argv[1:]
    qs = _registry.queries()
    spark = build_session("time-queries", shuffle_partitions=8, adaptive=False)
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    out = {}
    for name in names:
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            runs.append(round(time.perf_counter() - t0, 4))
        out[name] = {"min": min(runs), "runs": runs}
        print(f"{name:44s} min={min(runs):.3f} {runs}", flush=True)
    spark.stop()
    print(json.dumps({k: v["min"] for k, v in out.items()}))


if __name__ == "__main__":
    main()
