#!/usr/bin/env python
"""Capture .explain("formatted") for every headline bench query into
plans/r14/<query>_<tag>.txt (tag = before/after), using the same session
geometry as bench.py so plan shapes match what the bench actually runs.

Usage: python tools/capture_plans_r14.py [before|after] [query ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINE  # noqa: E402
from broadway_kinesis_spark import registry as _registry  # noqa: E402
from broadway_kinesis_spark.plans.audit import formatted_plan  # noqa: E402
from broadway_kinesis_spark.session import build_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)

    queries = _registry.queries()
    if only:
        names = [n for n in queries if n in only]
    else:
        names = [n for n in HEADLINE if n in queries]

    spark = build_session("plan-capture", shuffle_partitions=8, adaptive=False)
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = formatted_plan(df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {plan.count('Exchange')} Exchange lines -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
