#!/usr/bin/env python
"""Build a K-times replicated derivative of a fixture dir for SCALE testing.

Usage: python tools/make_scale_corpus.py [src_sf_dir] [dst_dir] [K]
       (defaults: /root/testdata/sf0.1 /tmp/sfx10 10)

Purpose: the driver fixtures are single-row-group parquet, which hides
scan-parallelism behavior; this tool writes a K-times larger corpus with
realistic multi-row-group files so `SPARK_GRAFT_SF_DIR=<dst> python
bench.py` measures how query time scales with data volume (results recorded
in BASELINE.md §scaling). Key columns are offset per replica so join
fan-outs and group cardinalities scale linearly instead of multiplying —
each replica is a disjoint "tenant" of the original keys.

This corpus is for throughput measurement only; correctness always runs
against the driver's own fixtures (TESTDATA.md).
"""

from __future__ import annotations

import os
import sys

import duckdb

# Per-replica key offsets — larger than any key in the source tables so
# replicas never collide.
OFF = 10_000_000
KEYS = {
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "orders": ("o_orderkey", "o_custkey"),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "events": ("event_id", "user_id"),
}
# Small row groups for the row-light tables so they still split.
ROW_GROUP = {"documents": 5000, "embeddings": 5000, "events": 5000}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx10"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):  # dims replicate as-is (keys are shared)
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, keys in KEYS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        exprs = ", ".join(
            f"{c} + r*{OFF} AS {c}" if c in keys else c for c in cols
        )
        rg = ROW_GROUP.get(t, 122_880)
        con.execute(
            f"COPY (SELECT {exprs} FROM read_parquet('{src}/{t}.parquet'), "
            f"range({k}) AS t(r)) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {rg})"
        )
    print(f"wrote {k}x corpus to {dst}")


if __name__ == "__main__":
    main()
