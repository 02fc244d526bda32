"""Iterative PageRank on DataFrames — the third iterative algorithm.

Completes the iterative family: similarity.py unrolls Lloyd k-means
(dense numeric state), clustering.py runs Hash-Min label propagation to
fixpoint (monotone converging state); this module adds the classic
damped-random-surfer recurrence over an explicit edge list — the shape of
reputation/centrality scoring over web-graph-sized link data (Page et al.
1999, public). Own module per the per-file staleness rule
(tests/test_registry_window.py).

The graph: the supplier—part co-occurrence structure of ``lineitem``
(distinct (l_suppkey, l_partkey) pairs), symmetrized so every node has
out-degree >= 1 — no dangling-mass term needed, and the recurrence is a
total function of the edge list.

Exactness design: ranks are integer quanta. Init R0 per node; each step
is share(u) = r(u) DIV deg(u), then r'(v) = BASE + (DAMP_NUM * SUM
shares) DIV DAMP_DEN. Every quantity is a positive BIGINT and both
engines' integer division truncates toward zero identically on
positives, so ITERS unrolled rounds are bitwise-reproducible across
engines, partitionings, and merge orders — the same
quantize-then-exact-integer trick as textstats.py's log-probs.

Reference parity: [TGT] — BASELINE.json north star; no processing
surface in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

P_OFF = 10_000_000      # part node-id offset (disjoint from supplier ids)
R0 = 1_000_000_000      # initial rank quanta per node
BASE = 150_000_000      # teleport term: (1 - 0.85) * R0
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio
ITERS = 3
TOP = 50


def _oracle() -> str:
    """Unrolled-iteration oracle: same integer recurrence, CTE per round."""
    parts = [
        f"""
    WITH fwd AS (
        SELECT DISTINCT l_suppkey AS src, l_partkey + {P_OFF} AS dst
        FROM lineitem
    ), edges AS (
        SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd
    ), deg AS (
        SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src
    ), r0 AS (
        SELECT node, CAST({R0} AS BIGINT) AS r FROM deg
    )"""
    ]
    for i in range(ITERS):
        parts.append(
            f""", r{i + 1} AS (
        SELECT e.dst AS node,
               CAST({BASE} + ({DAMP_NUM} * CAST(SUM(r.r // deg.d) AS BIGINT))
                    // {DAMP_DEN} AS BIGINT) AS r
        FROM edges e
        JOIN r{i} r ON e.src = r.node
        JOIN deg ON e.src = deg.node
        GROUP BY e.dst
    )"""
        )
    parts.append(
        f"""
    SELECT node AS node_id,
           CASE WHEN node >= {P_OFF} THEN 'part' ELSE 'supplier' END AS node_type,
           r AS rank_q
    FROM r{ITERS}
    ORDER BY rank_q DESC, node_id
    LIMIT {TOP}
    """
    )
    return "".join(parts)


@query("graph_pagerank", oracle=_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank, ITERS unrolled rounds over the symmetrized
    supplier—part graph; output is the TOP (50) nodes by final rank
    quanta (ties broken on node id).

    Scale posture: the edge list is the only corpus-sized dataset and it
    hash-partitions on the join key every round — each iteration is one
    equi-join of edges against the (node-sized) rank vector plus one
    map-side-combinable aggregation onto the destination, the textbook
    distributed-PageRank plan. The static degree table joins alongside;
    at web scale both rank and degree broadcast per-partition ranges or
    co-partition with the edges (bucketed storage, operators/bucketed.py
    pattern) so the edge list itself NEVER reshuffles across iterations.
    Unrolling keeps everything one lazy Catalyst plan — no driver-side
    loop state, no actions between rounds; iteration count is a constant
    here (fixpoint looping with a convergence check is clustering.py's
    territory)."""
    li = load(spark, sf_dir, "lineitem")
    fwd = li.select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") + P_OFF).alias("dst"),
    ).distinct()
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed("src", "node")
    r = deg.select("node", F.lit(R0).cast("long").alias("r"))
    for _ in range(ITERS):
        contrib = (
            edges.join(r, edges.src == r.node)
            .join(deg.withColumnRenamed("node", "dnode"), F.col("src") == F.col("dnode"))
            .select("dst", F.expr("r div d").alias("share"))
        )
        r = contrib.groupBy("dst").agg(
            (F.lit(BASE) + F.expr(f"({DAMP_NUM} * sum(share)) div {DAMP_DEN}"))
            .cast("long")
            .alias("r")
        ).withColumnRenamed("dst", "node")
    return (
        r.select(
            F.col("node").alias("node_id"),
            F.when(F.col("node") >= P_OFF, F.lit("part"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.col("r").alias("rank_q"),
        )
        .orderBy(F.desc("rank_q"), F.asc("node_id"))
        .limit(TOP)
    )
