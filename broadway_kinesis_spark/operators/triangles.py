"""Degree-oriented triangle counting — the fourth graph operator.

Triangles (and the clustering coefficient they imply) are the standard
cohesion measure over co-occurrence graphs: here two suppliers are
adjacent iff they ship at least one common part (the supplier projection
of graph.py's bipartite supplier—part structure, which itself is
triangle-free by construction). Community-heavy catalogs triangle
densely; adversarial/fragmented ones don't.

The scale trick is DEGREE ORIENTATION (the classic sequential
formulation of Latapy 2008 / Schank's forward algorithm, expressed
relationally): direct every undirected edge from its lower-(degree, id)
endpoint to the higher one. The orientation is acyclic, every triangle
has exactly ONE source node with two out-edges, and — the bound that
matters — out-degrees are O(√m), so the wedge join generates
O(m·√m) candidates instead of the Σdeg² of an unoriented join on hub
nodes. Wedges close against the oriented edge list with one more
equi-join; no node ever re-counts a triangle, so no /3 or /6 fixups that
would mask double counting.

The wedge pair and the edge orientation MUST share one comparator: a
wedge (v, w) out of u closes through the edge oriented from the
lower-(degree, id) of {v, w} to the higher, so ordering wedge pairs by
raw id silently drops triangles whose closing edge orients "backward"
in id order (caught by the brute-force test: {4,5,6} with 5→4, 5→6,
6→4). Nodes are therefore relabelled by a single sortable orientation
key k = degree·K + id, and edges, wedge pairs, and closures all compare
on k.

Everything is exact integers; the one ratio (global clustering
coefficient = 3·triangles / open+closed wedges) is a single division of
exact BIGINTs, identical in both engines.

Reference parity: [TGT] — engine extension (SURVEY §2.B graph family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

#: hub cap — parts shipped by more than this many suppliers are excluded
#: from the projection. The same guard as ngram dedup's DF_CAP stop
#: shingles: a part half the catalog ships carries no cohesion signal but
#: contributes C(n,2) edges; uncapped, the sf0.1 projection saturates
#: toward the complete supplier graph (measured: ~86 s and clustering
#: coeff -> 1, i.e. pure noise). The cap bounds edge volume by
#: parts * C(HUB_CAP, 2) under ANY popularity skew.
HUB_CAP = 10
#: orientation-key stride: k = degree * K_STRIDE + node_id is a total
#: order identical to (degree, id) while staying one sortable BIGINT.
#: Valid while node ids < K_STRIDE (supplier keys are far below 1e9).
K_STRIDE = 1_000_000_000


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH sp0 AS (
        SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ), keep AS (
        SELECT p FROM sp0 GROUP BY p HAVING COUNT(*) <= {HUB_CAP}
    ), sp AS (
        SELECT sp0.s, sp0.p FROM sp0 JOIN keep ON sp0.p = keep.p
    ), coedge AS (
        SELECT DISTINCT a.s AS u, b.s AS v
        FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
    ), deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT u AS node FROM coedge
            UNION ALL SELECT v AS node FROM coedge
        ) GROUP BY node
    ), oriented AS (
        SELECT LEAST(du.d * {K_STRIDE} + e.u, dv.d * {K_STRIDE} + e.v) AS a,
               GREATEST(du.d * {K_STRIDE} + e.u, dv.d * {K_STRIDE} + e.v) AS b
        FROM coedge e
        JOIN deg du ON e.u = du.node
        JOIN deg dv ON e.v = dv.node
    ), tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM oriented e1
        JOIN oriented e2 ON e1.a = e2.a AND e1.b < e2.b
        JOIN oriented e3 ON e3.a = e1.b AND e3.b = e2.b
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges
        FROM deg
    ), ne AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM coedge
    )
    SELECT stats.n_nodes, ne.n_edges, stats.n_wedges, tri.n_triangles,
           CAST(3 * tri.n_triangles AS DOUBLE) / stats.n_wedges
               AS clustering_coeff
    FROM stats, ne, tri
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles of the supplier co-shipment graph via degree-oriented
    wedge closure: node/edge/wedge totals, the exact triangle count, and
    the global clustering coefficient."""
    li = load(spark, sf_dir, "lineitem")
    sp0 = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    keep = (
        sp0.groupBy("p")
        .agg(F.count(F.lit(1)).alias("n_sup"))
        .filter(F.col("n_sup") <= HUB_CAP)
        .select("p")
    )
    sp = sp0.join(keep, "p")
    a = sp.select(F.col("s").alias("u"), "p")
    b = sp.select(F.col("s").alias("v"), "p")
    coedge = (
        a.join(b, "p").filter(F.col("u") < F.col("v")).select("u", "v").distinct()
    )
    deg = (
        coedge.select(F.col("u").alias("node"))
        .unionAll(coedge.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    e = (
        coedge.join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), "v")
    )
    ku = F.col("du") * F.lit(K_STRIDE) + F.col("u")
    kv = F.col("dv") * F.lit(K_STRIDE) + F.col("v")
    oriented = e.select(
        F.least(ku, kv).alias("a"), F.greatest(ku, kv).alias("b")
    ).cache()
    e1 = oriented.select(F.col("a"), F.col("b").alias("b1"))
    e2 = oriented.select(F.col("a"), F.col("b").alias("b2"))
    wedges = e1.join(e2, "a").filter(F.col("b1") < F.col("b2"))
    closing = oriented.select(
        F.col("a").alias("b1"), F.col("b").alias("b2")
    )
    tri = wedges.join(closing, ["b1", "b2"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
    )
    ne = coedge.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            (
                (F.lit(3) * F.col("n_triangles")).cast("double")
                / F.col("n_wedges")
            ).alias("clustering_coeff"),
        )
    )
