"""Cross-run persisted IVF index: train once, probe many (VERDICT r3 #4).

``similarity_ann_ivf_probe`` (similarity.py) recomputes its coarse
centroids inside every query plan — correct, but a real 100 TB pipeline
trains the index ONCE and serves probe-only queries from storage. This
module adds that lifecycle:

- **train** (:func:`build_ivf_index`): centroids = per-cluster mean vectors
  on the exact binary-scaled-long path (bitwise-deterministic, identical to
  the in-plan operator), postings = (vec_id, v, nrm) written
  ``partitionBy(label)`` — the on-disk layout IS the inverted file: each
  cluster's posting list is its own parquet directory.
- **probe** (:func:`similarity_ann_ivf_persisted`): read the (k x dim)
  centroid table, rank clusters per query by squared L2, take the nprobe
  nearest, then read ONLY those clusters' posting directories — the probed
  label set is bounded by n_queries * nprobe (literal ``isin`` filter →
  static partition pruning; the scan never lists the other clusters), and
  exact cosine re-ranks the fetched candidates.

The index directory is keyed by the embeddings file's (path, mtime, size)
signature, built atomically (write to a staging dir, ``os.rename``), and
reused across queries/processes: the second call runs NO training scan
(tests/test_ann_persist.py pins both the reuse and the probe plan's
sources). At cluster scale the same layout lands in object storage with a
transactional table on top; the plan shapes (broadcast centroids,
partition-pruned posting fetch, bounded probe set) carry over unchanged.

Oracle: the DuckDB SQL recomputes centroids + probes from scratch — valid
because training is bitwise-deterministic, so the persisted index equals
the recomputation.

Reference parity: [TGT] — the reference (an ingest connector) has no
similarity surface; this extends the engine beyond it.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from broadway_kinesis_spark.operators.similarity import (
    K,
    N_PROBE,
    N_QUERIES,
    _dot,
)
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

_S = float(1 << 40)  # binary centroid quantum (exact /2^40; see similarity.py)


def _index_dir(sf_dir: str) -> str:
    """Deterministic per-corpus-version index location (temp space)."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(path)
        sig = f"{path}:{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        sig = path
    digest = hashlib.md5(sig.encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"bks_ivf_index_{digest}")


def build_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    boundary: int | None = None,
) -> None:
    """Train + persist the IVF index (idempotent, atomic).

    Centroids: per-`label` means, each component quantized to 2^-40 units,
    summed as primitive longs, divided by an exact power of two — the same
    math as the in-plan operator, so the stored index is bit-reproducible.
    Postings: the vectors plus their precomputed norms, hash-partitioned on
    disk by cluster id. With ``boundary``, both train and populate on
    ``vec_id < boundary`` only — the version-N index of the incremental
    family (operators/ann_incremental.py).
    """
    if os.path.isdir(os.path.join(index_dir, "centroids.parquet")):
        return
    e = load(spark, sf_dir, "embeddings")
    if boundary is not None:
        e = e.filter(F.col("vec_id") < boundary)
    v = F.col("embedding").cast("array<double>")
    e = e.select("vec_id", "label", v.alias("v"), F.sqrt(_dot(v, v)).alias("nrm"))

    expl = e.select("label", F.posexplode("v").alias("pos", "x"))
    cdim = expl.groupBy("label", "pos").agg(
        (
            F.sum(F.floor(F.col("x") * _S + F.lit(0.5)).cast("long")).cast("double")
            / _S
            / F.count(F.lit(1))
        ).alias("c")
    )
    cent = cdim.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cv")
    )

    staging = index_dir + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    try:
        # Arrays round-trip losslessly through parquet doubles, so the
        # probe-side math sees exactly the trained values.
        cent.write.parquet(os.path.join(staging, "centroids.parquet"))
        e.write.partitionBy("label").parquet(os.path.join(staging, "postings.parquet"))
        os.rename(staging, index_dir)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)
        # A concurrent builder winning the rename is success; anything else
        # (including a half-written survivor) must surface.
        if not os.path.isdir(os.path.join(index_dir, "centroids.parquet")):
            raise
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise


def ivf_oracle_sql(centroid_pred: str = "TRUE") -> str:
    """The from-scratch DuckDB mirror of an IVF probe. ``centroid_pred``
    bounds the TRAINING population (the incremental family trains on
    version N only — frozen coarse quantizer — while candidates span the
    whole corpus); the default trains on everything, the persisted
    query's semantics."""
    return f"""
    WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v,
               sqrt(list_sum(list_transform(list_zip(embedding::DOUBLE[], embedding::DOUBLE[]), x -> x[1]*x[2]))) AS nrm
        FROM embeddings
    ), expl AS (
        SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x
        FROM e WHERE {centroid_pred}
    ), cdim AS (
        SELECT label, pos,
               CAST(SUM(CAST(FLOOR(x * 1099511627776.0 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 1099511627776.0 / COUNT(*) AS c
        FROM expl GROUP BY label, pos
    ), cent AS (
        SELECT label, list(c ORDER BY pos) AS cv FROM cdim GROUP BY label
    ), q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
    probes AS (
        SELECT query_id, label FROM (
            SELECT q.vec_id AS query_id, cent.label,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_sum(list_transform(list_zip(q.v, cent.cv),
                                                        x -> (x[1]-x[2])*(x[1]-x[2]))),
                                cent.label) AS rn
            FROM q CROSS JOIN cent
        ) WHERE rn <= {N_PROBE}
    )
    SELECT query_id, cand_id, cos_sim FROM (
        SELECT query_id, cand_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, cand_id) AS rn
        FROM (
            SELECT p.query_id, c.vec_id AS cand_id,
                   list_sum(list_transform(list_zip(q.v, c.v), x -> x[1]*x[2])) / (q.nrm * c.nrm) AS cos_sim
            FROM probes p
            JOIN q ON q.vec_id = p.query_id
            JOIN e c ON c.label = p.label AND c.vec_id <> p.query_id
        )
    ) WHERE rn <= {K}
    """


@query("similarity_ann_ivf_persisted", oracle=ivf_oracle_sql())
def similarity_ann_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN against the PERSISTED index: ensure the index exists (first
    call trains it; later calls — and later processes — reuse it), then
    serve the probe entirely from storage: broadcast the stored centroids,
    rank per query, fetch only the probed posting directories via a literal
    partition filter, exact-cosine re-rank. Per-query candidate work is
    O(N * nprobe / k) and the training scan amortizes to zero across the
    query stream."""
    index_dir = _index_dir(sf_dir)
    build_ivf_index(spark, sf_dir, index_dir)
    return probe_ivf_index(spark, sf_dir, index_dir)


def probe_ivf_index(
    spark: SparkSession, sf_dir: str, index_dir: str
) -> DataFrame:
    """Serve the probe from a stored index directory (any builder:
    :func:`build_ivf_index` or the incremental family's roll-forward)."""
    cent = spark.read.parquet(os.path.join(index_dir, "centroids.parquet"))
    e = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    q = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", v.alias("qv"))
        .select(
            F.col("vec_id").alias("query_id"),
            "qv",
            F.sqrt(_dot(F.col("qv"), F.col("qv"))).alias("qn"),
        )
    )

    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w_probe = Window.partitionBy("query_id").orderBy("d2", "plabel")
    probes = (
        q.crossJoin(F.broadcast(cent.select(F.col("label").alias("plabel"), "cv")))
        .select("query_id", "qv", "qn", "plabel", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= N_PROBE)
        .select("query_id", "qv", "qn", "plabel")
    )

    # The probed label set is bounded by n_queries * nprobe BY CONSTRUCTION
    # (tiny at any corpus scale) — collecting it turns the posting fetch
    # into a literal isin filter on the partition column: static partition
    # pruning, the scan lists only the probed cluster directories. This is
    # the "fetch these inverted lists" access pattern of every IVF serving
    # system, expressed as a pruned columnar scan.
    probed = sorted({r.plabel for r in probes.select("plabel").distinct().collect()})
    postings = (
        spark.read.parquet(os.path.join(index_dir, "postings.parquet"))
        .filter(F.col("label").isin(probed))
        .select(F.col("vec_id").alias("cand_id"), F.col("label").alias("clabel"), "v", "nrm")
    )

    pairs = postings.join(
        F.broadcast(probes),
        (F.col("clabel") == F.col("plabel")) & (F.col("cand_id") != F.col("query_id")),
    )
    scored = pairs.select(
        "query_id",
        "cand_id",
        (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= K).drop("rn")
