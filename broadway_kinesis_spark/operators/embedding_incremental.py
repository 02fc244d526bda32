"""Batch incremental corpus-version dedup — EMBEDDING channel (round 11).

Round 10/11 closed the daily-production loop for the TEXT channels
(``incremental_batch``: exact digests + ngram index, with roll-forward)
and the split (``split_incremental``); this module extends the same loop
to the embedding near-dup channel: corpus version N+1 arrives as a delta
of vectors, and the delta is deduplicated against version N's PERSISTED
normalized-vector table — version N's embeddings are never re-normalized
or re-scanned beyond the blocks the delta touches. Version N here is
``vec_id < {BOUNDARY}`` (the ``dedup_incremental`` fixture convention);
the parameterized body takes the boundary so scale runs place it per
corpus (x10/x100 rows use a 90/10 split).

Why cost tracks the DELTA, not the corpus: blocking is by ``label`` (the
coarse-quantizer key, exactly as the inline ``dedup_embedding_cosine``),
and a delta-touching pair shares its block with a delta vector — so the
stored side first LEFT-SEMI prunes to the delta's label set (broadcast:
the distinct labels of a delta are small by construction) and the
per-block Arrow kernel scores only ``delta_rows x block_rows``
(``u_delta @ u_all.T``), never the inline twin's ``block_rows²``. At
100 TB the stored table is (id, label, unit-norm stats) — the artifact a
production embedding pipeline maintains anyway — and blocks without new
vectors are never read (partition-prunable on ``label`` in a real
deployment; the semi-join states the same bound here).

Oracle protocol: the registered oracle is the INLINE channel's oracle
(read from the registry at module load, the dedup_persist pattern)
wrapped in one restriction — ``WHERE vec2 >= {BOUNDARY}`` — because
pairs are emitted (vec1 < vec2) and every version-N id sits below every
delta id, so "pairs the delta introduces" is exactly ``vec2 >=
boundary``. Verification re-scores candidates with the same sequential
float64 fold as the inline twin, so emitted ``cos_sim`` stays
bitwise-equal to DuckDB's.

Roll-forward (VERDICT r10 #3 applied to this channel):
:func:`roll_forward_embedding_norms` folds the accepted delta's
normalized rows into version N's table to produce version N+1's — the
stored side passes through as a scan, only the delta is normalized, and
fold(N, delta) == build(N+1) is pinned by tests/test_incremental_channels.py
(table equality), with probe-on-rolled == probe-on-scratch proving the
fold is consumable by the next day's delta.

Measured delta-cost rows: BASELINE.md §round-11 "embedding/fingerprint
incremental" (fresh x10/x100, 90/10 boundary).

Reference parity: [TGT] — no relational/dedup surface in the reference
(lib/ is a Kinesis ingestion pipeline); engine extension per SURVEY §2.B.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.functions.table_build import corpus_sig, ensure_table
from broadway_kinesis_spark.functions.versioned_fold import (
    fold_policy,
    link_forward_table,
)
from broadway_kinesis_spark.operators.dedup import COS_T
from broadway_kinesis_spark.operators import dedup as _dedup  # noqa: F401 (registers the inline twin)
from broadway_kinesis_spark.registry import REGISTRY, query
from broadway_kinesis_spark.session import load

#: version-N / delta boundary for the registered fixture queries (the
#: dedup_incremental convention: ids below are "yesterday's corpus").
BOUNDARY = 400

_NORMS_POLICY = "r11:cosnorm"

#: the inline channel's oracle OBJECT — importing operators.dedup above ran
#: its @query decorator, so this lookup can never miss nor drift.
_INLINE_ORACLE = REGISTRY["dedup_embedding_cosine"].oracle


def _norms(e: DataFrame) -> DataFrame:
    """(vec_id, label, v float64[], nrm) — the exact projection the inline
    channel computes per invocation; here it is computed once per corpus
    version and persisted."""
    v = F.col("embedding").cast("array<double>")
    dot = F.aggregate(
        F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return e.select("vec_id", "label", v.alias("v"), F.sqrt(dot).alias("nrm"))


def ensure_embedding_norms(
    spark: SparkSession, sf_dir: str, boundary: int = BOUNDARY
) -> str:
    """Persist version N's normalized-vector table (vec_id, label, v,
    nrm) for ``vec_id < boundary`` — the artifact an embedding pipeline
    carries between corpus versions (normalization is paid once)."""
    pol = hashlib.md5(f"{_NORMS_POLICY}:v{boundary}".encode()).hexdigest()[:8]
    sig = corpus_sig(sf_dir, ("embeddings",))
    name = f"_bks_embnorms_{pol}_{sig}"

    def build() -> DataFrame:
        e = load(spark, sf_dir, "embeddings")
        return _norms(e.filter(F.col("vec_id") < boundary))

    return ensure_table(spark, name, build)


def roll_forward_embedding_norms(
    spark: SparkSession,
    sf_dir: str,
    boundary_n: int,
    boundary_n1: int,
    src: str | None = None,
) -> str:
    """Fold the accepted delta ``[boundary_n, boundary_n1)`` into version
    N's persisted norms table to produce version N+1's: only the delta is
    normalized AND only the delta's rows are written (round 12, VERDICT
    r11 #1) — version N's data files hard-link into the new location, so
    the fold's write cost tracks the delta, never the artifact. The table
    name keys the roll-forward policy + BOTH boundaries so a fold can
    never shadow a from-scratch build; fold(N, delta) == build(N+1) is
    pinned by tests/test_incremental_channels.py, inode identity of the
    linked remainder by tests/test_versioned_fold.py."""
    # chained daily loop: ``src`` names the previous day's rolled table
    # (fold-on-fold); default is the from-scratch version-N build.
    old_tbl = src if src is not None else ensure_embedding_norms(spark, sf_dir, boundary_n)
    pol = fold_policy(_NORMS_POLICY, boundary_n, boundary_n1, src)
    sig = corpus_sig(sf_dir, ("embeddings",))
    name = f"_bks_embnorms_{pol}_{sig}"

    def delta_build() -> DataFrame:
        e = load(spark, sf_dir, "embeddings")
        return _norms(
            e.filter(
                (F.col("vec_id") >= boundary_n)
                & (F.col("vec_id") < boundary_n1)
            )
        )

    return link_forward_table(spark, name, old_tbl, delta_build)


@query(
    "dedup_incremental_embedding",
    oracle=f"""
    SELECT vec1, vec2, cos_sim FROM ({_INLINE_ORACLE}) WHERE vec2 >= {BOUNDARY}
    """,
)
def dedup_incremental_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs the DELTA introduces — cosine >= {COS_T}
    within label blocks, restricted to pairs with at least one delta side
    — computed against version N's persisted normalized-vector table
    instead of re-normalizing the corpus. The oracle is the inline
    channel's oracle restricted to ``vec2 >= {BOUNDARY}``, so the driver
    row proves the persisted artifact + delta-sided kernel serve exactly
    the from-scratch answer."""
    return incremental_embedding_pairs(spark, sf_dir)


#: delta rows scored per kernel step: bounds the transient similarity
#: matrix at chunk x block_rows x 8 bytes regardless of block size (at a
#: 20 k-row block: ~650 MB), the "a block must fit one task" posture made
#: chunk-exact.
_KERNEL_CHUNK = 4096


def incremental_embedding_pairs(
    spark: SparkSession,
    sf_dir: str,
    boundary: int = BOUNDARY,
    norms_tbl: str | None = None,
    threshold: float = COS_T,
) -> DataFrame:
    """Parameterized body of ``dedup_incremental_embedding`` — scale runs
    place ``boundary`` per corpus; ``norms_tbl`` overrides the version-N
    artifact with a :func:`roll_forward_embedding_norms` fold so day
    D+1's delta runs on day D's fold. ``threshold`` is a PER-CORPUS
    property (the round-7 split lesson, BASELINE.md: on clustered
    embeddings a fixture-tuned 0.35 reports topic membership, not
    duplication — scale corpora measure at their own near-identical
    ridge, e.g. 0.99).

    Shape: delta normalizes fresh; stored side semi-join-prunes to the
    delta's labels (broadcast — a delta's distinct label set is small);
    per-label Arrow kernel scores ``delta x block`` and emits id pairs
    where the OTHER id is smaller (captures old-delta pairs and each
    delta-delta pair exactly once); exact-fold verify re-joins vectors,
    candidate-bounded, exactly like the inline twin's tier 2."""
    import numpy as np
    import pandas as pd

    stored = spark.table(
        norms_tbl
        if norms_tbl is not None
        else ensure_embedding_norms(spark, sf_dir, boundary)
    )
    e = load(spark, sf_dir, "embeddings")
    delta = _norms(e.filter(F.col("vec_id") >= boundary))
    delta_labels = delta.select("label").distinct()
    old = stored.join(F.broadcast(delta_labels), "label", "left_semi")
    blocks = old.withColumn("is_delta", F.lit(False)).unionByName(
        delta.withColumn("is_delta", F.lit(True))
    )
    slack = threshold - 1e-9

    def probe_block(pdf: "pd.DataFrame") -> "pd.DataFrame":
        d_mask = pdf["is_delta"].to_numpy()
        if not d_mask.any() or len(pdf) < 2:
            return pd.DataFrame({"vec1": [], "vec2": []}).astype("int64")
        m = np.stack(pdf["v"].to_numpy())
        u = m / pdf["nrm"].to_numpy()[:, None]
        ids = pdf["vec_id"].to_numpy()
        ud, idd = u[d_mask], ids[d_mask]
        # delta rows x ALL rows — O(|delta_block| * |block| * dim), never
        # the inline twin's block². Keep (other < delta): old-delta pairs
        # (old ids all < boundary <= delta ids) and each delta-delta pair
        # exactly once (at i = its larger side). Chunked over the delta
        # rows so the transient sim matrix is bounded by _KERNEL_CHUNK x
        # block_rows whatever the block size.
        outs = []
        for c in range(0, len(idd), _KERNEL_CHUNK):
            sim = ud[c : c + _KERNEL_CHUNK] @ u.T
            keep = (sim >= slack) & (
                ids[None, :] < idd[c : c + _KERNEL_CHUNK, None]
            )
            i, j = np.nonzero(keep)
            outs.append(
                pd.DataFrame({"vec1": ids[j], "vec2": idd[c + i]})
            )
        return pd.concat(outs, ignore_index=True)

    cand = blocks.groupBy("label").applyInPandas(
        probe_block, "vec1 long, vec2 long"
    )
    # exact verify tier: same fold-order float64 dot as the inline twin,
    # so cos_sim is bitwise-equal to the oracle's list_sum. Vector sides
    # come from the STORED table (old) and the delta projection — never a
    # re-normalization of version N (parquet round-trips the doubles
    # exactly, so the stored nrm/v are bitwise the build-time ones).
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    a = blocks.select(
        F.col("vec_id").alias("vec1"), F.col("v").alias("v1"), F.col("nrm").alias("n1")
    )
    b = delta.select(
        F.col("vec_id").alias("vec2"), F.col("v").alias("v2"), F.col("nrm").alias("n2")
    )
    pairs = cand.join(a, "vec1").join(b, "vec2")
    cos = dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))
    return pairs.select("vec1", "vec2", cos.alias("cos_sim")).filter(
        F.col("cos_sim") >= threshold
    )
