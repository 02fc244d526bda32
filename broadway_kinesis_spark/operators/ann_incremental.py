"""IVF index roll-forward — absorb a vector delta without retraining
(round 11).

The persisted IVF index (operators/ann_persist.py) trains once per corpus
version; this module gives it the same daily-loop step the dedup channels
got (incremental_batch / embedding_incremental / fingerprint_incremental):
a delta of vectors arrives and FOLDS into version N's stored index to
produce version N+1's — the FAISS ``IVF.add`` discipline: the coarse
quantizer (centroids) stays FROZEN at version N and only the posting
lists grow. Version N's vectors are never re-read beyond a posting-table
scan; only the delta is normalized. Retraining is a separate, rarer event
(the persisted builder), exactly as in production ANN serving.

Frozen-quantizer semantics are DECLARED, not hidden: the registered
oracle trains its centroids on ``vec_id < {BOUNDARY}`` only while
candidates span the whole corpus (ann_persist.ivf_oracle_sql's
``centroid_pred``), so the driver row proves the fold + probe serve
exactly that contract — new vectors are findable through version-N
geometry. The known cost (assignment drift if the delta's distribution
shifts) is the retrain trigger every IVF deployment monitors; the recall
report (operators/ann_report.py) is the measuring instrument this repo
already ships for it.

Probe correctness rides the shared :func:`ann_persist.probe_ivf_index`
body — the incremental query IS the persisted serving path pointed at a
rolled directory, which is the deployment claim (day D+1 serves from day
D's fold with no code change).

Reference parity: [TGT] — engine extension (SURVEY §2.B similarity
family; the reference has no similarity surface).
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.operators.ann_persist import (
    build_ivf_index,
    ivf_oracle_sql,
    probe_ivf_index,
)
from broadway_kinesis_spark.operators.similarity import _dot
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

#: version-N / delta boundary for the registered fixture query (the
#: dedup_incremental convention: ids below are "yesterday's corpus").
BOUNDARY = 400


def _dir(sf_dir: str, tag: str) -> str:
    """Deterministic per-(corpus-version, tag) index location — the
    ann_persist._index_dir convention with the roll-forward tag folded
    into the key so a fold can never shadow a from-scratch index."""
    import tempfile

    path = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(path)
        sig = f"{path}:{st.st_mtime_ns}:{st.st_size}:{tag}"
    except OSError:
        sig = f"{path}:{tag}"
    digest = hashlib.md5(sig.encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"bks_ivf_index_{digest}")


def ensure_version_index(
    spark: SparkSession, sf_dir: str, boundary: int = BOUNDARY
) -> str:
    """Version N's index: trained AND populated on ``vec_id < boundary``
    (ann_persist.build_ivf_index's bounded form)."""
    index_dir = _dir(sf_dir, f"v{boundary}")
    build_ivf_index(spark, sf_dir, index_dir, boundary=boundary)
    return index_dir


def roll_forward_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    boundary_n: int = BOUNDARY,
    boundary_n1: int | None = None,
) -> str:
    """Fold the accepted delta ``[boundary_n, boundary_n1)`` (``None`` =
    the rest of the corpus) into version N's stored index: centroids copy
    through FROZEN; postings = stored posting scan ∪ the delta's
    normalized rows, re-written in the same ``partitionBy(label)`` layout
    (a lakehouse deployment appends the delta's rows to the touched
    posting partitions instead of copying — parquet partition dirs append
    per-partition). Atomic via the staging-rename protocol; idempotent
    per (corpus, boundaries)."""
    index_dir = _dir(sf_dir, f"rf-v{boundary_n}-v{boundary_n1}")
    if os.path.isdir(os.path.join(index_dir, "centroids.parquet")):
        return index_dir
    old_dir = ensure_version_index(spark, sf_dir, boundary_n)

    e = load(spark, sf_dir, "embeddings")
    cond = F.col("vec_id") >= boundary_n
    if boundary_n1 is not None:
        cond = cond & (F.col("vec_id") < boundary_n1)
    v = F.col("embedding").cast("array<double>")
    delta = e.filter(cond).select(
        "vec_id", "label", v.alias("v"), F.sqrt(_dot(v, v)).alias("nrm")
    )
    old_postings = spark.read.parquet(
        os.path.join(old_dir, "postings.parquet")
    ).select("vec_id", "label", "v", "nrm")

    staging = index_dir + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    try:
        shutil.copytree(
            os.path.join(old_dir, "centroids.parquet"),
            os.path.join(staging, "centroids.parquet"),
        )
        old_postings.unionByName(delta).write.partitionBy("label").parquet(
            os.path.join(staging, "postings.parquet")
        )
        os.rename(staging, index_dir)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)
        # a concurrent folder winning the rename is success (the
        # ann_persist build protocol)
        if not os.path.isdir(os.path.join(index_dir, "centroids.parquet")):
            raise
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return index_dir


@query(
    "similarity_ann_ivf_incremental",
    oracle=ivf_oracle_sql(centroid_pred=f"vec_id < {BOUNDARY}"),
)
def similarity_ann_ivf_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVF ANN served from a ROLLED index: version N trained on
    ``vec_id < {BOUNDARY}``, the delta folded in with the quantizer
    frozen, and the probe running the SAME serving body as the persisted
    query against the rolled directory. The oracle recomputes the
    declared contract from scratch (centroids over version N only,
    candidates over everything), so the driver row proves delta vectors
    are served through version-N geometry exactly as specified."""
    index_dir = roll_forward_ivf_index(spark, sf_dir, BOUNDARY, None)
    return probe_ivf_index(spark, sf_dir, index_dir)


def vacuum_ivf_versions(
    sf_dir: str, superseded_tags: tuple[str, ...], dry_run: bool = False
) -> list[str]:
    """Drop superseded versions of this corpus's IVF directory index —
    the directory-artifact twin of ``table_build.vacuum_warehouse``'s
    retention idiom (the daily loop calls it after a roll-forward, with
    the now-obsolete version tags, e.g. ``("v400", "rf-v350-v400")``).

    Index locations are digest-named (:func:`_dir` folds the corpus
    signature and tag into an md5), so a prefix listing cannot tell this
    corpus's versions from a sibling corpus's — the safe rule is
    therefore NAME-based, the opposite direction of the warehouse
    vacuum: only a directory this function can DERIVE from (this corpus,
    an explicitly superseded tag) is ever touched, and unknown
    ``bks_ivf_index_*`` directories are never candidates. Serialized
    with the roll-forward by the caller (the daily job runs them in
    sequence), like every retention step in the loop."""
    import shutil

    dropped: list[str] = []
    for tag in superseded_tags:
        path = _dir(sf_dir, tag)
        if os.path.isdir(path):
            if not dry_run:
                shutil.rmtree(path)
            dropped.append(path)
    return dropped
