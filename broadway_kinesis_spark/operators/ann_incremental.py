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
from broadway_kinesis_spark.streaming.snapshot_store import link_tree

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
    spark: SparkSession, sf_dir: str, boundary: int | None = BOUNDARY
) -> str:
    """Version N's index: trained AND populated on ``vec_id < boundary``
    (ann_persist.build_ivf_index's bounded form; ``None`` = the whole
    corpus — the retrain target the drift gate builds)."""
    index_dir = _dir(sf_dir, f"v{boundary}")
    build_ivf_index(spark, sf_dir, index_dir, boundary=boundary)
    return index_dir


def roll_forward_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    boundary_n: int = BOUNDARY,
    boundary_n1: int | None = None,
    src: str | None = None,
) -> str:
    """Fold the accepted delta ``[boundary_n, boundary_n1)`` (``None`` =
    the rest of the corpus) into version N's stored index: centroids
    hard-link through FROZEN; ONLY the delta's normalized rows are
    written, partitioned by their frozen-quantizer label, and version N's
    posting files hard-link into the same ``label=`` partition
    directories (round 12, VERDICT r11 #1 — the FAISS ``IVF.add``
    discipline with the WRITE also delta-bounded; a parquet partition
    directory reads the union of its files, so linked old files + new
    delta files serve as one posting list). Version N's postings are
    never even SCANNED here — the fold's total I/O is the delta plus
    directory metadata. Atomic via the staging-rename protocol;
    idempotent per (corpus, boundaries); content==scratch and inode
    identity pinned by tests/test_incremental_channels.py /
    test_versioned_fold.py."""
    # chained daily loop: ``src`` is the previous day's rolled index dir
    # (fold-on-fold via :func:`fold_ivf_index`); default trains version N
    # from scratch. The tag folds the src identity in so a chained fold
    # can never shadow a from-scratch fold at the same boundaries.
    old_dir = (
        src
        if src is not None
        else ensure_version_index(spark, sf_dir, boundary_n)
    )
    tag = f"rf-v{boundary_n}-v{boundary_n1}"
    if src is not None:
        tag += "-" + hashlib.md5(src.encode()).hexdigest()[:6]
    return fold_ivf_index(spark, sf_dir, old_dir, boundary_n, boundary_n1, tag=tag)


def fold_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    src_dir: str,
    boundary_n: int,
    boundary_n1: int | None,
    tag: str,
) -> str:
    """The generalized fold body: absorb ``[boundary_n, boundary_n1)``
    into ANY stored index directory (a from-scratch version or an earlier
    fold — day k+1 folds day k's output, the chained daily loop). The
    quantizer stays whatever ``src_dir`` carries; drift across a CHAIN of
    folds is what :func:`rolled_recall` measures and
    :func:`should_retrain` gates."""
    index_dir = _dir(sf_dir, tag)
    if os.path.isdir(os.path.join(index_dir, "centroids.parquet")):
        return index_dir

    e = load(spark, sf_dir, "embeddings")
    cond = F.col("vec_id") >= boundary_n
    if boundary_n1 is not None:
        cond = cond & (F.col("vec_id") < boundary_n1)
    v = F.col("embedding").cast("array<double>")
    delta = e.filter(cond).select(
        "vec_id", "label", v.alias("v"), F.sqrt(_dot(v, v)).alias("nrm")
    )

    staging = index_dir + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    try:
        link_tree(
            os.path.join(src_dir, "centroids.parquet"),
            os.path.join(staging, "centroids.parquet"),
        )
        delta.write.partitionBy("label").parquet(
            os.path.join(staging, "postings.parquet")
        )
        old_post = os.path.join(src_dir, "postings.parquet")
        new_post = os.path.join(staging, "postings.parquet")
        # exclusive: a ``label=`` partition dir already holds the delta's
        # freshly written files, so a name collision with a base posting
        # file must fail loudly, not fall through to an overwriting copy
        # (ADVICE r12 — Spark's per-job UUID file names make collisions
        # impossible from this protocol; an existing name is foreign).
        for part in os.listdir(old_post):
            if part.startswith("label="):
                link_tree(
                    os.path.join(old_post, part),
                    os.path.join(new_post, part),
                    exclusive=True,
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


def exact_topk_below(spark: SparkSession, sf_dir: str, boundary: int | None):
    """Brute-force top-{K} cosine neighbors restricted to the INDEXED
    population (``vec_id < boundary``; ``None`` = whole corpus) — the
    honest comparator for a partially-rolled index (an index that has
    absorbed days 0..i must be scored against exact search over exactly
    those days' vectors, or 'recall' conflates drift with coverage).
    Same scoring and tie-break as ``similarity_topk_cosine``."""
    from pyspark.sql import Window

    from broadway_kinesis_spark.operators.similarity import K, N_QUERIES

    e = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    pop = e if boundary is None else e.filter(F.col("vec_id") < boundary)
    rows = pop.select("vec_id", v.alias("v")).select(
        "vec_id", "v", F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nrm")
    )
    q = rows.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    c = rows.select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"), "nrm"
    )
    pairs = q.join(c, F.col("cand_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "cand_id",
        (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("nrm"))).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .drop("rn")
    )


def rolled_recall(
    spark: SparkSession, sf_dir: str, index_dir: str, boundary: int | None
) -> float:
    """Mean per-query recall of the stored index at ``index_dir`` against
    exact search over the same indexed population (``vec_id < boundary``)
    — the drift instrument for a k-times-rolled index (VERDICT r11 #3:
    ``composite_ann_recall`` measures the INLINE index; this measures the
    ROLLED one). Cost: both sides are top-k outputs (N_QUERIES × K rows);
    the exact comparator is the brute-force pass a recall audit pays by
    definition, run on a sampled query set in deployment."""
    from broadway_kinesis_spark.operators.ann_persist import probe_ivf_index

    ex = exact_topk_below(spark, sf_dir, boundary).select("query_id", "cand_id")
    pr = probe_ivf_index(spark, sf_dir, index_dir).select("query_id", "cand_id")
    base = ex.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    hits = (
        ex.join(pr, ["query_id", "cand_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    per_q = base.join(hits, "query_id", "left").select(
        (
            F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_exact")
        ).alias("recall")
    )
    row = per_q.agg(F.avg("recall").alias("r")).collect()[0]
    if row.r is None:
        # Fail CLOSED (ADVICE r12): an empty exact comparator means the
        # indexed population produced no queries (boundary below
        # N_QUERIES, empty embeddings slice, misconfigured corpus) — a
        # drift instrument that reads that as perfect recall can never
        # trip the retrain gate. Misconfiguration is an error, not 100%.
        raise ValueError(
            f"rolled_recall: exact comparator over boundary={boundary} "
            f"produced no queries — indexed population is empty or below "
            "N_QUERIES; refusing to report recall"
        )
    return float(row.r)


def should_retrain(recall: float, recall_floor: float = 0.9) -> bool:
    """The retrain trigger the daily loop calls after each fold: True when
    the rolled index's measured recall (:func:`rolled_recall`) fell below
    the deployment's floor — time to re-run ``build_ivf_index`` (a fresh
    quantizer over the accumulated corpus) instead of folding again.
    Deliberately a pure threshold: hysteresis/scheduling policy belongs
    to the caller; the engine's job is the measurement."""
    return recall < recall_floor


def vacuum_ivf_paths(
    paths: tuple[str, ...], dry_run: bool = False
) -> list[str]:
    """Path-form of :func:`vacuum_ivf_versions` for callers that hold the
    superseded index DIRECTORIES rather than their tags (the daily
    orchestrator's drift-retrain path — ``roll_forward_corpus`` knows the
    fold's returned dir, not the tag it was derived from). The same safety
    rule, enforced structurally instead of by derivation: only a path
    whose basename carries this module's ``bks_ivf_index_`` prefix under
    the system temp dir is ever touched — anything else raises, so a
    caller bug can never turn retention into an arbitrary rmtree."""
    import tempfile

    tmp = os.path.realpath(tempfile.gettempdir())
    dropped: list[str] = []
    for path in paths:
        real = os.path.realpath(path)
        if os.path.dirname(real) != tmp or not os.path.basename(
            real
        ).startswith("bks_ivf_index_"):
            raise ValueError(
                f"refusing to vacuum {path!r}: not a bks_ivf_index_* "
                "directory under the temp dir"
            )
        if os.path.isdir(real):
            if not dry_run:
                shutil.rmtree(real)
            dropped.append(real)
    return dropped


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
