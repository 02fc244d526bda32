"""One-call corpus version roll-forward — the daily loop's maintenance
step across EVERY persisted artifact family (round 11, session 3).

After the ingest gate accepts a delta, a production loop must advance
every channel's version-N artifact to version N+1 before the next delta
arrives. The per-family folds exist (each channel module ships its
``roll_forward_*``, every one pinned by a fold==scratch table-equality
fence and a probe-on-rolled fence); this module is the orchestration
that a daily job actually calls:

- :func:`roll_forward_corpus` folds the accepted delta
  ``[boundary_n, boundary_n1)`` into ALL families (or a named subset)
  and returns the full version-N+1 artifact map;
- :func:`vacuum_superseded` then applies the retention idiom per family
  — family-scoped ``vacuum_warehouse`` with the rolled names (and their
  still-serving version-N inputs) as exact pins — dropping every older
  table-backed version in one pass.

Families are REGISTERED declaratively (name → fold callable + the
warehouse name-prefixes its tables use), so adding a channel is one
entry, and the orchestrator can never silently skip a family: the e2e
fence (tests/test_round11_s3_channels.py) asserts the registry covers
every ``roll_forward_*`` the package exports. The IVF family is the one
non-table artifact (a directory index under a deterministic per-corpus
location with its own staging-rename atomicity and idempotence); it
folds with everything else but is vacuumed by its own NAME-derived
retention (`ann_incremental.vacuum_ivf_versions` — digest-named dirs
cannot be safely prefix-listed), not the warehouse protocol.

Correctness burden stays with the per-family fences (equality proofs
live next to each fold); the orchestrator's own fences prove COVERAGE
(no exported fold missing from the registry), the artifact map's
existence, and the one-pass retention behavior.

Reference parity: [TGT] — engine extension (SURVEY §2.B infra family).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import SparkSession

from broadway_kinesis_spark.functions.table_build import vacuum_warehouse


@dataclass(frozen=True)
class Family:
    name: str
    #: fold(spark, sf_dir, boundary_n, boundary_n1) -> table name(s) / dir
    fold: Callable
    #: warehouse name-prefixes this family's tables use (empty for
    #: non-table artifacts like the IVF directory index)
    prefixes: tuple[str, ...]
    #: True for families whose boundaries are vec_ids (the embeddings
    #: table), not doc_ids — a deployment's vector and document id spaces
    #: advance independently
    vec_keyed: bool = False


def _families() -> list[Family]:
    # imports are local so loading this module never drags every channel
    # module (and its inline-twin registration) into an unrelated session
    from broadway_kinesis_spark.operators import (
        ann_incremental,
        audiohash_incremental,
        containment_incremental,
        embedding_incremental,
        fingerprint_incremental,
        fuzzy_incremental,
        incremental_batch,
        minhash_incremental,
        semantic_incremental,
        simhash_incremental,
        split_incremental,
        substring_incremental,
        videohash_incremental,
    )

    return [
        Family("digests", incremental_batch.roll_forward_digests, ("_bks_digests_",)),
        Family(
            "ngram_index",
            incremental_batch.roll_forward_ngram_index,
            ("_bks_ngidx_", "_bks_ngdf_"),
        ),
        Family(
            "minhash_bands",
            minhash_incremental.roll_forward_minhash_bands,
            ("_bks_mhbands_",),
        ),
        Family(
            "simhash_counts",
            simhash_incremental.roll_forward_simhash_counts,
            ("_bks_shcounts_",),
        ),
        Family(
            "bottomk_probes",
            containment_incremental.roll_forward_bottomk_probes,
            ("_bks_bkprobes_",),
        ),
        Family(
            "embedding_norms",
            embedding_incremental.roll_forward_embedding_norms,
            ("_bks_embnorms_",),
            vec_keyed=True,
        ),
        Family(
            "phash_bands",
            fingerprint_incremental.roll_forward_phash_bands,
            ("_bks_phbands_",),
        ),
        Family(
            "audio_bands",
            audiohash_incremental.roll_forward_audio_bands,
            ("_bks_aubands_",),
        ),
        Family(
            "video_index",
            videohash_incremental.roll_forward_video_index,
            ("_bks_vidx_", "_bks_vdf_"),
        ),
        Family(
            "fuzzy_prefixes",
            fuzzy_incremental.roll_forward_fuzzy_prefixes,
            ("_bks_fzpfx_",),
        ),
        Family(
            "span_counts",
            substring_incremental.roll_forward_span_counts,
            ("_bks_sscounts_",),
        ),
        Family(
            "semantic_assignments",
            semantic_incremental.roll_forward_semantic_assignments,
            ("_bks_semasg_",),
            vec_keyed=True,
        ),
        Family(
            "split_labels",
            split_incremental.roll_forward_split_labels,
            ("_bks_split_labels_",),
        ),
        Family(
            "ivf_index",
            ann_incremental.roll_forward_ivf_index,
            (),
            vec_keyed=True,
        ),
    ]


def family_names() -> list[str]:
    return [f.name for f in _families()]


def roll_forward_corpus(
    spark: SparkSession,
    sf_dir: str,
    boundary_n: int,
    boundary_n1: int,
    families: set[str] | None = None,
    vec_boundary_n: int | None = None,
    vec_boundary_n1: int | None = None,
) -> dict[str, tuple[str, ...]]:
    """Fold the accepted delta into version N's artifacts for every
    registered family (or the named subset) and return
    ``{family: (artifact name(s)/dir,)}`` — the complete version-N+1
    warehouse map a daily job records. Each fold is idempotent and
    version-keyed by its own module (a fold can never shadow a
    from-scratch build), so re-running after a partial failure resumes
    where it stopped. Vec-keyed families (embeddings-table boundaries)
    take the ``vec_boundary_*`` pair when given — a deployment's vector
    and document id spaces advance independently; the fixture's shared id
    range is why the defaults fall back to the document boundaries."""
    vb_n = boundary_n if vec_boundary_n is None else vec_boundary_n
    vb_n1 = boundary_n1 if vec_boundary_n1 is None else vec_boundary_n1
    out: dict[str, tuple[str, ...]] = {}
    for fam in _families():
        if families is not None and fam.name not in families:
            continue
        b_n, b_n1 = (vb_n, vb_n1) if fam.vec_keyed else (boundary_n, boundary_n1)
        rolled = fam.fold(spark, sf_dir, b_n, b_n1)
        out[fam.name] = rolled if isinstance(rolled, tuple) else (rolled,)
    return out


def day_close(
    spark: SparkSession,
    sf_dir: str,
    state_dir: str,
    boundary_n: int,
    families: set[str] | None = None,
    vec_boundary_n: int | None = None,
    vec_boundary_n1: int | None = None,
) -> tuple[int, dict[str, tuple[str, ...]]]:
    """Close a streaming day into the batch warehouse (round 12, VERDICT
    r11 #4): the streaming ingest gate (streaming/ingest_gate.py) has
    been gating micro-batches all day against its own state stores; at
    day close, the day's ingested documents must fold into the warehouse
    version-N artifacts so tomorrow's batch loop — and tomorrow's gate
    restart — serve version N+1.

    The bridge's contract: the gate's DISPOSITIONS log is the day's
    ledger (one row per ingested doc, accepted or not — the gate keeps
    every arrival's disposition), and the warehouse folds the CANONICAL
    document rows for exactly that id range. Ids are globally unique and
    arrival-ordered (the gate's own streaming contract), so the day's
    ingest is the contiguous range ``[boundary_n, max_ingested + 1)`` —
    asserted, not assumed: a dispositions id below ``boundary_n`` means
    the gate and the warehouse disagree about what version N already
    holds, and folding would double-count it.

    Returns ``(boundary_n1, rolled_map)`` — the advanced boundary and the
    full version-N+1 artifact map of :func:`roll_forward_corpus`. The
    from-scratch equivalence fence (stream N micro-batches → day_close →
    ``pipeline_daily_increment`` on day D+1 over the folds == over
    scratch builds) lives in tests/test_round12_ops.py."""
    import os

    disp_path = os.path.join(state_dir, "dispositions.parquet")
    if not os.path.exists(disp_path):
        raise FileNotFoundError(
            f"no dispositions log under {state_dir} — nothing was ingested"
        )
    from pyspark.sql import functions as F

    bounds = (
        spark.read.parquet(disp_path)
        .agg(
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )  # one-row collect: the day's id range IS driver-side control data
    if bounds.n == 0:
        return boundary_n, {}
    if bounds.lo < boundary_n:
        raise ValueError(
            f"dispositions contain doc_id {bounds.lo} below the warehouse "
            f"version-N boundary {boundary_n} — gate state and warehouse "
            "version disagree; refusing to double-fold"
        )
    boundary_n1 = int(bounds.hi) + 1
    rolled = roll_forward_corpus(
        spark,
        sf_dir,
        boundary_n,
        boundary_n1,
        families=families,
        vec_boundary_n=vec_boundary_n,
        vec_boundary_n1=vec_boundary_n1,
    )
    return boundary_n1, rolled


def vacuum_superseded(
    spark: SparkSession,
    rolled: dict[str, tuple[str, ...]],
    also_retain: tuple[str, ...] = (),
    dry_run: bool = False,
) -> list[str]:
    """The retention idiom over a :func:`roll_forward_corpus` result:
    for every family WITH warehouse prefixes, drop all table versions
    except the rolled artifacts (+ ``also_retain`` — typically the
    version-N inputs still serving until N+1 is blessed). Families in
    ``rolled`` that the registry does not know are an error, not a skip
    (a typo must not silently retain-nothing a family). The IVF
    directory index is never touched here (module docstring)."""
    by_name = {f.name: f for f in _families()}
    unknown = sorted(set(rolled) - set(by_name))
    if unknown:
        raise KeyError(f"unknown artifact families: {unknown}")
    dropped: list[str] = []
    for name, artifacts in rolled.items():
        fam = by_name[name]
        if not fam.prefixes:
            continue
        keep = tuple(artifacts) + tuple(also_retain)
        for prefix in fam.prefixes:
            dropped.extend(
                vacuum_warehouse(
                    spark,
                    prefix=prefix,
                    retain_tokens=set(),
                    retain_names=keep,
                    dry_run=dry_run,
                )
            )
    return dropped
