"""Round-12 fences: day-close bridge, IVF drift-on-rolled + retrain
trigger, chained folds, and the fuzzy tight incremental tier.

- **day-close** (VERDICT r11 #4): stream the fixture's delta through the
  streaming ingest gate in micro-batches, ``day_close`` folds the day
  into the warehouse, and day D+1's ``pipeline_daily_increment`` over
  the folded artifacts equals the from-scratch builds — the streaming
  and batch loops meet at one version boundary.
- **IVF drift** (VERDICT r11 #3): ``rolled_recall`` measures the
  k-times-rolled index against exact search over the indexed
  population; a PLANTED drift delta (a cluster the frozen quantizer
  cannot represent) trips ``should_retrain``, a same-distribution delta
  does not.
- **fuzzy tight tier** (VERDICT r11 #2): the tight incremental probe ==
  the inline tight channel restricted to delta-touching pairs.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from broadway_kinesis_spark.session import load
from tests.test_incremental_channels import _rows, _write_embeddings


# ------------------------------------------------------------- day close
def _gate_fixture_range(spark, sf_dir, state: str, batches) -> None:
    from broadway_kinesis_spark.streaming.ingest_gate import gate_batch

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    for lo, hi in batches:
        gate_batch(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            state,
        )


def test_day_close_folds_equal_scratch(spark, sf_dir, tmp_path):
    """Three micro-batches of the fixture delta [400, 450) through the
    gate, one day_close call, then day D+1 ([450, ...)) gated against the
    FOLDED warehouse == against from-scratch version-450 builds."""
    from broadway_kinesis_spark.operators.corpus_versioning import day_close
    from broadway_kinesis_spark.operators.daily_increment import (
        daily_increment_rows,
    )

    state = str(tmp_path / "gate_state")
    _gate_fixture_range(
        spark, sf_dir, state, ((400, 417), (417, 434), (434, 450))
    )
    boundary_n1, rolled = day_close(
        spark,
        sf_dir,
        state,
        400,
        families={"digests", "minhash_bands", "ngram_index", "split_labels"},
    )
    assert boundary_n1 == 450
    folded = daily_increment_rows(
        spark,
        sf_dir,
        450,
        digests_tbl=rolled["digests"][0],
        bands_tbl=rolled["minhash_bands"][0],
        labels_tbl=rolled["split_labels"][0],
    )
    scratch = daily_increment_rows(spark, sf_dir, 450)
    assert _rows(folded) == _rows(scratch)


def test_day_close_refuses_to_double_fold(spark, sf_dir, tmp_path):
    """A dispositions id below the warehouse boundary means the gate and
    the warehouse disagree about version N — day_close must fail loudly,
    never fold the same documents twice."""
    import pytest

    from broadway_kinesis_spark.operators.corpus_versioning import day_close

    state = str(tmp_path / "gate_state")
    _gate_fixture_range(spark, sf_dir, state, ((400, 410),))
    with pytest.raises(ValueError, match="below the warehouse"):
        day_close(spark, sf_dir, state, 405, families={"digests"})
    with pytest.raises(FileNotFoundError):
        day_close(
            spark, sf_dir, str(tmp_path / "empty"), 400, families={"digests"}
        )


# --------------------------------------------------- IVF drift + retrain
def _drift_corpus(td: str, spark, *, drift: bool) -> int:
    """1 cluster per axis e0..e3 (labels 0-3), 20 query ids in front.
    With ``drift=True``: 5 of the queries and the whole delta sit on a
    NEW axis (e5) under a label (9) the version-N quantizer never saw —
    the delta is unfindable through frozen version-N geometry. Without:
    the delta re-samples the training clusters. Returns the version-N
    boundary."""
    dim, n_per, boundary = 8, 60, 260
    rows = []

    def vec(axis: int, jitter: int) -> list[float]:
        v = [0.0] * dim
        v[axis] = 10.0
        v[(axis + 1) % dim] += (jitter % 7) / 10.0
        return v

    # queries 0..19: ids 0-14 inside training clusters; 15-19 on the
    # drift axis when drift is planted (still label 0 — they are QUERY
    # points; their own cluster membership is noise)
    for i in range(20):
        if drift and i >= 15:
            rows.append((i, 0, vec(5, i)))
        else:
            rows.append((i, i % 4, vec(i % 4, i)))
    # version-N population: 4 clusters on axes 0..3
    for i in range(20, boundary):
        rows.append((i, i % 4, vec(i % 4, i)))
    # delta: a new cluster on axis 5 (drift) or more of the same (healthy)
    for i in range(boundary, boundary + n_per):
        if drift:
            rows.append((i, 9, vec(5, i)))
        else:
            rows.append((i, i % 4, vec(i % 4, i)))
    _write_embeddings(td, spark, rows)
    return boundary


def test_rolled_recall_trips_retrain_on_planted_drift(spark, tmp_path):
    from broadway_kinesis_spark.operators.ann_incremental import (
        ensure_version_index,
        fold_ivf_index,
        rolled_recall,
        should_retrain,
    )

    td = str(tmp_path / "drift")
    os.makedirs(td)
    b = _drift_corpus(td, spark, drift=True)
    v_n = ensure_version_index(spark, td, b)
    rolled = fold_ivf_index(spark, td, v_n, b, None, tag=f"drift-{b}")
    r = rolled_recall(spark, td, rolled, None)
    # the 5 drift queries' true neighbors live in the unrepresentable
    # cluster: they contribute ~0 recall, dragging the mean under the floor
    assert r < 0.9, r
    assert should_retrain(r, recall_floor=0.9)


def test_rolled_recall_stays_high_on_same_distribution_delta(spark, tmp_path):
    from broadway_kinesis_spark.operators.ann_incremental import (
        ensure_version_index,
        fold_ivf_index,
        rolled_recall,
        should_retrain,
    )

    td = str(tmp_path / "healthy")
    os.makedirs(td)
    b = _drift_corpus(td, spark, drift=False)
    v_n = ensure_version_index(spark, td, b)
    rolled = fold_ivf_index(spark, td, v_n, b, None, tag=f"healthy-{b}")
    r = rolled_recall(spark, td, rolled, None)
    assert r >= 0.9, r
    assert not should_retrain(r, recall_floor=0.9)


def test_chained_fold_equals_single_fold(spark, sf_dir):
    """fold(fold(N, d1), d2) must serve exactly fold(N, d1 ∪ d2) — the
    chained daily loop's content invariant (the quantizer is frozen in
    both, so only posting coverage can differ — and it must not)."""
    from broadway_kinesis_spark.operators.ann_incremental import (
        ensure_version_index,
        fold_ivf_index,
    )
    from broadway_kinesis_spark.operators.ann_persist import probe_ivf_index

    v_n = ensure_version_index(spark, sf_dir, 400)
    once = fold_ivf_index(spark, sf_dir, v_n, 400, None, tag="rf-v400-vNone")
    step1 = fold_ivf_index(spark, sf_dir, v_n, 400, 450, tag="rf-v400-v450")
    chained = fold_ivf_index(
        spark, sf_dir, step1, 450, None, tag="chain-v400-v450-vNone"
    )
    assert _rows(probe_ivf_index(spark, sf_dir, chained)) == _rows(
        probe_ivf_index(spark, sf_dir, once)
    )


# --------------------------------------------------- fuzzy tight tier
def test_incremental_fuzzy_tight_matches_inline_tight_restricted(
    spark, sf_dir
):
    """The registered oracle's statement, package-internal: the tight
    probe == the inline tight channel restricted to d2 >= boundary."""
    from broadway_kinesis_spark.operators.dedup import fuzzy_prefix_pairs
    from broadway_kinesis_spark.operators.fuzzy_incremental import (
        BOUNDARY,
        incremental_fuzzy_pairs,
    )

    got = _rows(incremental_fuzzy_pairs(spark, sf_dir, tight=True))
    want = _rows(
        fuzzy_prefix_pairs(spark, sf_dir, tight=True).filter(
            F.col("d2") >= BOUNDARY
        )
    )
    assert got == want
    # and the tight tier is a SUBSET of the loose one (recall trade, never
    # extra pairs)
    loose = _rows(incremental_fuzzy_pairs(spark, sf_dir))
    assert got <= loose
