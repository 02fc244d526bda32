"""Persisted IVF index: train-once/probe-many lifecycle (VERDICT r3 #4).

Pins the three properties that make the persisted index real rather than a
re-spelling of the in-plan operator:

1. the index is built once and REUSED — a second query run rewrites no
   index file;
2. probe-only runs touch no training scan — the plan reads the stored
   centroids + a partition-pruned slice of the postings, and the only
   embeddings read is the bounded query-vector fetch (no posexplode /
   centroid aggregation anywhere);
3. the probe result equals the in-plan ``similarity_ann_ivf_probe``
   (training is bitwise-deterministic, so persisted == recomputed).
"""

from __future__ import annotations

import os

import pytest

from broadway_kinesis_spark.operators import ann_persist
from broadway_kinesis_spark.plans import formatted_plan

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


@pytest.fixture()
def index_dir(tmp_path, monkeypatch):
    d = str(tmp_path / "ivf_index")
    monkeypatch.setattr(ann_persist, "_index_dir", lambda sf_dir: d)
    return d


def _index_state(index_dir: str) -> dict[str, float]:
    state = {}
    for root, _dirs, files in os.walk(index_dir):
        for f in files:
            p = os.path.join(root, f)
            state[p] = os.stat(p).st_mtime_ns
    return state


def test_index_built_once_and_reused(spark, sf_dir, index_dir):
    r1 = QUERIES["similarity_ann_ivf_persisted"](spark, sf_dir).collect()
    assert r1
    state1 = _index_state(index_dir)
    assert any("centroids.parquet" in p for p in state1)
    assert any("postings.parquet" in p for p in state1)

    r2 = QUERIES["similarity_ann_ivf_persisted"](spark, sf_dir).collect()
    state2 = _index_state(index_dir)
    assert state2 == state1, "probe-only run rewrote index files"
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))


def test_probe_plan_reads_index_not_training_scan(spark, sf_dir, index_dir):
    QUERIES["similarity_ann_ivf_persisted"](spark, sf_dir).collect()  # build
    df = QUERIES["similarity_ann_ivf_persisted"](spark, sf_dir)
    plan = formatted_plan(df)

    assert "centroids.parquet" in plan
    assert "postings.parquet" in plan
    # training shapes must be absent: no posexplode (Generate) feeding a
    # centroid aggregation
    main = plan.split("===== Subqueries =====")[0]
    assert "Generate" not in main, main
    # the postings fetch is partition-pruned to the probed clusters
    assert "PartitionFilters" in plan and "label" in plan
    # embeddings is read ONLY for the bounded query-vector fetch (it feeds
    # both the probe ranking and the final scoring, so the scan may appear
    # twice) — every instance must carry the pushed vec_id bound, proving
    # no full-corpus read
    emb_scans = [
        seg for seg in plan.split("Location:") if "embeddings.parquet" in seg.split("\n")[0]
    ]
    assert emb_scans, plan
    for seg in emb_scans:
        assert "LessThan(vec_id" in seg, plan


def test_persisted_probe_matches_in_plan_probe(spark, sf_dir, index_dir):
    persisted = QUERIES["similarity_ann_ivf_persisted"](spark, sf_dir).collect()
    in_plan = QUERIES["similarity_ann_ivf_probe"](spark, sf_dir).collect()
    assert sorted(map(tuple, persisted)) == sorted(map(tuple, in_plan))
