"""Round-13 fences.

Part 1 — the three ADVICE r12 robustness fixes:

- ``link_forward_table`` becomes catalog-visible at ``saveAsTable``,
  BEFORE the base files link in; a mid-link failure used to strand a
  registered delta-only table that the idempotence fast path would then
  serve as version N+1. Fixed by eager drop on failure + an owner-marker
  check in the fast path (marker is written only after the links
  complete).
- ``snapshot_store.link_tree`` silently fell through FileExistsError to
  an overwriting copy2; the IVF fold (which merges base posting files
  into partition dirs already holding delta files) now links with
  ``exclusive=True`` and fails loudly on a collision.
- ``rolled_recall`` returned 1.0 over an EMPTY exact comparator, so a
  misconfigured/empty indexed population read as perfect recall and the
  retrain gate could never trip. Now fails closed (raises).

Part 2+ (chained folds / compaction) live further down.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F


def _loc(spark, tbl: str) -> str:
    wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    return os.path.join(wh, tbl)


def _drop(spark, *names: str) -> None:
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS `{n}`")
        shutil.rmtree(_loc(spark, n), ignore_errors=True)


# ------------------------------------------- link_forward_table atomicity
def test_mid_link_failure_leaves_no_servable_table(spark, monkeypatch):
    """A failure between saveAsTable and the base-file links must not
    leave a registered (delta-only) table behind — ADVICE r12 #1: the
    same-session retry used to hit the tableExists fast path and silently
    serve version N+1 without version N's rows."""
    from broadway_kinesis_spark.functions import versioned_fold as vf
    from broadway_kinesis_spark.functions.table_build import ensure_table

    base_n, fold_n = "r13_linkfail_base", "r13_linkfail_fold"
    _drop(spark, base_n, fold_n)
    base = ensure_table(
        spark, base_n, lambda: spark.range(5).select(F.col("id").alias("k"))
    )

    def boom(*a, **k):
        raise OSError("injected mid-link failure")

    monkeypatch.setattr(vf, "base_data_files", boom)
    with pytest.raises(OSError, match="injected"):
        vf.link_forward_table(
            spark,
            fold_n,
            base,
            lambda: spark.range(5, 8).select(F.col("id").alias("k")),
        )
    # the failed build is gone, not servable
    assert not spark.catalog.tableExists(fold_n)
    assert not os.path.isdir(_loc(spark, fold_n))

    # the same-session retry rebuilds COMPLETELY (base + delta)
    monkeypatch.undo()
    rolled = vf.link_forward_table(
        spark,
        fold_n,
        base,
        lambda: spark.range(5, 8).select(F.col("id").alias("k")),
    )
    assert sorted(r.k for r in spark.table(rolled).collect()) == list(range(8))
    _drop(spark, base_n, fold_n)


def test_markerless_registered_fold_is_rebuilt(spark):
    """The fast-path backstop: a registered fold whose location lacks the
    post-link owner marker (failed cleanup after a mid-link crash) must be
    rebuilt, never served."""
    from broadway_kinesis_spark.functions import versioned_fold as vf
    from broadway_kinesis_spark.functions.table_build import (
        _OWNER_MARKER,
        ensure_table,
    )

    base_n, fold_n = "r13_marker_base", "r13_marker_fold"
    _drop(spark, base_n, fold_n)
    base = ensure_table(
        spark, base_n, lambda: spark.range(4).select(F.col("id").alias("k"))
    )
    delta = lambda: spark.range(4, 6).select(F.col("id").alias("k"))  # noqa: E731
    rolled = vf.link_forward_table(spark, fold_n, base, delta)
    marker = os.path.join(_loc(spark, rolled), _OWNER_MARKER)
    assert os.path.isfile(marker), "marker must certify a completed fold"

    # simulate the stranded state: registered table, no marker
    os.remove(marker)
    rolled2 = vf.link_forward_table(spark, fold_n, base, delta)
    assert rolled2 == rolled
    assert os.path.isfile(marker), "rebuild must restore the marker"
    assert sorted(r.k for r in spark.table(rolled2).collect()) == list(range(6))
    _drop(spark, base_n, fold_n)


# ------------------------------------------------- link_tree exclusive mode
def test_link_tree_exclusive_refuses_collision(tmp_path):
    from broadway_kinesis_spark.streaming.snapshot_store import link_tree

    src, dst = tmp_path / "src", tmp_path / "dst"
    src.mkdir()
    dst.mkdir()
    (src / "part-0.parquet").write_text("base")
    (dst / "part-0.parquet").write_text("delta")  # fresh delta file, same name

    with pytest.raises(FileExistsError):
        link_tree(str(src), str(dst), exclusive=True)
    # the delta file survived untouched (no silent overwrite)
    assert (dst / "part-0.parquet").read_text() == "delta"

    # default mode keeps the historical overwrite-on-collision behavior
    link_tree(str(src), str(dst))
    assert (dst / "part-0.parquet").read_text() == "base"


# --------------------------------------------------- rolled_recall fail-closed
def test_rolled_recall_fails_closed_on_empty_comparator(spark, sf_dir):
    """An indexed population that produces no exact-comparator queries is
    a misconfiguration, not perfect recall — the retrain gate must not
    fail open (ADVICE r12 #3)."""
    from broadway_kinesis_spark.operators.ann_incremental import (
        ensure_version_index,
        rolled_recall,
    )

    idx = ensure_version_index(spark, sf_dir, 400)
    with pytest.raises(ValueError, match="no queries"):
        rolled_recall(spark, sf_dir, idx, boundary=0)
