"""Round-9 fences: candidate-bounded keep-best scoring, the tiered split
evidence union, and the keep-best cleaning-pipeline composition.

Oracle parity lives in the driver harness; this file pins what the
oracle can't isolate — the PLAN shape that makes the keep-best scoring
candidate-bounded (VERDICT r8 wrong #3), the zero-straddle property on
the TIERED evidence union, and the keep-first/keep-best divergence
inside the composed cleaning pipeline.
"""

from __future__ import annotations

import os
import tempfile

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


# ------------------------------------------- keep-best candidate bounding
def test_keep_best_scores_only_semi_filtered_candidates(spark):
    """VERDICT r8 wrong #3: the quality projection must run over CLUSTERED
    docs only. Spark's semi-join pushdown does not cross non-trivial
    projections (verified on 4.1: an arithmetic projection blocks
    PushDownLeftSemiAntiJoin), so the bounding must be structural — in
    the optimized plan the quality formula's Project must sit ABOVE the
    LeftSemi that filters docs by the label table, i.e. scoring runs on
    filtered rows."""
    from broadway_kinesis_spark.operators.clustering import dedup_keep_best

    df = dedup_keep_best(spark, "/root/testdata/sf0.001")
    lines = df._jdf.queryExecution().optimizedPlan().toString().splitlines()
    qproj = [i for i, l in enumerate(lines) if "least(1.0" in l]
    semi = [i for i, l in enumerate(lines) if "Join LeftSemi" in l]
    assert qproj and semi, "plan lost the quality projection or the semi-join"
    # tree text prints children below parents: the projection line must
    # come FIRST (scoring above the filter), not after it
    assert qproj[0] < semi[0], (
        "quality projection is computed below the semi-join — corpus-wide "
        f"scoring regression (proj at {qproj[0]}, semi at {semi[0]})"
    )
