"""Persisted-pair-table tiers for the HEAVY dedup channels (VERDICT r9 #2).

``dedup_ngram_jaccard`` and ``dedup_containment_bottomk`` are the two
standalone channels whose registered queries recomputed their full
index/pair shuffle on every invocation — 581–1000 s and 740 s at fresh
x100 respectively, while their outputs are tiny pair sets that a real
pipeline stores once per corpus version and serves for every downstream
consumer (the split already does exactly this for its evidence union,
``splits.ensure_split_edges``). These tiers persist each channel's pair
output once per corpus version + channel policy token through the shared
build-once protocol (functions/table_build.py) and register the SERVING
path as a query.

Correctness protocol: each persisted query runs under the SAME oracle
object as its inline twin (read from the registry at module load — not a
copied string, so the two can never drift), which makes the driver row a
layout-invariance proof: stored pairs == recomputed pairs, the
``graph_pagerank_bucketed`` / ``dedup_split_leakage_safe_persisted``
pattern.

Policy tokens fold every constant that shapes the channel's output into
the table name (ADVICE r7 via splits._EDGE_POLICY): a threshold change
keys a NEW table for an unchanged corpus, so a persisted tier can never
silently serve pairs computed under a superseded policy. The shingle
geometry (width-3 word grams, ``dedup._shingled``) rides as ``w3``.

Scale posture (100 TB): the build cost is the inline channel's cost,
paid ONCE per corpus version; steady-state serving is a scan of a pair
table whose size tracks the DUPLICATE population, not the corpus.
Measured serving numbers: BASELINE.md's round-11 "persisted-pair serving"
rows (fresh x10/x100 build-once cost vs steady-state scan).

Reference parity: [TGT] — engine extension (SURVEY §2.B dedup family).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

from broadway_kinesis_spark.functions.table_build import corpus_sig, ensure_table
from broadway_kinesis_spark.operators.containment import C_T
from broadway_kinesis_spark.operators.containment_bottomk import (
    K_BOTTOM,
    dedup_containment_bottomk,
)
from broadway_kinesis_spark.operators.dedup import (
    DF_CAP,
    JACCARD_T,
    dedup_ngram_jaccard,
)
from broadway_kinesis_spark.registry import REGISTRY, query

#: the SAME oracle objects as the inline channels — importing the operator
#: modules above ran their @query decorators, so these lookups can never
#: miss nor drift from the inline definitions.
_NGRAM_ORACLE = REGISTRY["dedup_ngram_jaccard"].oracle
_BOTTOMK_ORACLE = REGISTRY["dedup_containment_bottomk"].oracle

_NGRAM_POLICY = f"r10:j{JACCARD_T}:df{DF_CAP}:w3"
_BOTTOMK_POLICY = f"r10:c{C_T}:k{K_BOTTOM}:df{DF_CAP}:w3"


def _pair_table(
    spark: SparkSession, sf_dir: str, *, kind: str, policy: str, build
) -> str:
    pol = hashlib.md5(policy.encode()).hexdigest()[:8]
    sig = corpus_sig(sf_dir, ("documents",))
    name = f"_bks_{kind}_pairs_{pol}_{sig}"
    return ensure_table(spark, name, build)


def ensure_ngram_pairs(spark: SparkSession, sf_dir: str) -> str:
    """Create (once per corpus + policy version) the persisted n-gram
    Jaccard pair table — the inline channel's exact output."""
    return _pair_table(
        spark,
        sf_dir,
        kind="ngram",
        policy=_NGRAM_POLICY,
        build=lambda: dedup_ngram_jaccard(spark, sf_dir),
    )


def ensure_bottomk_pairs(spark: SparkSession, sf_dir: str) -> str:
    """Create (once per corpus + policy version) the persisted bottom-K
    containment pair table — the inline channel's exact output."""
    return _pair_table(
        spark,
        sf_dir,
        kind="bottomk",
        policy=_BOTTOMK_POLICY,
        build=lambda: dedup_containment_bottomk(spark, sf_dir),
    )


@query("dedup_ngram_jaccard_persisted", oracle=_NGRAM_ORACLE)
def dedup_ngram_jaccard_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deployment form of ``dedup_ngram_jaccard``: identical
    semantics, identical oracle OBJECT — but the (d1, d2, jaccard) pairs
    live in a table built once per corpus + policy version. Measured
    round 11 (BASELINE.md §round-11): at fresh x100 the build pays the
    inline recompute once (1,398.5 s on a post-x10-batch host; the
    channel whose shuffle spill is the package's one memory-knob wall)
    and steady-state serving is a 0.2 s pair-table scan — in a real
    pipeline the dedup family's pair outputs are persisted anyway, so
    that IS the cost every downstream consumer (clustering, splits,
    keep-best) pays. The shared oracle is the layout-invariance proof."""
    return spark.table(ensure_ngram_pairs(spark, sf_dir))


@query("dedup_containment_bottomk_persisted", oracle=_BOTTOMK_ORACLE)
def dedup_containment_bottomk_persisted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The deployment form of ``dedup_containment_bottomk`` (which is
    itself the scale tier of the exhaustive containment channel): the
    directional (contained_id, container_id, containment) pairs persist
    once per corpus + policy version; serving is a scan. Measured round
    11 (BASELINE.md §round-11): fresh x100 build 154.5 s, serving 0.1 s
    over the same 25,528 pairs round 6's inline run found. Same oracle
    object as the inline tier — layout invariance by construction."""
    return spark.table(ensure_bottomk_pairs(spark, sf_dir))
