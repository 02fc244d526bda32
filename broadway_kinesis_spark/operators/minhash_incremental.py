"""Batch incremental corpus-version dedup — MINHASH-LSH channel (round 11).

The last near-dup channel family to get the daily-loop incremental form
(after exact/ngram — incremental_batch, embeddings —
embedding_incremental, fingerprints — fingerprint_incremental, splits —
split_incremental, ANN — ann_incremental), and the canonical one: banded
MinHash is what production corpus builds actually run daily at 100 TB. A
delta arrives; its signatures probe version N's PERSISTED band table —
version N's documents are never re-shingled or re-hashed for candidate
generation (signature computation is the channel's dominant cost:
N_SIG salted hashes over every shingle occurrence).

Persisted artifact (:func:`ensure_minhash_bands`): version N's band rows
``(doc_id, bkc)`` with the (band index, band key) pair packed into one
join key ``bkc = bi || ':' || bk`` (band keys are md5 hex — the packing
is injective), bucketed+sorted by ``bkc`` so delta probes sort-merge
without shuffling the stored side — the same layout protocol as the
ngram inverted index and the fingerprint band table. Banding constants
ride the sweep-chosen operating point (dedup.N_SIG/BAND_R, VERDICT r7
#6) and fold into the table-name policy token, so re-choosing the point
keys a new table.

Pairs the delta introduces are exactly ``d2 >= boundary`` (version-N ids
all sit below every delta id and pairs are (d1 < d2)); the registered
oracle is the INLINE channel's oracle (read from the registry at module
load) wrapped in that one restriction. LSH recall is inherited
unchanged: the probe join sees every band of every delta signature
against every band of version N plus the delta itself — the inline
self-join's candidate space restricted to delta-touching pairs.
Verification is the shared exact-Jaccard tier over candidate docs only
(``dedup._verify_pairs`` — old docs re-shingle ONLY if they made a
candidate pair, semi-join pruned, the same bound as every channel here).

The signature/band construction deliberately MIRRORS
``dedup.minhash_candidates`` rather than importing its body: the inline
module registers eight driver-green queries, and an edit there would
stale them all for one new probe (the per-file staleness rule,
tests/test_registry_window.py); the mirror is pinned to the inline plan
by the shared-oracle driver row and the randomized pure-python fence in
tests/test_incremental_channels.py.

Roll-forward: :func:`roll_forward_minhash_bands` folds the delta's band
rows into version N's table → N+1 (only the delta is hashed; fold ==
scratch and probe-on-rolled == probe-on-scratch fenced).

Reference parity: [TGT] — engine extension (SURVEY §2.B dedup family).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.functions.table_build import corpus_sig, ensure_table
from broadway_kinesis_spark.functions.versioned_fold import (
    fold_policy,
    link_forward_table,
    spread_delta,
)
from broadway_kinesis_spark.operators.dedup import (
    BAND_R,
    N_SIG,
    _shingled,
    _shingles_exploded,
    _verify_pairs,
)
from broadway_kinesis_spark.registry import REGISTRY, query
from broadway_kinesis_spark.session import load, spread_small_scan

#: version-N / delta boundary for the registered fixture query (the
#: dedup_incremental convention).
BOUNDARY = 400

#: bucket count for the persisted band table (the protocol knob — sized
#: like any bucketed table at deployment scale).
BAND_BUCKETS = 8

_N_BANDS = N_SIG // BAND_R
_BANDS_POLICY = f"r11:mh:s{N_SIG}r{BAND_R}:b{BAND_BUCKETS}"

#: the inline channel's oracle OBJECT — importing operators.dedup above ran
#: its @query decorator, so this lookup can never miss nor drift.
_INLINE_ORACLE = REGISTRY["dedup_minhash_lsh"].oracle


def _band_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, bkc): salted-md5 MinHash signature -> banded keys, the
    exact construction of dedup.minhash_candidates at the registered
    operating point, with (bi, bk) packed into one injective string key."""
    # Expression-string construction (round 14, mirrors
    # dedup.minhash_candidates): identical expressions, ~0.3 s less
    # driver-side plan building per run at the 48-hash operating point.
    sh = _shingles_exploded(docs)
    proj = sh.selectExpr(
        "doc_id",
        *[f"md5(concat('{s}:', shingle)) AS p{s}" for s in range(N_SIG)],
    )
    sig = proj.groupBy("doc_id").agg(
        *[F.expr(f"min(p{s}) AS h{s}") for s in range(N_SIG)]
    )
    keys = ", ".join(
        "md5(concat(" + ", ".join(f"h{b * BAND_R + r}" for r in range(BAND_R)) + "))"
        for b in range(_N_BANDS)
    )
    return sig.selectExpr(
        "doc_id", f"posexplode(array({keys})) AS (bi, bk)"
    ).selectExpr("doc_id", "concat(cast(bi AS string), ':', bk) AS bkc")


def ensure_minhash_bands(
    spark: SparkSession, sf_dir: str, boundary: int = BOUNDARY
) -> str:
    """Persist version N's band table — signatures + banding for
    ``doc_id < boundary``, bucketed by the packed band key so delta
    probes never shuffle the stored side."""
    pol = hashlib.md5(f"{_BANDS_POLICY}:v{boundary}".encode()).hexdigest()[:8]
    sig = corpus_sig(sf_dir, ("documents",))
    name = f"_bks_mhbands_{pol}_{sig}"

    def build() -> DataFrame:
        docs = load(spark, sf_dir, "documents").filter(
            F.col("doc_id") < boundary
        )
        return _band_rows(docs)

    return ensure_table(spark, name, build, bucket_by=(BAND_BUCKETS, "bkc"))


def roll_forward_minhash_bands(
    spark: SparkSession,
    sf_dir: str,
    boundary_n: int,
    boundary_n1: int,
    src: str | None = None,
) -> str:
    """Fold the accepted delta ``[boundary_n, boundary_n1)`` into version
    N's persisted band table to produce version N+1's — only the delta is
    shingled/hashed AND only the delta's rows are written (round 12,
    VERDICT r11 #1): version N's data files hard-link into the new
    location in the same bucketed layout, so the fold's write cost tracks
    the delta, never the artifact. Name keys the roll-forward policy +
    BOTH boundaries; fold(N, delta) == build(N+1) is pinned by
    tests/test_incremental_channels.py, and the linked remainder's inode
    identity by tests/test_versioned_fold.py."""
    # chained daily loop: ``src`` names the previous day's rolled table
    # (fold-on-fold); default is the from-scratch version-N build.
    old_tbl = src if src is not None else ensure_minhash_bands(spark, sf_dir, boundary_n)
    pol = fold_policy(_BANDS_POLICY, boundary_n, boundary_n1, src)
    sig = corpus_sig(sf_dir, ("documents",))
    name = f"_bks_mhbands_{pol}_{sig}"

    def delta_build() -> DataFrame:
        docs = load(spark, sf_dir, "documents").filter(
            (F.col("doc_id") >= boundary_n) & (F.col("doc_id") < boundary_n1)
        )
        return _band_rows(spread_delta(docs))

    return link_forward_table(
        spark, name, old_tbl, delta_build, bucket_by=(BAND_BUCKETS, "bkc")
    )


@query(
    "dedup_incremental_minhash",
    oracle=f"""
    SELECT d1, d2, jaccard FROM ({_INLINE_ORACLE}) WHERE d2 >= {BOUNDARY}
    """,
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs the DELTA introduces — band-collision
    candidates with exact Jaccard >= the channel threshold, restricted to
    pairs with at least one delta side — computed by probing version N's
    persisted band table with the delta's signatures instead of
    re-hashing the corpus. The oracle is the inline channel's oracle
    restricted to ``d2 >= {BOUNDARY}``, so the driver row proves the
    persisted bands + probe serve exactly the from-scratch answer."""
    return incremental_minhash_pairs(spark, sf_dir)


@query(
    "dedup_incremental_minhash_90",
    oracle=f"""
    SELECT d1, d2, jaccard FROM ({_INLINE_ORACLE})
    WHERE d2 >= (SELECT (MAX(doc_id) + 1) * 9 // 10 FROM documents)
    """,
)
def dedup_incremental_minhash_90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEPLOYMENT-geometry twin of ``dedup_incremental_minhash``
    (round 12, VERDICT r11 #7): the version-N / delta boundary derives
    from the corpus itself — 90% old / 10% delta, ``(max_id + 1) * 9 //
    10`` in integer arithmetic on BOTH sides — instead of the fixture's
    pinned 400, which at sf0.1 is an adversarial 92%-delta geometry. The
    driver therefore hash-checks the same probe shape the BASELINE scale
    rows measure. The boundary scalar is a one-row max aggregate
    collected driver-side (K-bounded by construction: one row, one
    long)."""
    max_id = (
        load(spark, sf_dir, "documents")
        .agg(F.max("doc_id").alias("m"))
        .collect()[0]
        .m
    )
    boundary = (int(max_id) + 1) * 9 // 10
    return incremental_minhash_pairs(spark, sf_dir, boundary=boundary)


def incremental_minhash_pairs(
    spark: SparkSession,
    sf_dir: str,
    boundary: int = BOUNDARY,
    bands_tbl: str | None = None,
) -> DataFrame:
    """Parameterized body of ``dedup_incremental_minhash`` — scale runs
    place ``boundary`` per corpus; ``bands_tbl`` overrides the version-N
    artifact with a :func:`roll_forward_minhash_bands` fold so day D+1's
    delta probes day D's fold.

    Shape: only the delta computes signatures (one map-side pass + one
    doc_id-keyed aggregate, delta-sized); its band rows are the probe
    side ``b`` and ALSO union into the stored side ``a`` for delta-delta
    pairs (the ngram/fingerprint probe's union); the stored side is
    bucketed on the packed band key so the equi-join never shuffles it;
    exact-Jaccard verification is candidate-bounded."""
    from broadway_kinesis_spark.session import size_shuffle_partitions

    # CPU floor (round 13): the delta's 48-hash signature aggregate and
    # the array-intersect verify run downstream of exchanges — floor the
    # partition count at the session's cores (bytes-sizing still governs
    # at corpus scale; the helper is reset by the registry wrapper).
    size_shuffle_partitions(spark, sf_dir, cpu_bound=True)
    stored = spark.table(
        bands_tbl
        if bands_tbl is not None
        else ensure_minhash_bands(spark, sf_dir, boundary)
    )
    d = load(spark, sf_dir, "documents")
    # One signature pass for the delta, shared by both join sides (the
    # inline channel's cache pattern; delta-bounded by construction).
    delta_bands = _band_rows(
        spread_delta(d.filter(F.col("doc_id") >= boundary))
    ).cache()
    b = delta_bands.select(F.col("doc_id").alias("d2"), "bkc")
    # Stored side joins FIRST, before any union: its bucketed layout
    # satisfies the join distribution so only the delta side exchanges —
    # the stored scan never shuffles (the ngram probe's plan order).
    # New-new pairs come from the delta's own self-join, union'd AFTER.
    old_cand = stored.select(F.col("doc_id").alias("d1"), "bkc").join(b, "bkc")
    new_cand = delta_bands.select(F.col("doc_id").alias("d1"), "bkc").join(
        b, "bkc"
    )
    cand = (
        old_cand.unionByName(new_cand)
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
        .cache()  # read twice: doc-id filter + verification join — the
        # inline channel caches here too; without it the stored-side probe
        # join re-executed per consumer (round 13)
    )
    cand_docs = (
        cand.select(F.col("d1").alias("doc_id"))
        .union(cand.select(F.col("d2").alias("doc_id")))
        .distinct()
    )
    # Spread the semi-join-pruned verify scan (round 13, no-op at scale):
    # same single-scan-task rationale as the inline channel's verify tail.
    pruned = spread_small_scan(
        d.join(F.broadcast(cand_docs), "doc_id", "left_semi"),
        sf_dir,
        ("documents",),
        "doc_id",
    )
    shingled = _shingled(pruned)
    return _verify_pairs(shingled, cand)
