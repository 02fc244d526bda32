"""Behavior tests for the curation operators (operators/curation.py) and the
scale-technique operators (skew.py / subqueries.py) — properties the
DuckDB hash-match can't state directly: redaction completeness, shard
contiguity, mixture cardinality invariants, and rewrite equivalence
checked engine-internally (Spark vs Spark, complementing the cross-engine
oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


# ---------------------------------------------------------------- pii_scrub
def test_pii_scrub_leaves_no_digits_and_stable_pseudonyms(spark, sf_dir):
    rows = QUERIES["pii_scrub"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert not any(c.isdigit() for c in r.props_scrubbed), r
        assert len(r.user_pseudo) == 32  # md5 hex
    # keyed pseudonymization: same user -> same pseudonym across events
    from broadway_kinesis_spark.session import load

    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 1500)
    n_users = ev.select("user_id").distinct().count()
    out = QUERIES["pii_scrub"](spark, sf_dir)
    assert out.select("user_pseudo").distinct().count() == n_users


def test_pii_scrub_redaction_count_matches_digit_runs(spark, sf_dir):
    # n_redacted must equal the number of digit runs the scrub replaced
    rows = QUERIES["pii_scrub"](spark, sf_dir).collect()
    for r in rows:
        assert r.props_scrubbed.count("<NUM>") == r.n_redacted, r


# ------------------------------------------------------- sample_epoch_shuffle
def test_epoch_shuffle_is_a_permutation_with_contiguous_shards(spark, sf_dir):
    from broadway_kinesis_spark.session import load

    out = QUERIES["sample_epoch_shuffle"](spark, sf_dir)
    n_docs = load(spark, sf_dir, "documents").count()
    rows = out.collect()
    # every document exactly once
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    # within each shard, positions are contiguous 1..n_shard
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r.pos_in_shard)
    assert set(by_shard) <= set(range(8))
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), shard


def test_epoch_shuffle_is_deterministic_across_runs(spark, sf_dir):
    a = {(r.doc_id, r.shard_id, r.pos_in_shard) for r in QUERIES["sample_epoch_shuffle"](spark, sf_dir).collect()}
    b = {(r.doc_id, r.shard_id, r.pos_in_shard) for r in QUERIES["sample_epoch_shuffle"](spark, sf_dir).collect()}
    assert a == b


def test_epoch_shuffle_helper_parameterized_shards(spark, sf_dir):
    """n_shards is a real parameter (VERDICT r3 #6): an explicit count is
    honored, and the default scales with cluster parallelism instead of
    being pinned at 8."""
    from broadway_kinesis_spark.operators.curation import epoch_shuffle
    from broadway_kinesis_spark.session import load

    d = load(spark, sf_dir, "documents").select("doc_id")
    three = epoch_shuffle(d, n_shards=3)
    shards = {r.shard_id for r in three.select("shard_id").distinct().collect()}
    assert shards <= set(range(3)) and len(shards) == 3

    default = epoch_shuffle(d)
    expected = 4 * spark.sparkContext.defaultParallelism
    got = {r.shard_id for r in default.select("shard_id").distinct().collect()}
    assert got <= set(range(expected))
    # with hundreds of docs and tens of shards, the md5 spread should hit
    # well over half the shard space
    assert len(got) > expected // 2


# ---------------------------------------------------------- data_mix_weighted
def test_data_mix_cardinalities_track_weights(spark, sf_dir):
    from broadway_kinesis_spark.operators.curation import DEFAULT_W16, MIX_W16

    rows = {r.source: r for r in QUERIES["data_mix_weighted"](spark, sf_dir).collect()}
    for source, r in rows.items():
        w16 = MIX_W16.get(source, DEFAULT_W16)
        # integer-part bound: every doc repeats at least w16//16 times and
        # at most w16//16 + 1; totals must sit inside those bounds
        lo = (w16 // 16) * r.docs_in
        hi = lo + r.docs_in if w16 % 16 else lo
        assert lo <= r.docs_out <= hi, (source, w16, r)
    # the unweighted default sources replicate exactly 1:1
    for source, r in rows.items():
        if source not in MIX_W16:
            assert r.docs_out == r.docs_in, r


def test_materialize_mixture_cardinality_equals_audit(spark, sf_dir):
    """The actual explode produces exactly SUM(repeats) rows per source —
    the invariant the single-pass audit reports in closed form — and
    repeats=0 documents vanish rather than emitting a stray copy."""
    from broadway_kinesis_spark.operators.curation import (
        materialize_mixture,
        weighted_repeats,
    )
    from broadway_kinesis_spark.session import load

    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    base = weighted_repeats(d, spark)
    audit = {r.source: r for r in QUERIES["data_mix_weighted"](spark, sf_dir).collect()}
    mat = {
        r.source: r.n
        for r in materialize_mixture(base).groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for source, row in audit.items():
        assert mat.get(source, 0) == row.docs_out, (source, row)
    # copy_idx numbers the epoch copies 0..n-1 per doc
    sample = materialize_mixture(base).groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("copy_idx").alias("mx"), F.min("copy_idx").alias("mn")
    )
    bad = sample.filter((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0)).count()
    assert bad == 0


# ------------------------------------------------------------ join_salted_skew
def test_salted_join_equals_plain_join_in_spark(spark, sf_dir):
    """Engine-internal equivalence: the salted rewrite must produce exactly
    the plain join's per-nation aggregates (the oracle states this vs
    DuckDB; this pins it Spark-vs-Spark so a salting bug can't hide behind
    a coincidentally-matching oracle edit)."""
    from broadway_kinesis_spark.functions.numeric import lsum
    from broadway_kinesis_spark.session import load

    plain = (
        load(spark, sf_dir, "lineitem")
        .join(load(spark, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            lsum("l_extendedprice * (1 - l_discount)", "revenue"),
        )
    )
    salted = QUERIES["join_salted_skew"](spark, sf_dir)
    key = lambda r: (r.s_nationkey, r.n_items, r.revenue)  # noqa: E731
    assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))


# ----------------------------------------------------- subquery_correlated_avg
def test_correlated_subquery_matches_manual_decorrelation(spark, sf_dir):
    """The SQL-with-subqueries form must select exactly the rows the
    hand-decorrelated DataFrame plan selects."""
    from broadway_kinesis_spark.functions.numeric import lscale
    from broadway_kinesis_spark.session import load

    o = load(spark, sf_dir, "orders").withColumn("price_mu", lscale(F.col("o_totalprice")))
    stats = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("price_mu").alias("_s")
    )
    manual = (
        o.join(stats, "o_custkey")
        .filter(F.col("price_mu") * 2 * F.col("_n") > 3 * F.col("_s"))
        .select("o_orderkey", "o_custkey", "price_mu")
    )
    got = QUERIES["subquery_correlated_avg"](spark, sf_dir)
    key = lambda r: (r.o_orderkey, r.o_custkey, r.price_mu)  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, manual.collect()))


# ------------------------------------------------- sample_temperature_mix
def test_share_raw_ppm_is_overflow_safe_at_100tb_token_counts(spark):
    """ADVICE r9 (low): tokens_in * 1e6 in BIGINT overflows past ~9.2e12
    tokens — inside the operator's documented 100 TB posture (~2.5e13
    tokens). The wide-integer projection (DECIMAL(38,0) in Spark, HUGEINT
    in the oracle) must agree bitwise at post-overflow magnitudes, under
    ANSI mode where the old form would ERROR rather than wrap."""
    import duckdb

    tokens_in, total = 9_300_000_000_000_123, 25_000_000_000_000_456
    ansi = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        got = spark.sql(
            f"SELECT CAST(CAST({tokens_in} AS DECIMAL(38,0)) * 1000000"
            f" div {total} AS BIGINT) AS ppm"
        ).collect()[0].ppm
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi)
    want = duckdb.sql(
        f"SELECT CAST(CAST({tokens_in} AS HUGEINT) * 1000000"
        f" // {total} AS BIGINT) AS ppm"
    ).fetchone()[0]
    assert got == want == 371_999
