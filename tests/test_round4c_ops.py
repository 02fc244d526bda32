"""Behavior tests for the round-4c operators — structural properties the
DuckDB hash-match can't state directly: reconstruction identity for
boilerplate removal, sketch-merge tolerance, MERGE action taxonomy,
interpolation boundedness, and hard-negative label exclusion. All
invariants hold at any scale factor (the shared fixture runs sf0.001)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from broadway_kinesis_spark.operators.cdc import CDC_CUTOFF
from broadway_kinesis_spark.operators.contrastive import N_ANCHORS, TOP_NEG
from broadway_kinesis_spark.operators.paragraphs import CHUNK_W
from broadway_kinesis_spark.operators.sketch_merge import N_SHARDS
from broadway_kinesis_spark.session import load

QUERIES = entrymod.queries()


# ------------------------------------------------------------ dedup_boilerplate
def test_boilerplate_chunk_counts_and_clean_docs_round_trip(spark, sf_dir):
    out = {r.doc_id: r for r in QUERIES["dedup_boilerplate"](spark, sf_dir).collect()}
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(out) == len(docs)
    for d in docs:
        r = out[d.doc_id]
        n_words = len(d.text.split(" "))
        assert r.n_chunks == -(-n_words // CHUNK_W)  # ceil
        assert 0 <= r.n_boiler <= r.n_chunks
        if r.n_boiler == 0:
            # nothing removed => fingerprint is md5 of the original text
            # (fixed-anchor chunks rejoined with ' ' reconstruct it exactly)
            assert r.clean_fp == hashlib.md5(d.text.encode()).hexdigest()


def test_boilerplate_removed_segments_repeat_across_docs(spark, sf_dir):
    """Every removed segment must actually be cross-document-repeated:
    total removals across the corpus is 0 or >= BOILER_MIN_DOCS (a segment
    can only be removed if >= that many docs contain it)."""
    from broadway_kinesis_spark.operators.paragraphs import BOILER_MIN_DOCS

    total = (
        QUERIES["dedup_boilerplate"](spark, sf_dir)
        .agg(F.sum("n_boiler").alias("s"))
        .collect()[0]
        .s
    )
    assert total == 0 or total >= BOILER_MIN_DOCS


# ------------------------------------------------------------- agg_sketch_merge
def test_sketch_merge_exact_counts_and_tolerance(spark, sf_dir):
    rows = QUERIES["agg_sketch_merge"](spark, sf_dir).collect()
    o = load(spark, sf_dir, "orders")
    exact = {
        r.o_orderstatus: r.n
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert {r.o_orderstatus for r in rows} == set(exact)
    for r in rows:
        assert r.exact_custs == exact[r.o_orderstatus]
        assert r.within_tol, "merged HLL estimate left the 5% band"
        assert 1 <= r.n_partials <= N_SHARDS


def test_sketch_union_of_partials_equals_single_level_sketch(spark, sf_dir):
    """Mergeability itself: estimate(union(partial sketches)) must equal the
    estimate of one sketch built over the whole column in a single pass —
    HLL union is exact over registers, not an approximation of sketches."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    one = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey", F.lit(12))).alias("e")
    ).collect()[0].e
    two = (
        o.groupBy((F.col("o_orderkey") % N_SHARDS).alias("shard"))
        .agg(F.hll_sketch_agg("o_custkey", F.lit(12)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]
        .e
    )
    assert one == two


# -------------------------------------------------------------- cdc_merge_upsert
def test_cdc_actions_partition_the_key_space(spark, sf_dir):
    rows = QUERIES["cdc_merge_upsert"](spark, sf_dir).collect()
    e = load(spark, sf_dir, "events")
    n_keys = e.select("user_id", "event_type").distinct().count()
    assert len(rows) == n_keys
    cutoff_us = int(
        e.sparkSession.sql(
            f"SELECT unix_micros(TIMESTAMP '{CDC_CUTOFF}')"
        ).collect()[0][0]
    )
    for r in rows:
        assert r.action in {"insert", "update", "noop", "retain"}
        if r.action == "insert":
            assert r.old_value is None and r.new_epoch_us >= cutoff_us
        elif r.action == "retain":
            assert r.new_value is None and r.new_epoch_us == -1
        elif r.action == "noop":
            assert r.old_value == r.new_value
        else:  # update
            assert r.old_value != r.new_value
            assert r.new_epoch_us >= cutoff_us


# ------------------------------------------------------ window_interpolate_linear
def test_interpolation_grid_is_dense_and_bounded(spark, sf_dir):
    rows = QUERIES["window_interpolate_linear"](spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r.hour_id)
        hours = [r.hour_id for r in rs]
        # dense spine: contiguous hour range, endpoints observed
        assert hours == list(range(hours[0], hours[-1] + 1)), et
        assert rs[0].src == "obs" and rs[-1].src == "obs", et
        # every interpolated value lies between its neighboring observations
        # (linear interpolation is bounded by its endpoints; +-1 micro-unit
        # for the integer rounding)
        for i, r in enumerate(rs):
            assert r.value == r.value_micro / 1e6
            if r.src != "interp":
                continue
            prev_obs = next(x for x in reversed(rs[:i]) if x.src == "obs")
            next_obs = next(x for x in rs[i + 1 :] if x.src == "obs")
            lo = min(prev_obs.value_micro, next_obs.value_micro) - 1
            hi = max(prev_obs.value_micro, next_obs.value_micro) + 1
            assert lo <= r.value_micro <= hi, (et, r.hour_id)


# ---------------------------------------------------------- mine_hard_negatives
def test_hard_negatives_shape_and_label_exclusion(spark, sf_dir):
    rows = QUERIES["mine_hard_negatives"](spark, sf_dir).collect()
    emb = load(spark, sf_dir, "embeddings")
    n_anchors = min(N_ANCHORS, emb.count())
    by_anchor: dict[int, list] = {}
    for r in rows:
        assert r.neg_label != r.anchor_label, "negative shares the anchor label"
        by_anchor.setdefault(r.anchor_id, []).append(r)
    assert len(by_anchor) == n_anchors
    for aid, rs in by_anchor.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, min(TOP_NEG, len(rs)) + 1))
        # hardness ordering: similarity non-increasing with rank
        cs = [r.cos_micro for r in rs]
        assert all(a >= b - 1 for a, b in zip(cs, cs[1:])), (aid, cs)


def test_interpolation_floor_division_matches_duckdb_on_negative_values(
    spark, tmp_path
):
    """Cross-engine floor parity where it bites: negative bucket sums.
    BOTH engines' integer division truncates toward zero (Spark `div`,
    DuckDB `//`), which breaks the round-half-up identity by one for
    negative numerators — both plans spell the explicit FLOOR correction,
    so a delta-like metric (negative values) rounds identically and
    CORRECTLY in both engines."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod
    from broadway_kinesis_spark.registry import REGISTRY

    # hour 0 observed at -3.0000005, hour 2 observed at 0.0 -> hour 1
    # interpolates a negative rational that floors and truncates apart
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(["2024-01-01 00:30:00", "2024-01-01 02:30:00"]),
            "user_id": [1, 1],
            "event_type": ["delta", "delta"],
            "value": [-3.0000005, 0.0],
            "props": ["{}", "{}"],
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(pdf).write.parquet(f"{sf}/events.parquet")

    out = {
        r.hour_id: (r.value_micro, r.src)
        for r in entrymod.queries()["window_interpolate_linear"](spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet/*.parquet')"  # Spark writes a dir
    )
    oracle = {
        int(h): (int(v), s)
        for (_, h, v, _val, s) in con.execute(
            REGISTRY["window_interpolate_linear"].oracle
        ).fetchall()
    }
    assert len(out) == 3 and {s for _, s in out.values()} == {"obs", "interp"}
    assert {h: (int(v), s) for h, (v, s) in out.items()} == oracle
    # the interp bucket really is negative (the regression trigger)
    interp_vals = [v for v, s in out.values() if s == "interp"]
    assert interp_vals and all(v < 0 for v in interp_vals)


# ---------------------------------------------------------------- graph_pagerank
def test_pagerank_output_shape_and_rank_sanity(spark, sf_dir):
    from broadway_kinesis_spark.operators.graph import BASE, P_OFF, TOP

    rows = QUERIES["graph_pagerank"](spark, sf_dir).collect()
    assert 0 < len(rows) <= TOP
    ranks = [r.rank_q for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    for r in rows:
        assert r.rank_q >= BASE  # teleport term is a hard floor
        assert r.node_type == ("part" if r.node_id >= P_OFF else "supplier")
    # every listed node really exists in the edge set
    li = load(spark, sf_dir, "lineitem")
    supp = {r.l_suppkey for r in li.select("l_suppkey").distinct().collect()}
    part = {r.l_partkey + P_OFF for r in li.select("l_partkey").distinct().collect()}
    assert {r.node_id for r in rows} <= supp | part


def test_pagerank_matches_pure_python_reference(spark, sf_dir):
    """Independent re-implementation: run the exact integer recurrence in
    plain Python dicts over the same edge list and demand the identical
    top-k — a recurrence bug (e.g. dropping the degree division) that
    still produces plausible-looking ranks cannot pass this."""
    from collections import defaultdict

    from broadway_kinesis_spark.operators.graph import (
        BASE, DAMP_DEN, DAMP_NUM, ITERS, P_OFF, R0, TOP,
    )

    li = load(spark, sf_dir, "lineitem")
    fwd = {
        (r.l_suppkey, r.l_partkey + P_OFF)
        for r in li.select("l_suppkey", "l_partkey").distinct().collect()
    }
    edges = list(fwd) + [(d, s) for s, d in fwd]
    deg: dict[int, int] = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    r = {n: R0 for n in deg}
    for _ in range(ITERS):
        acc: dict[int, int] = defaultdict(int)
        for s, d in edges:
            acc[d] += r[s] // deg[s]
        r = {n: BASE + (DAMP_NUM * a) // DAMP_DEN for n, a in acc.items()}
    expect = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP]
    got = [
        (row.node_id, row.rank_q)
        for row in QUERIES["graph_pagerank"](spark, sf_dir).collect()
    ]
    assert got == expect


def test_floordiv_expression_matches_python_floor_semantics(spark):
    """The explicit floor-division correction used by both interpolation
    plans must equal Python's `//` (true floor) across sign/divisibility
    combinations — including exact multiples, near-misses, and the
    negative numerators where plain `div` truncation is off by one."""
    import random

    import pandas as pd

    rng = random.Random(20260814)
    nums = [0, 1, -1, 7, -7, 5999999, -5999999, -6000000] + [
        rng.randint(-10**12, 10**12) for _ in range(200)
    ]
    dens = [rng.randint(1, 10**6) for _ in nums]
    pdf = pd.DataFrame({"a": nums, "b": dens})
    df = spark.createDataFrame(pdf).selectExpr(
        "a", "b",
        "(a div b) - (CASE WHEN a % b != 0 AND a < 0 THEN 1 ELSE 0 END) AS fd",
    )
    for r in df.collect():
        assert r.fd == r.a // r.b, (r.a, r.b, r.fd)


# -------------------------------------------------------- window_rolling_distinct
def test_rolling_distinct_matches_brute_force_and_is_monotone_vs_daily(spark, sf_dir):
    """The rolling window's exact count must equal a brute-force Python
    recount and never be smaller than any single member day's distinct
    count (a union can only grow)."""
    from collections import defaultdict

    from broadway_kinesis_spark.operators import rolling
    from broadway_kinesis_spark.operators.rolling import US_PER_DAY, WINDOW_DAYS

    rows = QUERIES["window_rolling_distinct"](spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events").selectExpr(
        f"unix_micros(ts) div {US_PER_DAY} AS day_id", "user_id"
    ).collect()
    by_day: dict[int, set] = defaultdict(set)
    for r in ev:
        by_day[r.day_id].add(r.user_id)
    assert {r.day_id for r in rows} == set(by_day)
    for r in rows:
        window_users = set().union(
            *(by_day.get(d, set())
              for d in range(r.day_id - WINDOW_DAYS + 1, r.day_id + 1))
        )
        assert r.exact_users == len(window_users), r.day_id
        assert r.exact_users >= len(by_day[r.day_id])
        assert r.within_tol, (
            f"rolled sketch union left the {rolling.TOL:.0%} band"
        )


def test_boilerplate_chunker_round_trips_arbitrary_word_streams(spark):
    """Property: for ANY word stream, fixed-anchor chunking rejoined with
    single spaces reconstructs the original text, and the chunk count is
    ceil(words / CHUNK_W) — the identity the clean_fp fingerprint relies
    on. Exercises empty-ish, exact-multiple, and ragged lengths."""
    import random

    import pandas as pd

    rng = random.Random(20260814)
    texts = []
    for n in [1, 2, CHUNK_W - 1, CHUNK_W, CHUNK_W + 1, 3 * CHUNK_W, 97]:
        texts.append(" ".join(f"w{rng.randint(0, 50)}" for _ in range(n)))
    texts.append("single")
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    chunks = F.transform(
        F.sequence(F.lit(0), F.expr(f"(size(w) + {CHUNK_W - 1}) div {CHUNK_W}") - 1),
        lambda i: F.array_join(F.slice(F.col("w"), i * CHUNK_W + 1, CHUNK_W), " "),
    )
    out = (
        df.select("doc_id", "text", F.split("text", " ").alias("w"))
        .select("doc_id", "text", chunks.alias("chunks"))
        .collect()
    )
    for r in out:
        n_words = len(r.text.split(" "))
        assert len(r.chunks) == -(-n_words // CHUNK_W), r.text
        assert " ".join(r.chunks) == r.text, r.text
