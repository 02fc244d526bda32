"""Round-5 operators: URL canonicalize/dedup + frozen quality classifier.

Oracle parity lives in tests/test_oracle.py (both queries are fully
SQL-expressible); this file pins the SEMANTICS the oracle can't isolate —
spelling convergence, idempotence, port edge cases, exact feature math —
and the physical plans the 100 TB posture depends on.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from broadway_kinesis_spark.operators.classifier import (
    BIAS,
    STOPWORDS,
    W_DIGIT,
    W_STOP,
    W_UNIQ,
    W_UPPER,
)
from broadway_kinesis_spark.operators.urls import canonical_host, canonicalize

QUERIES = entrymod.queries()


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], ["raw_url"])
    rows = df.select(canonicalize(F.col("raw_url")).alias("c")).collect()
    return [r.c for r in rows]


# ---------------------------------------------------------------- canonicalizer
def test_url_spelling_variants_converge(spark):
    """Every crawl-spelling of the same page must canonicalize to one
    string: case, www., default port, doubled slashes, index.html,
    trailing slash, tracking params, param order, fragment."""
    variants = [
        "HTTP://WWW.Example.COM:80/shop//items/index.html?utm_source=x&id=3&sort=a#frag",
        "http://example.com/shop/items/?sort=a&gclid=zzz&id=3",
        "Http://www.example.com//shop///items?id=3&sort=a&fbclid=f",
        "http://Example.com:80/shop/items?ref=tw&sort=a&id=3",
    ]
    out = set(_canon(spark, variants))
    assert out == {"http://example.com/shop/items?id=3&sort=a"}, out


def test_url_non_default_port_and_scheme_survive(spark):
    """Canonicalization must be loss-LESS where it matters: an https URL on
    :80 is a different endpoint and keeps its port; http vs https stay
    distinct pages."""
    out = _canon(
        spark,
        [
            "https://example.com:80/a",
            "https://example.com:443/a",
            "http://example.com/a",
        ],
    )
    assert out == [
        "https://example.com:80/a",
        "https://example.com/a",
        "http://example.com/a",
    ]


def test_url_canonicalization_is_idempotent(spark):
    """canon(canon(u)) == canon(u): the canonical form is a fixed point, so
    re-running the dedup pass over already-clean data is a no-op (the
    property incremental re-crawl pipelines rely on)."""
    messy = [
        "HTTPS://www.Site4.Example.ORG:443//products//login/?fbclid=x&id=9#t",
        "http://a.b//",
        "http://a.b/index.html?utm_a=1",
        # adversarial order/repetition cases (code-review finding: the
        # original strip order broke the fixed point on these)
        "http://h.c/a/index.html/",
        "http://h.c/index.html/index.html",
        "http://h.c/a//index.html",
    ]
    once = _canon(spark, messy)
    twice = _canon(spark, once)
    assert once == twice
    assert once[3] == "http://h.c/a"  # '/a/index.html/' == '/a/' == '/a'
    assert once[4] == "http://h.c/"
    assert once[5] == "http://h.c/a"


def test_url_all_params_tracking_drops_query_entirely(spark):
    out = _canon(spark, ["http://h.c/p?utm_source=a&utm_medium=b&gclid=x"])
    assert out == ["http://h.c/p"]


def test_url_question_mark_inside_fragment_is_not_a_query(spark):
    """A '?' after '#' belongs to the fragment, which drops entirely —
    'http://h/p#a/b?c' is the same page as 'http://h/p' (code-review
    finding: the unanchored extract leaked fragment content into the
    canonical query)."""
    out = _canon(
        spark,
        ["http://h.c/p#a/b?c", "http://h.c/p#top", "http://h.c/p?x=1#a?b"],
    )
    assert out == ["http://h.c/p", "http://h.c/p", "http://h.c/p?x=1"]


def test_url_root_path_and_host_extraction(spark):
    assert _canon(spark, ["http://www.H.Co", "http://h.co//index.html"]) == [
        "http://h.co/",
        "http://h.co/",
    ]
    df = spark.createDataFrame(
        [("HTTPS://WWW.Foo.COM:443/x",), ("http://bar.org:8080/y",)], ["u"]
    )
    hosts = [r.h for r in df.select(canonical_host(F.col("u")).alias("h")).collect()]
    assert hosts == ["foo.com", "bar.org:8080"]


def test_url_dedup_counts_variants_and_keeps_first(spark, sf_dir):
    """Per canonical page: n_events >= n_variants >= 1, the keep-first
    representative is a real event, and total events reconcile with the
    input scan (no row lost or double-counted by the rollup)."""
    rows = QUERIES["dedup_url_canonical"](spark, sf_dir).collect()
    n_events_total = sum(r.n_events for r in rows)
    from broadway_kinesis_spark.session import load

    assert n_events_total == load(spark, sf_dir, "events").count()
    assert all(r.n_events >= r.n_variants >= 1 for r in rows)
    # the synthesizer guarantees collisions: spelling variance must be
    # visibly collapsing (some page has >1 raw spelling)
    assert any(r.n_variants > 1 for r in rows)


# ------------------------------------------------------------------- classifier
def test_classifier_logit_matches_python_reference(spark, sf_dir):
    """Recompute the frozen-model logit in plain Python for a sample of
    documents — feature extraction AND the left-associated float sum must
    agree exactly (the bit-exactness the oracle hash relies on)."""
    out = {
        r.doc_id: r
        for r in QUERIES["score_quality_classifier"](spark, sf_dir).collect()
    }
    from broadway_kinesis_spark.session import load

    docs = load(spark, sf_dir, "documents").limit(50).collect()
    assert docs
    for d in docs:
        toks = d.text.lower().split(" ")
        n_tok = len(toks)
        n_stop = sum(1 for t in toks if t in STOPWORDS)
        n_uniq = len(set(toks))
        n_digit = sum(1 for c in d.text if c.isdigit())
        n_upper = sum(1 for c in d.text if "A" <= c <= "Z")
        n_chars_g = max(len(d.text), 1)
        z = (
            BIAS
            + W_STOP * (n_stop / n_tok)
            + W_UNIQ * (n_uniq / n_tok)
            + W_DIGIT * (n_digit / n_chars_g)
            + W_UPPER * (n_upper / n_chars_g)
        )
        r = out[d.doc_id]
        assert (r.n_tok, r.n_stop, r.n_uniq) == (n_tok, n_stop, n_uniq), d.doc_id
        assert r.logit == z, (d.doc_id, r.logit, z)
        assert r.keep == (z >= 0.0)
        assert abs(r.prob_bp - 10_000 / (1.0 + math.exp(-z))) <= 0.5 + 1e-6


def test_classifier_is_monotone_in_its_features(spark):
    """Directional sanity on crafted docs: prose beats digit soup beats
    shouting — the signs of the frozen weights are doing their job."""
    docs = [
        (0, "the cat sat on the mat and it is a fine day for the cat"),
        (1, "981237 123 99812 37123 8 812 1237 9 912837 12 3"),
        (2, "BUY NOW BUY NOW BUY NOW BUY NOW BUY NOW"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        rows = {
            r.doc_id: r.logit
            for r in QUERIES["score_quality_classifier"](spark, td).collect()
        }
    assert rows[0] > rows[1] and rows[0] > rows[2], rows


# -------------------------------------------------------------------- plan pins
def test_url_dedup_is_projection_plus_bounded_exchanges(spark, sf_dir):
    """Canonicalization must stay JVM-side column algebra — no Python in
    the plan — and the rollup pays at most the two-phase distinct-rewrite
    exchanges PLUS (round 13) the guarded ``spread_small_scan``
    redistribution: a narrow 3-column hash exchange that exists only when
    the source has fewer estimated splits than cores (always at fixture
    scale, never at 100 TB — tests/test_round13_opt.py fences the guard).
    Scan prunes to the three source columns."""
    from broadway_kinesis_spark.plans import (
        formatted_plan,
        read_schemas,
        shuffle_count,
    )

    df = QUERIES["dedup_url_canonical"](spark, sf_dir)
    plan = formatted_plan(df)
    # no-Python is the JVM-side/codegen proof here: the AQE wrapper hides
    # codegen ids on exchange-bearing plans until execution (audit.py note)
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan
    assert shuffle_count(df) <= 3, plan
    # the third exchange must be the guarded spread, nothing else
    assert plan.count("REPARTITION_BY_NUM") <= 1, plan
    assert all(len(cols) <= 3 for cols in read_schemas(df)), read_schemas(df)


def test_host_topk_ranks_tiny_postagg_not_raw_events(spark, sf_dir):
    from broadway_kinesis_spark.plans import formatted_plan, shuffle_count

    df = QUERIES["url_host_topk"](spark, sf_dir)
    plan = formatted_plan(df)
    # groupBy(host) two-phase distinct (2) + the rank window over the
    # handful of post-agg host rows (1) — the window never sees raw events
    assert shuffle_count(df) <= 3, plan
    assert "BatchEvalPython" not in plan, plan


def test_bucketed_pagerank_only_rank_vector_exchanges(spark, sf_dir):
    """The 100x contract (VERDICT r4 #3): with the edge list bucketed on
    src and shuffle.partitions == N_BUCKETS (the test session config), the
    whole ITERS-round recurrence must plan exactly ITERS exchanges — one
    per dst-aggregation. Zero join-side exchanges means BOTH halves of the
    co-partitioning hold: the corpus-sized edge table reads pre-bucketed
    every round, and each round's node-sized rank vector arrives already
    hash-partitioned on the join key (round 1 from the bucketed node
    table, later rounds from the previous agg). Audited with AQE off so
    the static plan shows the real exchanges."""
    from broadway_kinesis_spark.operators.graph import ITERS, N_BUCKETS

    assert int(spark.conf.get("spark.sql.shuffle.partitions")) == N_BUCKETS
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = QUERIES["graph_pagerank_bucketed"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_ex = plan.count("Exchange ")
        assert n_ex == ITERS, f"{n_ex} exchanges (want {ITERS}):\n{plan}"
        assert "CartesianProduct" not in plan, plan
        assert "TakeOrderedAndProject" in plan, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_bucketed_pagerank_matches_plain_variant(spark, sf_dir):
    """Layout invariance end-to-end: the bucketed recurrence must produce
    the exact integer rank quanta of the in-plan variant (both are also
    oracle-checked against the same SQL — this pins them to each other
    locally without DuckDB in the loop)."""
    plain = QUERIES["graph_pagerank"](spark, sf_dir).collect()
    bucketed = QUERIES["graph_pagerank_bucketed"](spark, sf_dir).collect()
    assert plain == bucketed


def test_classifier_is_zero_shuffle_zero_python(spark, sf_dir):
    """The 100 TB contract: scoring is ONE pass over the corpus — a
    stateless codegen projection. Any exchange or Python eval here is a
    regression."""
    from broadway_kinesis_spark.plans import (
        formatted_plan,
        shuffle_count,
        wholestage_codegen_spans,
    )

    df = QUERIES["score_quality_classifier"](spark, sf_dir)
    plan = formatted_plan(df)
    assert shuffle_count(df) == 0, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan
    assert wholestage_codegen_spans(df) >= 1, plan


# ---------------------------------------------------------------- 5b operators
def test_winsorize_bounds_are_exact_rank_quantiles(spark, sf_dir):
    """Recompute the rank-defined p05/p95 per group in Python and check
    every clamped value: below-band rows clamp UP to p_lo, above-band
    clamp DOWN to p_hi, in-band rows pass through bit-identical."""
    from broadway_kinesis_spark.operators.winsorize import Q_HI, Q_LO
    from broadway_kinesis_spark.session import load

    rows = QUERIES["window_winsorize"](spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).collect()
    by_type: dict[str, list] = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append((r.value, r.event_id))
    bounds = {}
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        lo = vals[(Q_LO * n + 99) // 100 - 1][0]
        hi = vals[(Q_HI * n + 99) // 100 - 1][0]
        bounds[et] = (lo, hi)
    assert len(rows) == len(ev)
    n_lo = n_hi = 0
    for r in rows:
        lo, hi = bounds[r.event_type]
        if r.value < lo:
            assert r.value_w == lo and r.clip == "lo"
            n_lo += 1
        elif r.value > hi:
            assert r.value_w == hi and r.clip == "hi"
            n_hi += 1
        else:
            assert r.value_w == r.value and r.clip == "in"
    assert n_lo > 0 and n_hi > 0  # the band actually clips both tails


def test_quantile_histogram_brackets_the_exact_quantile(spark, sf_dir):
    """The summary's contract: for each q, the exact rank quantile lies
    within the reported bucket — (est_upper - W, est_upper]. This is the
    error bound that justifies answering percentiles from merged partials
    instead of a sort at 100 TB."""
    from broadway_kinesis_spark.operators.quantiles import W
    from broadway_kinesis_spark.session import load

    rows = {r.q: r for r in QUERIES["agg_quantile_histogram"](spark, sf_dir).collect()}
    vals = sorted(
        r.value for r in load(spark, sf_dir, "events").select("value").collect()
    )
    n = len(vals)
    for q, r in rows.items():
        exact = vals[(q * n + 99) // 100 - 1]
        assert r.est_upper - W < exact <= r.est_upper, (q, exact, r.est_upper)
        assert r.total_count == n


def test_scd2_intervals_tile_and_one_current_per_key(spark, sf_dir):
    """Per key: versions are 1..n in (ts, event_id) order, consecutive
    intervals share endpoints (half-open tiling, no gaps/overlaps), and
    exactly the last row is current (sentinel valid_to)."""
    from collections import defaultdict

    from broadway_kinesis_spark.operators.scd import HIGH_DATE

    rows = QUERIES["cdc_scd2_history"](spark, sf_dir).collect()
    by_key = defaultdict(list)
    for r in rows:
        by_key[(r.user_id, r.event_type)].append(r)
    assert by_key
    import datetime as dt

    sentinel = dt.datetime.fromisoformat(HIGH_DATE)
    for key, history in by_key.items():
        history.sort(key=lambda r: r.version)
        assert [r.version for r in history] == list(range(1, len(history) + 1))
        for a, b in zip(history, history[1:]):
            assert a.valid_to == b.valid_from, key  # tiling
            assert not a.is_current
        last = history[-1]
        assert last.is_current and last.valid_to == sentinel


def test_partition_pruned_scan_reads_one_partition(spark, sf_dir):
    """The plan must show the partition filter doing the work: partition
    filters on event_type, NO pushed data filters left over, and the
    chosen file listing confined to the one matching partition dir."""
    from broadway_kinesis_spark.operators.partitioned import TARGET_TYPE

    df = QUERIES["scan_partition_pruned"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and TARGET_TYPE in m.group(1), plan
    # the data-filter slot should be empty — the partition column carries
    # the whole predicate
    dm = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert dm is None or dm.group(1).strip() == "", plan


def test_group_regression_matches_numpy_lstsq(spark, sf_dir):
    """The exact-integer closed forms must agree with a float least-squares
    fit to ~1e-9 relative (the float fit carries rounding the integer path
    doesn't), and r2 must land in [0, 1]."""
    import numpy as np

    from broadway_kinesis_spark.operators.regression import US_PER_DAY, X0
    from broadway_kinesis_spark.session import load

    rows = {r.event_type: r for r in QUERIES["agg_group_regression"](spark, sf_dir).collect()}
    ev = load(spark, sf_dir, "events").selectExpr(
        "event_type", f"unix_micros(ts) div {US_PER_DAY} - {X0} AS x",
        "CAST(ROUND(value * 100) AS BIGINT) AS y",
    ).collect()
    groups: dict[str, list] = {}
    for r in ev:
        groups.setdefault(r.event_type, []).append((r.x, r.y))
    for et, pts in groups.items():
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        got = rows[et]
        assert abs(got.slope_cents_per_day - slope) <= 1e-6 * max(1.0, abs(slope))
        assert abs(got.intercept_cents - intercept) <= 1e-6 * max(1.0, abs(intercept))
        assert 0.0 <= got.r2 <= 1.0
        assert got.n == len(pts)


def test_profile_columns_is_single_scan_and_sane(spark, sf_dir):
    from broadway_kinesis_spark.plans import read_schemas
    from broadway_kinesis_spark.session import load

    df = QUERIES["profile_columns"](spark, sf_dir)
    assert len(read_schemas(df)) == 1, "profiling must be ONE scan"
    rows = {r.column_name: r for r in df.collect()}
    n = load(spark, sf_dir, "events").count()
    assert set(rows) == {"event_id", "ts", "user_id", "event_type", "value", "props"}
    for r in rows.values():
        assert r.n_rows == n
        assert 0 <= r.n_null <= n and abs(r.null_frac - r.n_null / n) < 1e-15
        assert 1 <= r.n_distinct <= n
    assert rows["event_id"].n_distinct == n  # primary key
    assert rows["event_id"].min_canon == 0
    assert rows["event_type"].min_canon is None  # no canonical projection


def test_quantile_histogram_is_two_level_and_post_agg_tiny(spark, sf_dir):
    """Level 1 (shard x bucket) and level 2 (bucket) are two aggregations;
    the cumulative window and quantile join run on summary-sized rows.
    No Python anywhere; bounded exchanges."""
    from broadway_kinesis_spark.plans import formatted_plan, shuffle_count

    df = QUERIES["agg_quantile_histogram"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan, plan
    assert plan.count("HashAggregate") >= 4, plan  # 2 levels x partial/final
    assert shuffle_count(df) <= 4, plan


def test_group_regression_is_one_exchange_no_window(spark, sf_dir):
    from broadway_kinesis_spark.plans import formatted_plan, shuffle_count

    df = QUERIES["agg_group_regression"](spark, sf_dir)
    plan = formatted_plan(df)
    assert shuffle_count(df) <= 1, plan
    assert "Window" not in plan and "Join" not in plan, plan


def test_scd2_is_single_window_pass(spark, sf_dir):
    from broadway_kinesis_spark.plans import formatted_plan, read_schemas, shuffle_count

    df = QUERIES["cdc_scd2_history"](spark, sf_dir)
    plan = formatted_plan(df)
    assert shuffle_count(df) <= 1, plan
    assert "Join" not in plan, plan
    assert len(read_schemas(df)) == 1, read_schemas(df)


def test_winsorize_is_window_plus_broadcast_joinback(spark, sf_dir):
    from broadway_kinesis_spark.plans import (
        broadcast_join_count,
        formatted_plan,
        shuffle_count,
    )

    df = QUERIES["window_winsorize"](spark, sf_dir)
    plan = formatted_plan(df)
    assert broadcast_join_count(df) >= 1, plan  # bounds ride back broadcast
    assert shuffle_count(df) <= 2, plan


def test_time_decay_anchor_broadcasts_single_exchange(spark, sf_dir):
    from broadway_kinesis_spark.plans import formatted_plan, shuffle_count

    df = QUERIES["agg_time_decay"](spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan  # anchor is broadcast-NLJ
    assert shuffle_count(df) <= 2, plan


def test_asof_tolerance_nulls_stale_matches_but_keeps_rows(spark, sf_dir):
    """Every purchase row survives (left semantics); matches older than
    the bound are nulled with attributed=False; gaps within the bound are
    non-negative and <= the bound."""
    from broadway_kinesis_spark.operators.asof import TOL_MIN, US_PER_MIN

    base = {r.purchase_id: r for r in QUERIES["asof_join"](spark, sf_dir).collect()}
    tol = {r.purchase_id: r for r in QUERIES["asof_join_tolerance"](spark, sf_dir).collect()}
    assert set(base) == set(tol)
    bound = TOL_MIN * US_PER_MIN
    n_nulled = 0
    for pid, r in tol.items():
        if r.attributed:
            assert 0 <= r.gap_us <= bound
            assert r.view_id == base[pid].view_id
        else:
            assert r.view_id is None and r.gap_us is None
            if base[pid].view_id is not None:
                n_nulled += 1  # had a match, too old
    assert n_nulled > 0, "tolerance must actually null some stale matches"


def test_range_binned_is_pure_equi_join_matching_plain_variant(spark, sf_dir):
    """The rewrite contract: (1) the join condition is EQUI (user, bin) —
    the inequality lives in a residual Filter, never in the join; (2) the
    result set is row-for-row the plain inequality-join variant's."""
    from broadway_kinesis_spark.plans import formatted_plan

    df = QUERIES["join_range_binned"](spark, sf_dir)
    plan = formatted_plan(df)
    # formatted-explain detail lists the equi keys: `bin` must be one of
    # them — THAT is the rewrite (hashing distributes pairs by (user,
    # bin), bounding per-bucket volume). Catalyst folds the residual range
    # back into the hash join's extra condition, which is fine: it is
    # evaluated per hash-matched pair, not used for distribution. What
    # must never appear is a nested-loop/cartesian strategy.
    key_lines = [l for l in plan.splitlines() if "keys" in l and "bin#" in l]
    assert key_lines, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
    binned = sorted(
        (r.click_id, r.purchase_id, r.gap_us) for r in df.collect()
    )
    plain = sorted(
        (r.click_id, r.purchase_id, r.gap_us)
        for r in QUERIES["join_range_interval"](spark, sf_dir).collect()
    )
    # lossless rewrite (non-empty coverage comes from the sf0.01/sf0.1
    # oracle runs — the sf0.001 fixture has no in-bound pair)
    assert binned == plain


def test_binned_winsorize_band_contains_exact_band_and_no_sort(spark, sf_dir):
    """Conservative-widening contract: every row the exact variant keeps
    unclipped, the binned variant keeps unclipped too (its band only
    widens, by < one bucket per side); and the plan never sorts raw rows
    — the only Sort operates on summary-sized (group, bucket) rows."""
    from broadway_kinesis_spark.operators.winsorize import W_BIN

    exact = {r.event_id: r for r in QUERIES["window_winsorize"](spark, sf_dir).collect()}
    binned = {r.event_id: r for r in QUERIES["window_winsorize_binned"](spark, sf_dir).collect()}
    assert set(exact) == set(binned)
    for eid, b in binned.items():
        e = exact[eid]
        if e.clip == "in":
            assert b.clip == "in", eid
        if b.clip != "in":
            # binned clamp lands within one bucket of the exact bound.
            # lo side is strict (p_lo ∈ [lo_edge, lo_edge + W_BIN)); hi
            # side reaches exactly W_BIN when the exact p_hi lands on a
            # bucket's lower edge (hi_edge = next edge) — so <=.
            if b.clip == "lo":
                assert abs(b.value_w - e.value_w) < W_BIN, (eid, b, e)
            else:
                assert abs(b.value_w - e.value_w) <= W_BIN, (eid, b, e)


def test_chunk_overlap_covers_every_word_with_exact_overlap(spark, sf_dir):
    """Every word index of every document falls in >= 1 chunk; consecutive
    chunks overlap by exactly CHUNK_W - STRIDE (when both are full); and
    concatenating each chunk's first STRIDE words (plus the last chunk's
    tail) reconstructs the lowercased document."""
    from collections import defaultdict

    from broadway_kinesis_spark.operators.chunking import CHUNK_W, STRIDE
    from broadway_kinesis_spark.session import load

    rows = QUERIES["text_chunk_overlap"](spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text.lower().split(" ")
        for r in load(spark, sf_dir, "documents").collect()
    }
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    assert set(by_doc) == set(docs)
    for did, chunks in by_doc.items():
        words = docs[did]
        chunks.sort(key=lambda r: r.chunk_id)
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        rebuilt = []
        for c in chunks:
            assert c.start_word == c.chunk_id * STRIDE
            assert c.chunk_words == min(len(words) - c.start_word, CHUNK_W)
            assert c.chunk_text == " ".join(
                words[c.start_word : c.start_word + CHUNK_W]
            )
            rebuilt.extend(
                words[c.start_word : c.start_word + STRIDE]
                if c is not chunks[-1]
                else words[c.start_word :]
            )
        assert rebuilt == words, did
        # full coverage: the last chunk reaches the document's end
        last = chunks[-1]
        assert last.start_word + last.chunk_words == len(words)


def test_bloom_prefilter_prunes_and_never_drops_a_true_hit(spark, sf_dir):
    """The gate's two contracts: (1) LOSSLESS — the final output equals
    the ungated operator's row-for-row (also hash-proven by the shared
    oracle); (2) SELECTIVE — the candidate gram stream after the bitmap
    gate is a small fraction of the corpus grams (FPR ~ n/M) while still
    a superset of the true shared grams."""
    from broadway_kinesis_spark.operators.bloom import M_BITS, _pos
    from broadway_kinesis_spark.operators.pipeline_ops import (
        BENCH_CUT,
        NGRAM,
        _word_ngrams,
    )
    from broadway_kinesis_spark.session import load

    gated = sorted(
        (r.doc_id, r.n_shared_grams, r.contaminated)
        for r in QUERIES["dedup_decontaminate_bloom"](spark, sf_dir).collect()
    )
    plain = sorted(
        (r.doc_id, r.n_shared_grams, r.contaminated)
        for r in QUERIES["dedup_decontaminate"](spark, sf_dir).collect()
    )
    assert gated == plain

    d = load(spark, sf_dir, "documents")
    bench = (
        _word_ngrams(d.filter(F.col("doc_id") < BENCH_CUT), NGRAM)
        .select("gram").distinct()
    )
    corp = _word_ngrams(d.filter(F.col("doc_id") >= BENCH_CUT), NGRAM).distinct()
    n_corp = corp.count()
    true_hits = corp.join(bench, "gram").count()
    bench_pos = bench.select(F.expr(f"pmod(xxhash64(gram), {M_BITS})").alias("p"))
    cand = (
        corp.withColumn("p", _pos(F.col("gram")))
        .join(bench_pos.distinct(), "p")
        .count()
    )
    assert cand >= true_hits  # superset: no true hit gated away
    # selective: false positives are a small multiple of n/M
    assert cand <= true_hits + max(50, n_corp // 20), (cand, true_hits, n_corp)


def test_group_regression_degenerate_groups_emit_null(spark):
    """ADVICE r5: all-equal x (single-day group) makes den = nΣx²−(Σx)² = 0
    and constant y makes den_y = 0 — both engines must emit NULL, not the
    IEEE 0-division NaN/±Inf whose cross-engine hash equality is accidental.
    Verified against the DuckDB oracle on the same synthetic corpus."""
    import os
    import tempfile
    from datetime import datetime

    from oracle_harness import compare, run_oracle

    rows = [
        # single_day: 3 points, same day -> den = 0 -> all three fits NULL
        ("single_day", datetime(2024, 3, 1, 1), 1.0),
        ("single_day", datetime(2024, 3, 1, 2), 2.0),
        ("single_day", datetime(2024, 3, 1, 3), 9.0),
        # const_y: 3 days, constant y -> den != 0, den_y = 0 -> r2 NULL only
        ("const_y", datetime(2024, 3, 1), 5.0),
        ("const_y", datetime(2024, 3, 2), 5.0),
        ("const_y", datetime(2024, 3, 3), 5.0),
        # normal: a perfect 2 cents/day line -> slope 2, r2 = 1
        ("normal", datetime(2024, 3, 1), 1.00),
        ("normal", datetime(2024, 3, 2), 1.02),
        ("normal", datetime(2024, 3, 3), 1.04),
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "events.parquet"))
        got = {
            r.event_type: r
            for r in QUERIES["agg_group_regression"](spark, td).collect()
        }
        oracle_pdf = run_oracle(entrymod.oracle_sql()["agg_group_regression"], td)
        spark_pdf = QUERIES["agg_group_regression"](spark, td).toPandas()
        compare(spark_pdf, oracle_pdf, name="agg_group_regression[degenerate]")
    sd = got["single_day"]
    assert sd.slope_cents_per_day is None
    assert sd.intercept_cents is None
    assert sd.r2 is None
    cy = got["const_y"]
    assert cy.slope_cents_per_day == 0.0
    assert cy.intercept_cents == 500.0
    assert cy.r2 is None
    nm = got["normal"]
    assert abs(nm.slope_cents_per_day - 2.0) < 1e-12
    assert abs(nm.r2 - 1.0) < 1e-12
