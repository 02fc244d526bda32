"""Property fuzz for the as-of union-merge trick vs a brute-force oracle.

The as-of join's single-shuffle re-expression (union both sides, one
window pass carrying the latest right row forward — operators/asof.py)
has subtle edges the fixture can't systematically cover: exact timestamp
ties between view and purchase, multiple views at the same instant
(max(event_id) wins), users with no views, tolerance boundaries landing
exactly ON the bound. Hypothesis generates random event streams and
checks BOTH operators row-for-row against a brute-force Python matcher
implementing the documented semantics directly.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from broadway_kinesis_spark import registry
from broadway_kinesis_spark.operators.asof import TOL_MIN, US_PER_MIN

_EVENT = st.tuples(
    st.sampled_from(["view", "purchase"]),
    st.integers(0, 2),  # user_id: few users -> dense interleavings
    st.integers(0, 10),  # coarse time slot -> frequent exact ties
)


def _mk_events(spark, evs):
    rows = [
        (i, u, et, pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=slot * 10))
        for i, (et, u, slot) in enumerate(evs)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])
    ).withColumn("value", (F.col("event_id") * 1.0))


from pyspark.sql import functions as F  # noqa: E402


@pytest.fixture(scope="module")
def queries():
    return registry.queries()


def _brute(evs):
    """purchase_id -> (view_id | None, gap_us | None) per documented
    semantics: nearest-earlier (<=) view by same user; among views at the
    same instant the max event_id; gap in µs."""
    out = {}
    us = lambda slot: slot * 10 * 60 * 1_000_000  # noqa: E731
    for i, (et, u, slot) in enumerate(evs):
        if et != "purchase":
            continue
        best = None  # (t, view_id)
        for j, (et2, u2, slot2) in enumerate(evs):
            if et2 == "view" and u2 == u and slot2 <= slot:
                cand = (us(slot2), j)
                if best is None or cand > best:
                    best = cand
        if best is None:
            out[i] = (None, None)
        else:
            out[i] = (best[1], us(slot) - best[0])
    return out


@settings(max_examples=12, deadline=None)
@given(st.lists(_EVENT, min_size=1, max_size=24))
def test_asof_and_tolerance_match_brute_force(spark, tmp_path_factory, queries, evs):
    import os

    td = str(tmp_path_factory.mktemp("asof"))
    _mk_events(spark, evs).write.mode("overwrite").parquet(
        os.path.join(td, "events.parquet")
    )
    want = _brute(evs)
    got = {
        r.purchase_id: (r.view_id, None)
        for r in queries["asof_join"](spark, td).collect()
    }
    assert set(got) == set(want)
    for pid, (vid, _gap) in want.items():
        assert got[pid][0] == vid, (pid, got[pid], want[pid], evs)

    bound = TOL_MIN * US_PER_MIN
    got_tol = {
        r.purchase_id: (r.view_id, r.gap_us, r.attributed)
        for r in queries["asof_join_tolerance"](spark, td).collect()
    }
    assert set(got_tol) == set(want)
    for pid, (vid, gap) in want.items():
        g_vid, g_gap, g_att = got_tol[pid]
        if vid is not None and gap <= bound:
            assert (g_vid, g_gap, g_att) == (vid, gap, True), (pid, evs)
        else:
            assert (g_vid, g_gap, g_att) == (None, None, False), (pid, evs)


def _brute_forward(evs):
    """view_id -> (purchase_id | None, lead_us | None): earliest purchase
    at-or-after the view by the same user; among purchases at the same
    instant the max event_id (the deduped-right convention)."""
    out = {}
    us = lambda slot: slot * 10 * 60 * 1_000_000  # noqa: E731
    for i, (et, u, slot) in enumerate(evs):
        if et != "view":
            continue
        best = None  # (t, -purchase_id) minimized -> earliest t, max id
        for j, (et2, u2, slot2) in enumerate(evs):
            if et2 == "purchase" and u2 == u and slot2 >= slot:
                cand = (us(slot2), -j)
                if best is None or cand < best:
                    best = cand
        if best is None:
            out[i] = (None, None)
        else:
            out[i] = (-best[1], best[0] - us(slot))
    return out


@settings(max_examples=12, deadline=None)
@given(st.lists(_EVENT, min_size=1, max_size=24))
def test_asof_forward_matches_brute_force(spark, tmp_path_factory, queries, evs):
    import os

    td = str(tmp_path_factory.mktemp("asoff"))
    _mk_events(spark, evs).write.mode("overwrite").parquet(
        os.path.join(td, "events.parquet")
    )
    want = _brute_forward(evs)
    got = {
        r.view_id: (r.purchase_id, r.lead_us)
        for r in queries["asof_join_forward"](spark, td).collect()
    }
    assert set(got) == set(want)
    for vid, exp in want.items():
        assert got[vid] == exp, (vid, got[vid], exp, evs)


def _brute_nearest(evs):
    """purchase_id -> (view_id | None, abs_gap_us | None): closest view in
    either direction; ties resolve backward (pandas' rule); same-instant
    view counts as a backward gap-0 match; view ties at equal distance
    and direction resolve by max event_id on the deduped side."""
    us = lambda slot: slot * 10 * 60 * 1_000_000  # noqa: E731
    out = {}
    for i, (et, u, slot) in enumerate(evs):
        if et != "purchase":
            continue
        back = None  # (t, view_id) maximized
        fwd = None  # (t, -view_id) minimized
        for j, (et2, u2, slot2) in enumerate(evs):
            if et2 != "view" or u2 != u:
                continue
            if slot2 <= slot:
                cand = (us(slot2), j)
                if back is None or cand > back:
                    back = cand
            else:
                cand = (us(slot2), -j)
                if fwd is None or cand < fwd:
                    fwd = cand
        b = (back[1], us(slot) - back[0]) if back else None
        f = (-fwd[1], fwd[0] - us(slot)) if fwd else None
        if b is not None and (f is None or b[1] <= f[1]):
            out[i] = b
        elif f is not None:
            out[i] = f
        else:
            out[i] = (None, None)
    return out


@settings(max_examples=12, deadline=None)
@given(st.lists(_EVENT, min_size=1, max_size=24))
def test_asof_nearest_matches_brute_force(spark, tmp_path_factory, queries, evs):
    import os

    td = str(tmp_path_factory.mktemp("asofn"))
    _mk_events(spark, evs).write.mode("overwrite").parquet(
        os.path.join(td, "events.parquet")
    )
    want = _brute_nearest(evs)
    got = {
        r.purchase_id: (r.view_id, r.abs_gap_us)
        for r in queries["asof_join_nearest"](spark, td).collect()
    }
    assert set(got) == set(want)
    for pid, exp in want.items():
        assert got[pid] == exp, (pid, got[pid], exp, evs)
