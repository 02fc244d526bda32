"""Cross-engine property fuzz for the URL canonicalizer.

The canonicalizer is the round-5 operator most exposed to ENGINE-DIALECT
drift: it is built entirely from regexp/split/sort string algebra whose
semantics must agree between Spark (Java regex, global replace by
default) and DuckDB (RE2, global replace only with 'g'). The oracle
harness only ever sees the synthesizer's messy-but-regular URLs; these
properties drive RANDOM adversarial URLs through BOTH engines and assert:

1. cross-engine agreement: Spark's canonical string == DuckDB's, for the
   same raw input (the property the driver hash depends on);
2. idempotence: canon(canon(u)) == canon(u) in Spark (the fixed point
   re-crawl dedup relies on — a code-review pass already caught one
   violation here, so this fuzz is the regression fence).

URL alphabet is constrained to the grammar the canonicalizer documents
(scheme://host[:port]/path[?query][#fragment] over unreserved chars) —
the operator's contract is crawl-shaped URLs, not arbitrary bytes.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from broadway_kinesis_spark.operators.urls import _CANON_SQL, canonicalize

_SCHEME = st.sampled_from(["http", "HTTP", "https", "HTTPS", "Http", "hTTpS"])
_LABEL = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-",
    min_size=1,
    max_size=8,
)
_HOST = st.builds(
    lambda www, labels, port: www + ".".join(labels) + port,
    st.sampled_from(["", "www.", "WWW.", "wWw."]),
    st.lists(_LABEL, min_size=1, max_size=3),
    st.sampled_from(["", ":80", ":443", ":8080"]),
)
_SEG = st.sampled_from(
    ["a", "b", "products", "index.html", "Index.html", "x1", "", "index.html"]
)
_PATH = st.builds(
    lambda segs, trail: ("/" + "/".join(segs) + trail) if segs else trail,
    st.lists(_SEG, min_size=0, max_size=4),
    st.sampled_from(["", "/", "//"]),
)
_PARAM = st.builds(
    lambda k, v: f"{k}={v}" if v is not None else k,
    st.sampled_from(
        ["id", "sort", "q", "utm_source", "utm_x", "gclid", "fbclid", "ref",
         "mc_eid", "page", "utm"]
    ),
    st.one_of(st.none(), st.integers(0, 99).map(str), st.just("a")),
)
_QUERY = st.builds(
    lambda ps: "?" + "&".join(ps) if ps else "",
    st.lists(_PARAM, min_size=0, max_size=5),
)
_FRAG = st.sampled_from(["", "#top", "#a/b?c"])

URLS = st.builds(
    lambda s, h, p, q, f: f"{s}://{h}{p}{q}{f}",
    _SCHEME,
    _HOST,
    _PATH,
    _QUERY,
    _FRAG,
)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _spark_canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], ["raw_url"])
    return [
        r.c for r in df.select(canonicalize(F.col("raw_url")).alias("c")).collect()
    ]


def _duck_canon(duck, urls: list[str]) -> list[str]:
    duck.execute("CREATE OR REPLACE TABLE _fuzz(raw_url VARCHAR)")
    duck.executemany("INSERT INTO _fuzz VALUES (?)", [(u,) for u in urls])
    rows = duck.execute(
        f"""
        SELECT scheme || '://' || host || path
               || CASE WHEN canon_qs = '' THEN '' ELSE '?' || canon_qs END
        FROM (SELECT raw_url, {_CANON_SQL} FROM _fuzz)
        """
    ).fetchall()
    return [r[0] for r in rows]


@settings(max_examples=15, deadline=None)
@given(st.lists(URLS, min_size=1, max_size=30))
def test_canonicalizer_agrees_across_engines_and_is_idempotent(
    spark, duck, urls
):
    s = _spark_canon(spark, urls)
    d = _duck_canon(duck, urls)
    assert s == d, list(zip(urls, s, d))
    again = _spark_canon(spark, s)
    assert again == s, list(zip(urls, s, again))
