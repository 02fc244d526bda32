"""URL canonicalization + host-level dedup (VERDICT r4 #7a).

Web-crawl corpora (C4, RefinedWeb, FineWeb) dedup first on the URL: the
same page is fetched under dozens of spellings — scheme/host case, a
``www.`` prefix, default ports, doubled slashes, ``/index.html`` suffixes,
trailing slashes, tracking params (``utm_*``/``gclid``/``fbclid``/``ref``),
and shuffled query-param order. Canonicalizing before the content-level
MinHash pass removes the bulk of exact duplicates for the price of a string
projection, so the expensive near-dup machinery only sees one row per page.

The test tables carry no URL column, so each event synthesizes a messy —
but deterministic — URL from its own integer columns (same expression in
Spark and the DuckDB oracle); the OPERATOR is the canonicalizer, which
accepts any spelling the synthesizer can emit.

Canonical form (applied piecewise, identical spec both engines):
- scheme lowercased;
- host lowercased, leading ``www.`` stripped, default port stripped
  (``:80`` iff http, ``:443`` iff https — a non-default port survives);
- path: runs of ``/`` collapsed, then trailing ``/`` stripped, then any
  trailing run of ``/index.html`` stripped (in THAT order, repeated-run
  aware — the order that makes the form a fixed point), empty path
  becomes ``/``;
- query: params split on ``&``, tracking params dropped (``utm_*`` prefix
  or key in the pinned denylist), survivors SORTED (binary string order —
  identical in both engines) and rejoined; empty survivor set drops the
  ``?`` entirely;
- fragment dropped.

Exactness: pure string algebra — regexp_extract/regexp_replace/split/
filter/sort/concat — no floats anywhere. Cross-engine traps, each pinned
by the property fuzz (tests/test_url_properties.py, which drives random
adversarial URLs through BOTH engines):
- regexp_replace default scope: Spark replaces ALL matches, DuckDB only
  the FIRST without the ``'g'`` flag — every multi-match pattern in the
  oracle passes ``'g'`` explicitly;
- empty-list join: Spark ``array_join([], sep)`` is ``''`` but DuckDB
  ``array_to_string([], sep)`` is NULL, which would NULL the whole
  concatenated URL for a query string made entirely of tracking params —
  the oracle COALESCEs it (found by the fuzz; the synthesizer's regular
  URLs never hit it).

Scale posture: canonicalization is a stateless projection (whole-stage
codegen, no UDF, no shuffle); each query then pays exactly one exchange
for its groupBy. ``n_variants`` uses Spark's two-phase distinct rewrite
(partial per-partition distinct before the exchange). At 100 TB this is
the cheapest dedup tier there is — run it FIRST, before MinHash ever sees
the corpus (operators/composite.py shows the staged-funnel pattern).

Reference parity: [TGT] — no URL surface in the reference; engine
extension beyond it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load, spread_small_scan

#: non-utm_* tracking keys dropped from query strings (pinned denylist)
TRACKING_KEYS = ("gclid", "fbclid", "ref", "mc_eid")

TOP_HOSTS = 5  # url_host_topk result size


def _synth_url() -> Column:
    """Deterministic messy URL from (event_id, user_id, event_type).

    Spellings vary in scheme case, www. prefix, host case, explicit default
    (and non-default!) ports, doubled slashes, /index.html vs trailing /,
    tracking params, param order, and fragments — while the canonical page
    identity is pinned by (scheme class, site, tld class, event_type,
    id bucket), so every canonical URL is hit by several raw spellings.
    """
    eid, uid = F.col("event_id"), F.col("user_id")
    scheme = (
        F.when(eid % 4 == 0, "http")
        .when(eid % 4 == 1, "HTTPS")
        .when(eid % 4 == 2, "https")
        .otherwise("Http")
    )
    www = F.when(eid % 2 == 0, "www.").otherwise("")
    tld = (
        F.when(uid % 3 == 0, "com").when(uid % 3 == 1, "COM").otherwise("org")
    )
    port = F.when(eid % 3 == 0, "").when(eid % 3 == 1, ":80").otherwise(":443")
    suffix = (
        F.when(eid % 3 == 0, "/").when(eid % 3 == 1, "/index.html").otherwise("")
    )
    qs = F.when(
        eid % 2 == 0,
        F.concat(
            F.lit("utm_source=news&id="),
            (eid % 50).cast("string"),
            F.lit("&sort=asc"),
        ),
    ).otherwise(
        F.concat(
            F.lit("sort=asc&fbclid=track123&id="), (eid % 50).cast("string")
        )
    )
    frag = F.when(eid % 5 == 0, "#top").otherwise("")
    return F.concat(
        scheme,
        F.lit("://"),
        www,
        F.lit("Site"),
        (uid % 7).cast("string"),
        F.lit(".Example."),
        tld,
        port,
        F.lit("/products//"),
        F.col("event_type"),
        suffix,
        F.lit("?"),
        qs,
        frag,
    )


#: the same synthesis in DuckDB SQL (|| casts are explicit for parity)
_SYNTH_SQL = """
        CASE event_id % 4 WHEN 0 THEN 'http' WHEN 1 THEN 'HTTPS'
             WHEN 2 THEN 'https' ELSE 'Http' END
        || '://'
        || CASE event_id % 2 WHEN 0 THEN 'www.' ELSE '' END
        || 'Site' || CAST(user_id % 7 AS VARCHAR)
        || '.Example.'
        || CASE user_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'COM'
                ELSE 'org' END
        || CASE event_id % 3 WHEN 0 THEN '' WHEN 1 THEN ':80'
                ELSE ':443' END
        || '/products//' || event_type
        || CASE event_id % 3 WHEN 0 THEN '/' WHEN 1 THEN '/index.html'
                ELSE '' END
        || '?'
        || CASE event_id % 2
           WHEN 0 THEN 'utm_source=news&id=' || CAST(event_id % 50 AS VARCHAR)
                       || '&sort=asc'
           ELSE 'sort=asc&fbclid=track123&id=' || CAST(event_id % 50 AS VARCHAR)
           END
        || CASE event_id % 5 WHEN 0 THEN '#top' ELSE '' END
"""


def _scheme_of(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))


def _host_of(url: Column, scheme: Column) -> Column:
    """Canonical host given the (already computed) scheme column."""
    hostport = F.lower(F.regexp_extract(url, r"^[A-Za-z]+://([^/?#]*)", 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    return F.when(
        scheme == "http", F.regexp_replace(host, r":80$", "")
    ).otherwise(F.when(scheme == "https", F.regexp_replace(host, r":443$", "")).otherwise(host))


def _path_stripped_of(url: Column) -> Column:
    """Collapsed/stripped path BEFORE the empty->'/' default (the default
    references the stripped value twice, so callers stage this column and
    apply the default on the attribute — one evaluation of the regex
    chain per row instead of two)."""
    path = F.regexp_extract(url, r"^[A-Za-z]+://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    # Trailing '/' strips BEFORE index.html (so '/a/index.html/' reaches
    # the suffix rule), and the suffix rule strips REPEATED '/index.html'
    # runs — both required for canon(canon(u)) == canon(u) (the fixed
    # point the dedup relies on; a code-review pass caught the original
    # order under-dedup'ing '/a/index.html/').
    path = F.regexp_replace(path, r"/$", "")
    return F.regexp_replace(path, r"(/index\.html)+$", "")


def _canon_qs_of(url: Column) -> Column:
    """Sorted surviving query params, joined — '' when none survive."""
    # anchored before the fragment: a '?' INSIDE the fragment must not
    # leak fragment content into the query (code-review finding —
    # 'http://h/p#a/b?c' is the same page as 'http://h/p')
    rawq = F.regexp_extract(url, r"^[^#]*?\?([^#]*)", 1)
    key = lambda p: F.substring_index(p, "=", 1)  # noqa: E731
    params = F.array_sort(
        F.filter(
            F.split(rawq, "&"),
            lambda p: (p != "")
            & ~(
                (F.substring(key(p), 1, 4) == "utm_")
                | key(p).isin(*TRACKING_KEYS)
            ),
        )
    )
    return F.array_join(params, "&")


def _assemble(scheme: Column, host: Column, path_stripped: Column, canon_qs: Column) -> Column:
    """scheme/host/path/query pieces -> the canonical URL string."""
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(path_stripped == "", "/").otherwise(path_stripped),
        F.when(canon_qs == "", "").otherwise(F.concat(F.lit("?"), canon_qs)),
    )


def canonicalize(url: Column) -> Column:
    """Canonical URL per the module-docstring spec. Pure column algebra —
    safe inside any projection; no UDF, no shuffle. Single-column form
    (property-fuzzed); the registered queries stage the same pieces as
    separate projected columns so each regex chain evaluates once per row
    (round-13 optimization — CollapseProject keeps non-cheap expressions
    staged when referenced more than once, so the staged plan is the
    one-evaluation plan)."""
    scheme = _scheme_of(url)
    return _assemble(
        scheme, _host_of(url, scheme), _path_stripped_of(url), _canon_qs_of(url)
    )


def canonical_host(url: Column) -> Column:
    """Just the canonical host (for host-level rollups)."""
    return _host_of(url, _scheme_of(url))


def _staged_parts(raw: DataFrame) -> DataFrame:
    """Stage the canonicalizer's pieces as projected columns over a
    ``raw_url`` column: ``scheme``/``host``/``path0``/``canon_qs`` plus
    ``canonical_url``. Identical piece expressions to :func:`canonicalize`
    (shared builders), but each expensive regex chain lands in its own
    column and later stages reference the ATTRIBUTE — Catalyst's
    CollapseProject refuses to inline a non-cheap expression referenced
    more than once, so every chain is evaluated exactly once per row
    (the single-column form evaluates scheme 4x and path/query 2x)."""
    url = F.col("raw_url")
    parts = raw.withColumn("scheme", _scheme_of(url))
    parts = parts.withColumns(
        {
            "host": _host_of(url, F.col("scheme")),
            "path0": _path_stripped_of(url),
            "canon_qs": _canon_qs_of(url),
        }
    )
    return parts.withColumn(
        "canonical_url",
        _assemble(F.col("scheme"), F.col("host"), F.col("path0"), F.col("canon_qs")),
    )


#: DuckDB-side canonicalizer over a column named raw_url (CTE fragment).
#: Multi-match regexp_replace calls carry the 'g' flag (Spark's default).
_CANON_SQL = """
        lower(regexp_extract(raw_url, '^([A-Za-z]+)://', 1)) AS scheme,
        CASE
          WHEN lower(regexp_extract(raw_url, '^([A-Za-z]+)://', 1)) = 'http'
          THEN regexp_replace(
                 regexp_replace(
                   lower(regexp_extract(raw_url, '^[A-Za-z]+://([^/?#]*)', 1)),
                   '^www\\.', ''),
                 ':80$', '')
          WHEN lower(regexp_extract(raw_url, '^([A-Za-z]+)://', 1)) = 'https'
          THEN regexp_replace(
                 regexp_replace(
                   lower(regexp_extract(raw_url, '^[A-Za-z]+://([^/?#]*)', 1)),
                   '^www\\.', ''),
                 ':443$', '')
          ELSE regexp_replace(
                 lower(regexp_extract(raw_url, '^[A-Za-z]+://([^/?#]*)', 1)),
                 '^www\\.', '')
        END AS host,
        CASE
          WHEN regexp_replace(regexp_replace(regexp_replace(
                 regexp_extract(raw_url, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1),
                 '/{2,}', '/', 'g'), '/$', ''), '(/index\\.html)+$', '') = ''
          THEN '/'
          ELSE regexp_replace(regexp_replace(regexp_replace(
                 regexp_extract(raw_url, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1),
                 '/{2,}', '/', 'g'), '/$', ''), '(/index\\.html)+$', '')
        END AS path,
        COALESCE(array_to_string(
          list_sort(
            list_filter(
              string_split(regexp_extract(raw_url, '^[^#]*?\\?([^#]*)', 1), '&'),
              p -> p <> ''
                   AND NOT (substr(split_part(p, '=', 1), 1, 4) = 'utm_'
                            OR split_part(p, '=', 1)
                               IN ('gclid', 'fbclid', 'ref', 'mc_eid'))
            )
          ), '&'), '') AS canon_qs
"""


@query(
    "dedup_url_canonical",
    oracle=f"""
    WITH raw AS (
        SELECT event_id, {_SYNTH_SQL} AS raw_url FROM events
    ), parts AS (
        SELECT event_id, raw_url, {_CANON_SQL} FROM raw
    ), canon AS (
        SELECT event_id, raw_url,
               scheme || '://' || host || path
               || CASE WHEN canon_qs = '' THEN '' ELSE '?' || canon_qs END
                   AS canonical_url
        FROM parts
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_variants,
           MIN(event_id) AS first_event_id
    FROM canon
    GROUP BY canonical_url
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize every raw URL spelling, then collapse to one row per
    canonical page: how many events hit it, how many distinct raw
    spellings mapped onto it (the dedup win), and the first event seen
    (the keep-first representative). One projection + one exchange."""
    events = load(spark, sf_dir, "events")
    # The canonicalizer is the rare CPU-dominated projection (a dozen regex
    # passes per row): spread the scan across the session's parallelism
    # before it (no-op at scale — the guard estimates scan splits from
    # source bytes), or a single-row-group fixture runs the whole regex
    # pass on one task (round-13 measurement: 1.9 s -> spread+staged 2.8x).
    base = spread_small_scan(
        events.select("event_id", "user_id", "event_type"),
        sf_dir,
        ("events",),
        "event_id",
    )
    canon = _staged_parts(base.select("event_id", _synth_url().alias("raw_url")))
    return canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("raw_url").alias("n_variants"),
        F.min("event_id").alias("first_event_id"),
    )


@query(
    "url_host_topk",
    oracle=f"""
    WITH raw AS (
        SELECT event_id, {_SYNTH_SQL} AS raw_url FROM events
    ), parts AS (
        SELECT event_id, raw_url, {_CANON_SQL} FROM raw
    ), canon AS (
        SELECT raw_url,
               host,
               scheme || '://' || host || path
               || CASE WHEN canon_qs = '' THEN '' ELSE '?' || canon_qs END
                   AS canonical_url
        FROM parts
    )
    SELECT host, n_events, n_pages FROM (
        SELECT host,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT canonical_url) AS BIGINT) AS n_pages,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, host) AS rn
        FROM canon
        GROUP BY host
    ) WHERE rn <= {TOP_HOSTS}
    """,
)
def url_host_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level crawl census: top-{TOP_HOSTS} canonical hosts by event
    volume (host tiebreak), with the distinct canonical-page count per
    host — the per-domain coverage/budget signal crawl curation runs on.
    The host cardinality is tiny (bounded by the synthesizer's site × tld
    space), so the ranking window runs over a handful of post-agg rows and
    Catalyst lowers the top-k to TakeOrderedAndProject."""
    events = load(spark, sf_dir, "events")
    base = spread_small_scan(
        events.select("event_id", "user_id", "event_type"),
        sf_dir,
        ("events",),
        "event_id",
    )
    canon = _staged_parts(base.select(_synth_url().alias("raw_url"))).select(
        "raw_url", "host", "canonical_url"
    )
    from pyspark.sql import Window

    per_host = canon.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("canonical_url").alias("n_pages"),
    )
    w = Window.orderBy(F.desc("n_events"), F.asc("host"))
    return (
        per_host.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_HOSTS)
        .select("host", "n_events", "n_pages")
    )
