"""Scalar expression families (SURVEY.md §2.B "Scalar" rows).

Every function here is a JVM-side built-in from ``pyspark.sql.functions``
evaluated inside whole-stage codegen — never a Python UDF. Each family has
one query exercising several functions against the DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.functions.numeric import dround
from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load


@query(
    "scalar_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           LENGTH(c_name) AS name_len,
           CONCAT(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           TRIM(CONCAT('  ', c_name, '  ')) AS name_trimmed,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_digits
    FROM customer
    WHERE c_custkey <= 500
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/lower/substr/length/concat/trim/replace/regexp."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_nationkey").cast("string")).alias("seg_nation"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("name_trimmed"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
    )


@query(
    "scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate) AS order_year,
           MONTH(o_orderdate) AS order_month,
           DAY(o_orderdate) AS order_day,
           DATE_TRUNC('month', o_orderdate) AS month_start,
           DATEDIFF('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_2002,
           CAST(EPOCH(o_orderdate) AS BIGINT) AS unix_secs,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS iso_day
    FROM orders
    WHERE o_custkey <= 100
    """,
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family: year/month/day, date_trunc, datediff, epoch,
    formatting. Session is UTC so epoch/walltime agree with the naive
    oracle timestamps."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_2002"),
        F.unix_timestamp("o_orderdate").alias("unix_secs"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice * (1 + l_tax) AS DECIMAL(38,6)), 2) AS DOUBLE) AS gross,
           CAST(FLOOR(l_quantity / 7) AS BIGINT) AS qty_bucket,
           CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_k,
           ABS(l_discount - 0.05) AS disc_dev,
           ROUND(LN(l_extendedprice), 6) AS ln_price,
           ROUND(SQRT(l_quantity), 6) AS sqrt_qty,
           ROUND(POW(1 + l_discount, 3), 8) AS disc_cubed,
           MOD(l_orderkey, 7) AS key_mod
    FROM lineitem
    WHERE l_orderkey <= 3000
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. Transcendentals (ln/sqrt/pow) are rounded to 6-8 dp:
    JVM vs libm differ by ≤1 ulp and rounding absorbs it."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 3000)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        dround(F.col("l_extendedprice") * (1 + F.col("l_tax")), 2).alias("gross"),
        F.floor(F.col("l_quantity") / 7).alias("qty_bucket"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.pow(1 + F.col("l_discount"), 3), 8).alias("disc_cubed"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label,
           GREATEST(o_totalprice, 100000.0) AS price_floor,
           LEAST(o_totalprice, 400000.0) AS price_cap,
           IF(o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%', 1, 0) AS is_urgentish
    FROM orders
    WHERE o_orderkey <= 5000
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / greatest / least / if."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(price > 300000, "high").when(price > 150000, "mid").otherwise("low").alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias("status_label"),
        F.greatest(price, F.lit(100000.0)).alias("price_floor"),
        F.least(price, F.lit(400000.0)).alias("price_cap"),
        F.when(F.col("o_orderpriority").like("1%") | F.col("o_orderpriority").like("2%"), 1)
        .otherwise(0)
        .alias("is_urgentish"),
    )


@query(
    "scalar_array",
    oracle="""
    SELECT doc_id,
           LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
           STRING_SPLIT(text, ' ')[1] AS first_token,
           LIST_CONTAINS(STRING_SPLIT(text, ' '), 'spark') AS has_spark,
           LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_unique_tokens,
           LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' ')))[1] AS min_token
    FROM documents
    """,
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over tokenized text: size / element_at / contains /
    distinct / sort — all JVM built-ins, no UDF."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.element_at(F.sort_array(F.array_distinct(toks)), 1).alias("min_token"),
    )


@query(
    "scalar_json",
    oracle="""
    SELECT event_id, event_type,
           CAST(props->>'$.k' AS INTEGER) AS prop_k,
           CASE WHEN CAST(props->>'$.k' AS INTEGER) >= 50 THEN 'hi' ELSE 'lo' END AS k_band
    FROM events
    WHERE user_id <= 30
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the `events.props` string column
    (`get_json_object` — schema-on-read, the Spark analogue of the
    reference's decode-then-pattern-match, subscribe_to_shard.ex:343-366)."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") <= 30)
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        "event_type",
        k.alias("prop_k"),
        F.when(k >= 50, "hi").otherwise("lo").alias("k_band"),
    )


@query(
    "scalar_map",
    oracle="""
    SELECT event_id,
           'event_type,user' AS mkeys,
           event_type AS type_val,
           'u' || user_id::VARCHAR AS user_val,
           2 AS msize
    FROM events
    WHERE event_id < 200
    """,
)
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a map column, read it back via map_keys /
    element_at / size. Output stays in portable array/scalar columns (map
    cells themselves hash engine-specifically), so the oracle checks the
    same VALUES the map ops produce."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    m = F.create_map(
        F.lit("event_type"), F.col("event_type"),
        F.lit("user"), F.concat(F.lit("u"), F.col("user_id").cast("string")),
    )
    return e.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("mkeys"),
        F.element_at(m, "event_type").alias("type_val"),
        F.element_at(m, "user").alias("user_val"),
        F.size(m).alias("msize"),
    )
