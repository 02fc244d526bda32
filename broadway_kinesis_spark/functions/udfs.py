"""UDF surface (SURVEY.md §2.B "UDF surface" row): the three extension
points the engine exposes — row-at-a-time Python UDF, Arrow-vectorized
pandas UDF, and a Python UDTF — each registered as a hash-checked query so
the *plumbing* (serialization, Arrow batches, lateral expansion) is under
the same oracle gate as built-ins.

Engine guidance (docstrings are the contract): built-ins first — every
operator family in this engine uses JVM expressions; UDFs exist for logic
Spark genuinely cannot express. When Python is unavoidable, the pandas UDF
is the default (Arrow batch transfer, ~10-100x the row UDF); the row UDF is
the documented slow path. At 100 TB a row UDF in the hot path is a bug.

The examples compute deterministic string/integer results so their DuckDB
oracles match bit-for-bit — proving the UDF path doesn't perturb values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load


@query(
    "udf_python_row",
    oracle="""
    SELECT doc_id, upper(text) || '#' || length(text) AS tagged
    FROM documents WHERE doc_id < 100
    """,
)
def udf_python_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — THE SLOW PATH (one Python roundtrip per
    row); registered to prove the surface works, bounded to 100 rows as a
    worked example of why you wouldn't: the same expression is one line of
    built-ins (see the oracle)."""

    @udf("string")
    def tag(s: str) -> str:
        return f"{s.upper()}#{len(s)}"

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select("doc_id", tag("text").alias("tagged"))


@query(
    "udf_pandas_vectorized",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars,
           len(string_split(lower(text), ' ')) AS n_tokens
    FROM documents
    """,
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pandas UDFs: whole columns cross to Python as Arrow
    arrays and are processed vectorized — the acceptable Python path."""

    @pandas_udf("long")
    def n_chars(s):
        return s.str.len().astype("int64")

    @pandas_udf("long")
    def n_tokens(s):
        return s.str.lower().str.split(" ").str.len().astype("int64")

    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", n_chars("text").alias("n_chars"), n_tokens("text").alias("n_tokens")
    )


@udtf(returnType="idx int, token string")
class _TokenizeUdtf:
    """UDTF: one input row -> N output rows (tokens with positions)."""

    def eval(self, text: str):
        if text is None:
            return
        for i, tok in enumerate(text.lower().split(" ")):
            yield i, tok


@query(
    "udf_table_function",
    oracle="""
    SELECT doc_id,
           (generate_subscripts(words, 1) - 1)::INT AS idx,
           unnest(words) AS token
    FROM (
        SELECT doc_id, string_split(lower(text), ' ') AS words
        FROM documents WHERE doc_id < 50
    )
    """,
)
def udf_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF through a LATERAL join — the user-defined analogue of
    explode/posexplode (which, as the oracle shows, covers this case with
    built-ins; UDTFs are for expansions with real logic)."""
    spark.udtf.register("bks_tokenize", _TokenizeUdtf)
    load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, t.idx, t.token FROM _udtf_docs d, LATERAL bks_tokenize(d.text) t"
    )
