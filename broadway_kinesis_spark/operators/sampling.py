"""Stratified deterministic sampling (SURVEY.md §2.B sampling extension).

``sample_hash_split`` (relational.py) gives reproducible train/val/test
splits at a single global rate. Training-data pipelines also need
PER-STRATUM rates — e.g. downsample the dominant language and keep the long
tail at a higher rate so the mixture matches a target distribution
("data mixing" in LLM-corpus terms). ``sample_stratified`` is that operator:
the keep/drop decision is a pure per-row projection of
(md5(doc_id) mod 1000) against a per-lang permille threshold, so it is

- deterministic and engine-independent (same doc always sampled, any engine,
  any cluster size, no RNG seed coordination — md5 is bit-identical across
  Spark / DuckDB / hashlib),
- map-side only at any scale (no shuffle, no state; composes with a
  partitioned write), and
- stable under corpus growth: adding documents never flips the decision for
  existing ones (the property reservoir/Bernoulli RNG sampling lacks).

Reference parity: [TGT] — the reference (a Kinesis source connector) has no
sampling surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

# Target permille kept per language: downsample dominant 'en' hard, keep the
# tail at higher rates (fixture langs: en zh es de fr).
RATES = {"en": 150, "zh": 400, "es": 400, "de": 600, "fr": 600}
DEFAULT_RATE = 300

_SQL_BUCKET = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000"
_SQL_RATE = (
    "CASE lang "
    + " ".join(f"WHEN '{lang}' THEN {r}" for lang, r in sorted(RATES.items()))
    + f" ELSE {DEFAULT_RATE} END"
)


@query(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, lang, bucket FROM (
        SELECT doc_id, lang, {_SQL_BUCKET} AS bucket, {_SQL_RATE} AS rate
        FROM documents
    )
    WHERE bucket < rate
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsampling: keep doc iff
    md5-bucket(doc_id) mod 1000 < rate(lang). Returns the sampled rows
    (doc_id, lang, bucket) — all integer/string columns, hash-exact against
    the identical DuckDB expression. The rate table is a tiny CASE
    expression (broadcast-free constant folding); at 100 TB this is a
    filter pushed into the scan with zero exchanges.
    """
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1000
    )
    rate = F.lit(DEFAULT_RATE)
    for lang, r in sorted(RATES.items()):
        rate = F.when(F.col("lang") == lang, r).otherwise(rate)
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"), rate.alias("rate"))
        .filter(F.col("bucket") < F.col("rate"))
        .drop("rate")
    )


# Fixed-SIZE per-stratum sampling (round 6): rate-based sampling keeps a
# fraction; pipelines also need "exactly K docs per source" (eval panels,
# inspection samples, per-domain quotas). The deterministic reservoir is a
# hash-priority top-k: priority = md5(doc_id || salt) — uniform, engine-
# independent, no RNG state — and the K smallest priorities per stratum
# win. One shuffle (the window partition), mergeable at any scale (top-k
# unions preserve the sample), and adding documents can only displace
# existing picks the way a true reservoir would, never reshuffle them.
K_RESERVOIR = 25
_SQL_PRI = "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':r6'), 1, 15))::BIGINT"


@query(
    "sample_reservoir_group",
    oracle=f"""
    SELECT source, doc_id, CAST(rk AS INT) AS rk FROM (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY {_SQL_PRI}, doc_id) AS rk
        FROM documents
    ) WHERE rk <= {K_RESERVOIR}
    """,
)
def sample_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly {K_RESERVOIR} documents per source, chosen by deterministic
    md5 hash priority (salt ':r6'), ranked 1..K within each stratum."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    pri = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":r6"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("source").orderBy(pri.asc(), F.col("doc_id").asc())
    return (
        docs.select("source", "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K_RESERVOIR)
    )
