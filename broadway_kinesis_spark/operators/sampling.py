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
