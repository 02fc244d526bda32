"""Corpus-curation operators: PII scrubbing, epoch shuffling, source mixing.

Three more first-class stages of a large-scale training-data pipeline
(SURVEY.md §2.B curation extension), complementing the dedup / sampling /
decontamination / packing families:

- ``pii_scrub`` — keyed pseudonymization of user identifiers plus regex
  redaction of numeric literals in free-form payloads. Pure per-row
  projection: no shuffle at any scale, and the salted-hash pseudonym is
  stable across runs/engines so downstream joins on the pseudonym still
  work (the property naive row-number anonymization lacks).
- ``sample_epoch_shuffle`` — the deterministic global training-order
  shuffle. Deliberately NOT a global ``row_number() OVER (ORDER BY ...)``
  (which Catalyst executes as a single-partition window — a non-starter at
  100 TB). Instead: hash-shard on md5(doc_id, epoch) then order WITHIN each
  shard — one hash exchange, then 8 (→ thousands, at scale) independent
  sorts, which is exactly how epoch shards are written for distributed
  training loaders.
- ``data_mix_weighted`` — weighted source mixing ("data mixture" in
  LLM-corpus terms): per-source repeat factors with a deterministic
  fractional part (md5 bucket), materialized by exploding each document
  ``repeats`` times. The weight table is a broadcast dim join; the explode
  is map-side; the only shuffle is the final per-source count.

All outputs are integer/string columns (dtype-strict hash-safe; see
registry.py contract notes). Reference parity: [TGT] — the reference
(a Kinesis source connector, lib/broadway_kinesis/producer.ex:1-37) has no
curation surface; these extend the engine beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

_DIGITS = "[0-9]+"
_SALT = "salt:"  # keyed pseudonymization salt (fixed for reproducibility)


@query(
    "pii_scrub",
    oracle=f"""
    SELECT event_id,
           md5('{_SALT}' || CAST(user_id AS VARCHAR)) AS user_pseudo,
           regexp_replace(props, '{_DIGITS}', '<NUM>', 'g') AS props_scrubbed,
           len(regexp_extract_all(props, '{_DIGITS}'))::BIGINT AS n_redacted
    FROM events
    WHERE event_id < 1500
    """,
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub identifying data before a corpus leaves the ingest zone:
    ``user_id`` becomes a salted-md5 pseudonym (stable: the same user maps
    to the same pseudonym everywhere, so retention/session analyses still
    join), and every numeric literal in the free-form ``props`` payload is
    redacted, with the redaction count kept for audit. Everything is a
    per-row JVM expression (md5 / regexp_replace / regexp_extract_all):
    zero exchanges, filter pushed to the parquet scan.
    """
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 1500)
    return e.select(
        "event_id",
        F.md5(F.concat(F.lit(_SALT), F.col("user_id").cast("string"))).alias(
            "user_pseudo"
        ),
        F.regexp_replace("props", _DIGITS, "<NUM>").alias("props_scrubbed"),
        F.size(F.expr(f"regexp_extract_all(props, '{_DIGITS}', 0)"))
        .cast("long")
        .alias("n_redacted"),
    )


_EPOCH_KEY_SQL = "md5(CAST(doc_id AS VARCHAR) || ':epoch0')"
_SHARD_SQL = f"('0x' || substr({_EPOCH_KEY_SQL}, 1, 8))::BIGINT % 8"


@query(
    "sample_epoch_shuffle",
    oracle=f"""
    SELECT doc_id,
           {_SHARD_SQL} AS shard_id,
           CAST(ROW_NUMBER() OVER (
                PARTITION BY {_SHARD_SQL}
                ORDER BY {_EPOCH_KEY_SQL}, doc_id) AS BIGINT) AS pos_in_shard
    FROM documents
    """,
)
def sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle, shard-parallel. Each document
    gets an epoch-keyed md5; the top 32 bits pick one of 8 shards and the
    full digest (doc_id tiebreak) orders documents within the shard. The
    plan is one hash exchange + per-shard sort — at cluster scale each
    shard sorts independently (no global ordering bottleneck), and a new
    epoch is just a new salt. Reruns are bit-identical on any engine.
    """
    d = load(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":epoch0")))
    shard = F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % 8
    from pyspark.sql.window import Window

    w = Window.partitionBy("shard_id").orderBy("epoch_key", "doc_id")
    return (
        d.select("doc_id", key.alias("epoch_key"), shard.alias("shard_id"))
        .withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
        .drop("epoch_key")
    )


# Per-source mixture weights, expressed as sixteenths so the fractional
# repeat decision is exact integer math in both engines: repeats =
# w16 // 16 + (u < w16 % 16) with u an md5-derived uniform over [0, 16).
# src0 2x, src1 2.5x (upsampled), src2 0.25x (hard downsample), src3 1.5x,
# everything else 1x.
MIX_W16 = {"src0": 32, "src1": 40, "src2": 4, "src3": 24}
DEFAULT_W16 = 16

_MIX_U_SQL = (
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8))::BIGINT % 16"
)
_MIX_VALUES = ", ".join(f"('{s}', {w})" for s, w in sorted(MIX_W16.items()))


@query(
    "data_mix_weighted",
    oracle=f"""
    WITH w(source, w16) AS (VALUES {_MIX_VALUES}),
    mixed AS (
        SELECT d.source,
               COALESCE(w.w16, {DEFAULT_W16}) AS w16,
               {_MIX_U_SQL} AS u
        FROM documents d LEFT JOIN w ON d.source = w.source
    )
    SELECT source,
           COUNT(*)::BIGINT AS docs_in,
           CAST(SUM(w16 // 16 + CASE WHEN u < w16 % 16 THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_out
    FROM mixed GROUP BY source
    """,
)
def data_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize one epoch of a weighted source mixture: each document is
    repeated ``floor(w)`` times plus one more for a deterministic
    md5-bucket fraction of documents (so a 2.5x source upsamples exactly,
    a 0.25x source downsamples exactly, and the decision is stable under
    corpus growth). The weight table is a 4-row broadcast join; the
    repeat materialization is ``explode(array_repeat(...))`` — map-side,
    no shuffle — and only the per-source audit counts aggregate. The
    oracle validates the exploded cardinality via the closed-form
    SUM(repeats).
    """
    d = load(spark, sf_dir, "documents")
    weights = spark.createDataFrame(
        sorted(MIX_W16.items()), schema="source string, w16 int"
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 16
    )
    base = (
        d.join(F.broadcast(weights), "source", "left")
        .withColumn("w16", F.coalesce(F.col("w16"), F.lit(DEFAULT_W16)).cast("long"))
        .withColumn("u", u)
        .withColumn(
            "repeats",
            F.expr("w16 div 16") + F.when(F.col("u") < F.col("w16") % 16, 1).otherwise(0),
        )
    )
    docs_in = base.groupBy("source").agg(F.count("*").alias("docs_in"))
    exploded = base.select(
        "source", F.explode(F.array_repeat(F.lit(1), F.col("repeats").cast("int"))).alias("_r")
    )
    docs_out = exploded.groupBy("source").agg(F.count("*").alias("docs_out"))
    return docs_in.join(docs_out, "source", "left").select(
        "source",
        "docs_in",
        F.coalesce(F.col("docs_out"), F.lit(0).cast("long")).alias("docs_out"),
    )
