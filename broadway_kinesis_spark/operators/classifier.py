"""Frozen-weight quality-classifier scoring (VERDICT r4 #7b).

The CCNet/fastText pattern (Wenzek 2020; also the FineWeb-Edu scoring
pass): a tiny linear classifier, trained OFFLINE on labeled good/bad
documents, is frozen and applied to the full corpus as a pure projection.
Training is out of scope by design — at 100 TB the cost that matters is
the scoring pass over every document, and that pass is just feature
extraction + a dot product + a sigmoid, embarrassingly parallel with no
shuffle at all. The pinned weights here stand in for the shipped model
artifact.

Features (per document, all exact integers before the final ratios):
- ``n_tok``   whitespace tokens of lowercased text;
- ``n_stop``  tokens in the pinned stopword list (prose indicator);
- ``n_uniq``  distinct tokens (repetition indicator);
- ``n_digit`` digit characters; ``n_upper`` uppercase characters
  (noise/code/shouting indicators), both over the RAW text.

Exactness: the logit is bit-identical across engines by construction —
integer features, ratios as one IEEE-correctly-rounded division each,
weights chosen binary-exact (6.0, 1.5, -4.0, -2.5, -2.0), and an
explicitly left-associated sum: every step is deterministic correctly-
rounded float algebra, no transcendental involved. ``keep`` gates on the
exact logit (z >= 0). Only the sigmoid probability touches a
transcendental (exp may differ by 1 ULP across libms), so it is emitted
quantized to basis points — the same one-transcendental-then-quantize
pattern as textstats.py's micro-nat log-probs.

Scale posture: stateless projection over the documents scan — whole-stage
codegen, zero exchanges, zero UDFs; the 100 TB cost is exactly one read
of the corpus. Composes with pipeline_quality_funnel as a downstream gate.

Reference parity: [TGT] — no classifier surface in the reference; engine
extension beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from broadway_kinesis_spark.registry import query
from broadway_kinesis_spark.session import load

#: pinned stopword list (prose indicator; lowercase)
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")

#: frozen model — every weight exactly representable in binary floating
#: point so weight*ratio is a single correctly-rounded operation.
BIAS = -2.0
W_STOP = 6.0  # stopword ratio: prose ↑
W_UNIQ = 1.5  # distinct-token ratio: repetition ↓ -> score ↓ via low ratio
W_DIGIT = -4.0  # digit-char ratio: tables/ids/noise ↓
W_UPPER = -2.5  # uppercase-char ratio: shouting/code ↓

PROB_SCALE = 10_000  # sigmoid emitted as basis points


@query(
    "score_quality_classifier",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id,
               CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok,
               CAST(len(list_filter(string_split(lower(text), ' '),
                    t -> t IN {STOPWORDS!r})) AS BIGINT) AS n_stop,
               CAST(len(list_distinct(string_split(lower(text), ' ')))
                    AS BIGINT) AS n_uniq,
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                    AS BIGINT) AS n_digit,
               CAST(length(regexp_replace(text, '[^A-Z]', '', 'g'))
                    AS BIGINT) AS n_upper,
               GREATEST(length(text), 1) AS n_chars_g
        FROM documents
    ), scored AS (
        SELECT doc_id, n_tok, n_stop, n_uniq,
               {BIAS}
               + {W_STOP} * (n_stop / n_tok)
               + {W_UNIQ} * (n_uniq / n_tok)
               + {W_DIGIT} * (n_digit / n_chars_g)
               + {W_UPPER} * (n_upper / n_chars_g) AS logit
        FROM feat
    )
    SELECT doc_id, n_tok, n_stop, n_uniq, logit,
           CAST(ROUND({PROB_SCALE} * (1.0 / (1.0 + EXP(-logit)))) AS BIGINT)
               AS prob_bp,
           logit >= 0.0 AS keep
    FROM scored
    """,
)
def score_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with the frozen linear model and gate at
    logit >= 0. The logit is exact (see module docstring); the sigmoid is
    reported in basis points. Tuple order in the SQL literal above matches
    ``STOPWORDS`` exactly — the f-string interpolates the same pinned
    tuple both sides."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    n_tok = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("long")
    n_uniq = F.size(F.array_distinct(toks)).cast("long")
    n_digit = F.length(F.regexp_replace("text", "[^0-9]", "")).cast("long")
    n_upper = F.length(F.regexp_replace("text", "[^A-Z]", "")).cast("long")
    n_chars_g = F.greatest(F.length("text"), F.lit(1))
    feat = docs.select(
        "doc_id",
        n_tok.alias("n_tok"),
        n_stop.alias("n_stop"),
        n_uniq.alias("n_uniq"),
        n_digit.alias("n_digit"),
        n_upper.alias("n_upper"),
        n_chars_g.alias("n_chars_g"),
    )
    # Left-associated exactly as the oracle writes it: ((((bias + t1) + t2)
    # + t3) + t4) — both engines evaluate the identical IEEE expression
    # tree, so the logit hashes bit-equal.
    logit = (
        F.lit(BIAS)
        + F.lit(W_STOP) * (F.col("n_stop") / F.col("n_tok"))
        + F.lit(W_UNIQ) * (F.col("n_uniq") / F.col("n_tok"))
        + F.lit(W_DIGIT) * (F.col("n_digit") / F.col("n_chars_g"))
        + F.lit(W_UPPER) * (F.col("n_upper") / F.col("n_chars_g"))
    )
    scored = feat.select("doc_id", "n_tok", "n_stop", "n_uniq", logit.alias("logit"))
    prob_bp = F.round(
        F.lit(float(PROB_SCALE)) * (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))))
    ).cast("long")
    return scored.select(
        "doc_id",
        "n_tok",
        "n_stop",
        "n_uniq",
        "logit",
        prob_bp.alias("prob_bp"),
        (F.col("logit") >= 0.0).alias("keep"),
    )
