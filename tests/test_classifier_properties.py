"""Cross-engine property fuzz for the frozen quality classifier.

The classifier's oracle contract is BIT-EXACT logits (integer features,
binary-exact weights, pinned associativity — operators/classifier.py).
The driver only ever exercises it on the fixture corpus; this fuzz feeds
RANDOM text — mixed case, digits, repeated tokens, runs of spaces, empty
strings, unicode-ish punctuation — through the full Spark query AND the
full DuckDB oracle over the same parquet, comparing with the harness's
dtype-strict, bitwise-reporting comparator. Any divergence in feature
extraction semantics between the engines (string_split vs split on
multi-space runs, length() on odd codepoints, list_distinct ordering)
surfaces here before the driver could ever see it.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from broadway_kinesis_spark import registry
from tests.oracle_harness import compare

_WORD = st.one_of(
    st.sampled_from(
        ["the", "a", "of", "SPARK", "Table", "42", "x9", "BUY", "", "it"]
    ),
    st.text(
        alphabet="abcDEF019-_.!?",
        min_size=1,
        max_size=6,
    ),
)
_TEXT = st.builds(
    lambda ws, sep: sep.join(ws),
    st.lists(_WORD, min_size=0, max_size=12),
    st.sampled_from([" ", "  ", " "]),
)


@pytest.fixture(scope="module")
def classifier():
    registry.queries()
    return registry.REGISTRY["score_quality_classifier"]


@settings(max_examples=10, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=25))
def test_classifier_bit_exact_on_random_text(spark, tmp_path_factory, classifier, texts):
    td = str(tmp_path_factory.mktemp("clf"))
    pdf_in = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    )
    spark.createDataFrame(pdf_in).write.mode("overwrite").parquet(
        os.path.join(td, "documents.parquet")
    )
    got = classifier.fn(spark, td).toPandas()
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{os.path.join(td, 'documents.parquet')}/*.parquet')"
        )
        want = con.execute(classifier.oracle).df()
    finally:
        con.close()
    compare(got, want, name="score_quality_classifier[fuzz]")
