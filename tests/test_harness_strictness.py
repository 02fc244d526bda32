"""The local harness must reject everything the driver's value-hash rejects.

Round-1 postmortem: three queries passed the local float-tolerant compare but
hash-failed at the driver because only the DTYPE differed (int64 5 vs float64
5.0). These plants pin the strictness fix — pure pandas, no Spark session.
"""

import pandas as pd
import pytest

from oracle_harness import compare


def test_int_vs_float_column_plant_fails():
    spark_pdf = pd.DataFrame({"k": ["a", "b"], "v": [5, 7]})            # int64
    oracle_pdf = pd.DataFrame({"k": ["a", "b"], "v": [5.0, 7.0]})       # float64
    with pytest.raises(AssertionError, match="dtype"):
        compare(spark_pdf, oracle_pdf, name="plant")


def test_bool_vs_int_plant_fails():
    spark_pdf = pd.DataFrame({"v": [True, False]})
    oracle_pdf = pd.DataFrame({"v": [1, 0]})
    with pytest.raises(AssertionError):
        compare(spark_pdf, oracle_pdf, name="plant")


def test_matching_dtypes_pass():
    a = pd.DataFrame({"k": ["a", "b"], "v": [5, 7], "f": [1.5, 2.5]})
    b = pd.DataFrame({"k": ["b", "a"], "v": [7, 5], "f": [2.5, 1.5]})
    compare(a, b, name="ok")  # row order is canonicalized away


def test_null_vs_value_fails():
    a = pd.DataFrame({"v": [1.0, None]})
    b = pd.DataFrame({"v": [1.0, 2.0]})
    with pytest.raises(AssertionError):
        compare(a, b, name="plant")
