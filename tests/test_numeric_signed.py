"""Signed-sum agreement for the scaled-long money toolkit.

Round-2 ADVICE flagged lsum's docstring-only non-negativity precondition,
on the premise that Spark ``div`` truncates while DuckDB ``//`` floors.
That premise is empirically FALSE: DuckDB's ``//`` on integer operands
(BIGINT and HUGEINT) truncates toward zero exactly like Spark's ``div``
(probe: ``SELECT (-7) // 2`` -> -3, not -4). So negative sums already agree
bitwise, by identical truncation on both sides. These tests replace the
docstring convention with hard evidence: NEGATIVE sums routed through
lsum/sql_lsum come back bitwise-identical from both engines.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from broadway_kinesis_spark.functions.numeric import lsum, sql_lsum

# Values chosen to force every divergence the truncating-div path had:
# negative totals, totals landing exactly on rounding ties, and sub-cent
# residues on both sides of zero.
_CASES = [
    [-0.01, -0.02, -0.005],
    [-123.455],  # tie at scale 2: -123.455 -> -123.45 (half toward +inf)
    [123.455, -246.91],
    [-0.004999, 0.000001],
    [-99999.99, 0.005, -0.005],
    [5.0, -7.77, 2.77],  # sum exactly 0
    [-1e-6],
]


def _duck(values: list[float], scale: int) -> float:
    rows = ", ".join(f"({v!r})" for v in values)
    sql = f"SELECT {sql_lsum('v', 's', scale)} FROM (VALUES {rows}) t(v)"
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchone()[0]
    finally:
        con.close()


@pytest.mark.parametrize("values", _CASES)
@pytest.mark.parametrize("scale", [0, 2, 4])
def test_lsum_signed_matches_duckdb_bitwise(spark, values, scale):
    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = df.agg(lsum("v", "s", scale)).collect()[0]["s"]
    want = _duck(values, scale)
    assert math.copysign(1, got) == math.copysign(1, want) or got == want == 0
    assert got == want, (values, scale, got, want)


@given(
    st.lists(
        st.decimals(
            min_value="-99999.99", max_value="99999.99", places=2, allow_nan=False
        ),
        min_size=1,
        max_size=50,
    ),
    st.sampled_from([0, 2, 4]),
)
@settings(max_examples=300, deadline=None)
def test_round_div_model_is_half_away_rounding(values, scale):
    """Model of _round_div: per-branch non-negative truncating division ==
    round-half-away-from-zero (Decimal HALF_UP) of the scaled sum, any sign.
    Pins |rounded - exact| <= half a unit at ``scale``."""
    s = sum(math.floor(float(v) * 1e6 + 0.5) for v in values)
    q = 10 ** (6 - scale)
    h = q // 2
    rounded = (s + h) // q if s >= 0 else -((-s + h) // q)
    assert abs(rounded * q - s) <= h, (s, scale, rounded)
    import decimal

    want = int(
        (decimal.Decimal(s) / q).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
        )
    )
    assert rounded == want
