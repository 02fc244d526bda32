"""Numerically stable aggregate helpers shared by Spark plans and oracle SQL.

Floating-point sums are order-dependent: Spark's partial aggregation merges
partitions in a nondeterministic order, DuckDB accumulates in yet another
order, so ``SUM(double)`` differs between the two engines in the last ULPs —
enough to flip an exact value-hash. The fix used across this engine: cast
each row to a fixed-scale decimal *before* aggregating. Decimal addition is
exact and associative, so the sum is bit-identical regardless of plan shape,
partition count, or engine; casting the exact decimal result back to double
is deterministic.

Scale choice matters: money-like inputs carry ≤2 decimal digits, so 2-3-term
products carry ≤6 — at scale ≤6 those values sit *exactly on* rounding ties,
and Spark (exact BigDecimal HALF_UP) vs DuckDB (double-multiply then round)
resolve ties from opposite sides of the double error. At scale 8 every such
product is exactly representable, no ties exist, and both engines round every
input identically (verified empirically: scale 4 flipped ~50/10k rows of
``sum(price*(1-disc)*(1+tax))``; scale 8 is bit-exact).

This also future-proofs correctness at scale: at 100 TB the partial-agg tree
is thousands of merges deep and a raw double sum would drift run-to-run;
decimal-stabilized sums stay reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 8 keeps 38-8=30 integer digits of headroom — enough for a 100 TB
# sum of 1e5-magnitude values over 1e12 rows (1e17 << 1e30).
_SCALE = 8
_DEC = f"decimal(38,{_SCALE})"


# Exact decimal sums still differ from the oracle after the final
# decimal→double cast when the unscaled int128 exceeds 2^53 (DuckDB converts
# via double(int128) then divides — two roundings; Spark/Java divides the
# exact unscaled value — one). Rounding the decimal to a coarse scale FIRST
# keeps the unscaled value under 2^53 for any sane magnitude, making the
# double conversion exact integer/power-of-ten division in both engines.
_OUT_SCALE = 2  # sums: cents granularity
_AVG_SCALE = 4  # numerator of averages


def dsum(col: Column, alias: str) -> Column:
    """Order-independent SUM over doubles, surfaced as DOUBLE."""
    return F.round(F.sum(col.cast(_DEC)), _OUT_SCALE).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided in double."""
    num = F.round(F.sum(col.cast(_DEC)), _AVG_SCALE).cast("double")
    return (num / F.count(F.lit(1))).alias(alias)


def dround(col: Column, scale: int = 2) -> Column:
    """Engine-portable ROUND for money-like doubles.

    ``ROUND(double, 2)`` itself diverges between engines on 3-4-decimal
    inputs: Spark rounds the *shortest decimal representation* (36324.145 →
    .15 via BigDecimal.valueOf) while DuckDB rounds the *binary value*
    (36324.14499… → .14). Casting to a scale-6 decimal first recovers the
    exact decimal value in both engines (tie-free, per the module note),
    and decimal-domain rounding (HALF_UP vs half-away — identical for
    positives, and on exact ties) then agrees everywhere.
    """
    return F.round(col.cast("decimal(38,6)"), scale).cast("double")


def sql_dround(expr: str, scale: int = 2) -> str:
    """Oracle-SQL twin of :func:`dround` (DuckDB)."""
    return f"CAST(ROUND(CAST({expr} AS DECIMAL(38,6)), {scale}) AS DOUBLE)"


def sql_dsum(expr: str, alias: str) -> str:
    """Oracle-SQL twin of :func:`dsum` (DuckDB)."""
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(38,{_SCALE}))), {_OUT_SCALE}) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """Oracle-SQL twin of :func:`davg` (DuckDB)."""
    return (
        f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(38,{_SCALE}))), {_AVG_SCALE}) AS DOUBLE) / COUNT(*) AS {alias}"
    )


# -- scaled-integer money sums (the fast exact path) -----------------------
#
# For money-like columns whose values carry <= 6 decimal digits (prices,
# 2-decimal rates, and their 2-3-term products), the sum can stay in LONG:
# scale each row to an exact integer of 1e-6 units (the double error after
# *1e6 is ~1e-5 of a unit, far below the 0.5 rounding threshold, so
# floor(x*1e6 + 0.5) recovers the true scaled integer in both engines from
# the bit-identical double), then SUM the longs — a whole-stage-codegen
# primitive sum, measured ~3x faster than the decimal(38,8) path and just
# as order-independent since integer addition is exact.
#
# Range analysis: long holds +/-9.2e18 scaled units = 9.2e12 whole units
# per aggregation group. A TPC-H-shaped revenue group crosses that around
# sf~10000 (~10 TB per group); beyond it, use dsum() — same semantics,
# decimal accumulator, no overflow until 1e30. The engine keeps both and
# callers choose by the group-cardinality/magnitude bound they can prove.
# (Spark's non-ANSI long sum wraps silently on overflow — do NOT use lsum
# past the proven bound.)

_LS = 1_000_000  # 1e-6 units: exact for <=6-decimal money values


def lscale(col: Column) -> Column:
    """Exact scaled-integer of a <=6-decimal double (1e-6 units)."""
    return F.floor(col * float(_LS) + F.lit(0.5)).cast("long")


def sql_lscale(expr: str) -> str:
    """DuckDB twin of :func:`lscale`."""
    return f"CAST(FLOOR(({expr}) * 1000000.0 + 0.5) AS BIGINT)"


def _round_div(expr: str, scale: int, div_op: str) -> str:
    """Shared SQL shape: round-half-away-from-zero division of a scaled-long
    sum by ``10^(6-scale)``, valid for ANY sign.

    Each CASE branch feeds the integer division a NON-NEGATIVE operand, where
    Spark's truncating ``div`` and DuckDB's truncating ``//`` (both verified
    truncate-toward-zero on BIGINT/HUGEINT — tests/test_numeric_signed.py)
    coincide with flooring — so the two engines agree bitwise by
    construction. The naive ``(s + q/2) div q`` is NOT a rounding for
    negative sums (off by up to ~1.5 units: -123.455 -> -122); this is.
    """
    q = 10 ** (6 - scale)
    h = q // 2
    e = f"({expr})"
    return (
        f"(case when {e} >= 0 then ({e} + {h}) {div_op} {q}"
        f" else -((-{e} + {h}) {div_op} {q}) end)"
    )


def lsum_round(sum_col: str, scale: int) -> Column:
    """ROUND(scaled-long sum, ``scale``) surfaced as DOUBLE.

    Integer-rounds the 1e-6-unit sum to ``scale`` decimals — sign-safe
    round-half-away-from-zero (Decimal HALF_UP semantics) via
    :func:`_round_div` — keeping the value <= 2^53 before the double cast so
    the conversion is exact in both engines.
    """
    return F.expr(_round_div(sum_col, scale, "div")).cast("double") / float(
        10**scale
    )


def sql_lsum_round(sum_expr: str, scale: int) -> str:
    """DuckDB twin of :func:`lsum_round`."""
    return f"CAST({_round_div(sum_expr, scale, '//')} AS DOUBLE) / {float(10 ** scale)}"


def lsum(expr_sql: str, alias: str, scale: int = 2) -> Column:
    """One-expression scaled-long SUM for ≤6-decimal money columns,
    surfaced as DOUBLE rounded to ``scale`` decimals — the drop-in fast twin
    of :func:`dsum` (see range analysis above). Sign-safe by construction:
    rounding goes through :func:`_round_div` (round-half-away-from-zero with
    non-negative division operands), so negative sums are both semantically
    rounded AND bitwise engine-identical — the former docstring-only
    non-negativity precondition is gone (tests/test_numeric_signed.py).

    ``expr_sql`` is a Spark-SQL scalar expression (same string works in the
    oracle through :func:`sql_lsum`).
    """
    scaled = f"sum(cast(floor(({expr_sql}) * 1000000.0 + 0.5) as bigint))"
    return (
        F.expr(_round_div(scaled, scale, "div")).cast("double") / float(10**scale)
    ).alias(alias)


def sql_lsum(expr: str, alias: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`lsum`."""
    return (
        f"CAST({_round_div(f'SUM({sql_lscale(expr)})', scale, '//')} AS DOUBLE)"
        f" / {float(10 ** scale)} AS {alias}"
    )
