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
