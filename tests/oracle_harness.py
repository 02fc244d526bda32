"""Local mirror of the driver's DuckDB-differential correctness check.

Runs each registered Spark query and its oracle SQL over the same parquet,
sorts columns by name and rows canonically, then compares cell-by-cell:
exact equality for non-floats, tight relative tolerance for floats — plus a
bitwise-equality report so drift that could flip the driver's value-hash is
visible before the driver sees it.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if not os.path.exists(path):
                continue  # synthetic fixture dirs carry only the tables they need
            if os.path.isdir(path):
                path = os.path.join(path, "*.parquet")  # Spark-written dir table
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        return con.execute(sql).df()
    finally:
        con.close()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (datetime, date, str, int, bytes)):
        return v
    if isinstance(v, float) and math.isnan(v):
        return None
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v


def _sort_key(row):
    def k(v):
        if v is None:
            return ("",)
        if isinstance(v, float):
            return ("f", f"{v:.9e}")
        if isinstance(v, tuple):
            return ("t",) + tuple(k(x) for x in v)
        return (type(v).__name__, str(v))

    return tuple(k(v) for v in row)


def _canon(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in rec) for rec in df[cols].itertuples(index=False, name=None)]
    rows.sort(key=_sort_key)
    return cols, rows


def _cell_close(a, b, rtol):
    if a is None and b is None:
        return True, True
    if a is None or b is None:
        return False, False
    # Dtype drift IS a driver hash mismatch even when values compare equal
    # (int 5 vs float 5.0 hash differently): require matching type category.
    if isinstance(a, bool) != isinstance(b, bool):
        return False, False
    if isinstance(a, float) != isinstance(b, float):
        return False, False
    if isinstance(a, float):
        ok = math.isclose(float(a), float(b), rel_tol=rtol, abs_tol=1e-12)
        return ok, float(a) == float(b)
    if isinstance(a, tuple) and isinstance(b, tuple):
        if len(a) != len(b):
            return False, False
        oks, bits = zip(*(_cell_close(x, y, rtol) for x, y in zip(a, b)), strict=False) if a else ((True,), (True,))
        return all(oks), all(bits)
    if isinstance(a, datetime) != isinstance(b, datetime):
        return False, False
    return a == b, a == b


def _col_kinds(df: pd.DataFrame) -> list[str]:
    """Canonical per-column dtype kind, unsigned folded into signed."""
    return [{"u": "i"}.get(df[c].dtype.kind, df[c].dtype.kind) for c in sorted(df.columns)]


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, rtol: float = 1e-9, name: str = "?") -> None:
    s_cols, s_rows = _canon(spark_pdf)
    o_cols, o_rows = _canon(oracle_pdf)
    assert s_cols == o_cols, f"{name}: column names differ: spark={s_cols} oracle={o_cols}"
    s_kinds, o_kinds = _col_kinds(spark_pdf), _col_kinds(oracle_pdf)
    assert s_kinds == o_kinds, (
        f"{name}: column dtype kinds differ (driver hash would mismatch): "
        f"spark={dict(zip(s_cols, s_kinds))} oracle={dict(zip(o_cols, o_kinds))}"
    )
    assert len(s_rows) == len(o_rows), f"{name}: row count differs: spark={len(s_rows)} oracle={len(o_rows)}"
    inexact = 0
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows, strict=True)):
        for c, (sv, ov) in enumerate(zip(sr, orow, strict=True)):
            ok, bitwise = _cell_close(sv, ov, rtol)
            assert ok, f"{name}: row {i} col {s_cols[c]}: spark={sv!r} oracle={ov!r}"
            if not bitwise:
                inexact += 1
    if inexact:
        print(f"[oracle-diff] {name}: {inexact} float cells matched within rtol but NOT bitwise — hash risk")
