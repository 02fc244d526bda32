"""Physical-plan audits: make "is this the plan you'd want at 100 TB?" a
TESTED property instead of a one-off eyeball of ``.explain()``.

Catalyst's wins (predicate pushdown, column pruning, broadcast selection,
whole-stage codegen) are free ONLY if the query is expressed so the
optimizer can apply them — a stray UDF or a non-pushable cast silently
turns a 2-column pruned scan into a full-width one. These helpers parse
``df.explain("formatted")`` output so tests/test_plans.py can pin the
properties the engine's scale posture depends on:

- filters reach the parquet scan (``PushedFilters: [...]``);
- scans read only the referenced columns (``ReadSchema``);
- dimension joins broadcast (``BroadcastHashJoin``), fact sides don't
  shuffle for them;
- expression pipelines stay inside WholeStageCodegen spans;
- shuffle (Exchange) counts match the minimum the algorithm needs.

The reference has no optimizer to audit (SURVEY.md §4.1); this module is
the engine-side discipline replacing it.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all scans (empty brackets excluded)."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.append(body)
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists each scan actually reads (column-pruning evidence)."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin", formatted_plan(df)))


def shuffle_count(df: DataFrame) -> int:
    """Exchange operators in the main physical plan (AQE may still remove
    some at runtime — this is the static plan's worst case)."""
    main = formatted_plan(df).split("===== Subqueries =====")[0]
    return len(re.findall(r"\(\d+\) Exchange", main))


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans. Formatted explain marks member
    operators with `[codegen id : N]` (simple mode shows WholeStageCodegen
    nodes instead); AQE plans hide both until executed — audit with AQE off."""
    plan = formatted_plan(df)
    return len(
        set(re.findall(r"\[codegen id : (\d+)\]", plan))
        | set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    )


def _top_level_bracket_group_bodies(line: str) -> list[str]:
    """Bodies of top-level ``[...]`` groups in a formatted-plan line."""
    bodies: list[str] = []
    depth = 0
    start = 0
    for i, ch in enumerate(line):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                bodies.append(line[start:i])
            depth = max(0, depth)
    return bodies


def unpartitioned_window_count(plan_or_df) -> int:
    """Number of ``Window`` physical nodes with NO partition spec.

    A global window moves every row to one partition ("No Partition Defined
    for Window operation" at runtime) — the classic silent scale-killer. In
    ``explain("formatted")`` a Window node's Arguments line carries
    ``[exprs], [part], [order]`` when partitioned+ordered, ``[exprs], [part]``
    when partitioned-unordered, ``[exprs], [order]`` when GLOBAL-ordered, and
    ``[exprs]`` alone when global-unordered. With two groups the cases are
    disambiguated by sort-direction tokens (`` ASC``/`` DESC``), which a
    partition-column list never carries. Bounded global uses (row_number<=K
    over an aggregate, cumsum over summary-sized input) must be whitelisted
    by the sweep, not silently allowed.
    """
    plan = plan_or_df if isinstance(plan_or_df, str) else formatted_plan(plan_or_df)
    count = 0
    # Plain Window nodes only: WindowGroupLimit's Arguments are
    # [part], [order], fn, k, mode (2 groups even when partitioned), and a
    # GLOBAL group-limit lowers to TakeOrderedAndProject, never reaching here.
    for m in re.finditer(r"\(\d+\) Window *\n(?:[^\n]+\n)*?Arguments: ([^\n]*)", plan):
        groups = _top_level_bracket_group_bodies(m.group(1))
        if len(groups) >= 3:
            continue  # [exprs], [part], [order]
        if len(groups) == 2 and not re.search(r" (?:ASC|DESC)\b", groups[1]):
            continue  # [exprs], [part] — partitioned, unordered frame
        count += 1
    return count


def assert_plan(
    df: DataFrame,
    *,
    pushed: list[str] | None = None,
    max_read_cols: dict[str, int] | None = None,
    min_broadcast_joins: int = 0,
    forbid: list[str] | None = None,
    name: str = "?",
) -> None:
    """Assert scale-critical plan properties; raises AssertionError with the
    full formatted plan on failure so the fix is one read away."""
    plan = formatted_plan(df)
    for frag in pushed or []:
        assert re.search(rf"PushedFilters: \[[^\]]*{re.escape(frag)}", plan), (
            f"{name}: expected filter {frag!r} pushed to a scan\n{plan}"
        )
    if min_broadcast_joins:
        got = len(re.findall(r"BroadcastHashJoin", plan))
        assert got >= min_broadcast_joins, (
            f"{name}: expected >= {min_broadcast_joins} broadcast joins, got {got}\n{plan}"
        )
    for op in forbid or []:
        assert op not in plan, f"{name}: plan contains forbidden operator {op}\n{plan}"
    if max_read_cols:
        # Each parquet scan block carries Location: .../<table>.parquet and,
        # a few lines later, its ReadSchema.
        scans: dict[str, int] = {}
        for m in re.finditer(r"Location:[^\n]*?(\w+)\.parquet", plan):
            sm = re.search(r"ReadSchema: struct<([^>]*)>", plan[m.end() :])
            if sm:
                n_cols = len([c for c in sm.group(1).split(",") if c.strip()])
                scans[m.group(1)] = max(scans.get(m.group(1), 0), n_cols)
        for table, limit in max_read_cols.items():
            got = scans.get(table)
            assert got is not None, f"{name}: no scan of {table} found\n{plan}"
            assert got <= limit, (
                f"{name}: scan of {table} reads {got} columns, expected <= {limit} "
                f"(column pruning regressed)\n{plan}"
            )
