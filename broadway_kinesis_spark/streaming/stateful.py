"""Custom stateful streaming operator via ``applyInPandasWithState``.

The engine's escape hatch for stateful semantics Spark's built-ins don't
cover (the Broadway analogue would be a hand-written stateful processor
stage). The worked operator here is a per-key running aggregate with
idle-timeout flush:

- state: (count, sum) per key, persisted in the state store across
  micro-batches (checkpointed with the offsets — restart-safe);
- every batch emits the UPDATED running totals for keys seen in the batch;
- a key idle past the timeout is flushed with ``final=true`` and its state
  dropped — bounding state size the same way a watermark bounds windows.

Scale posture: state is partitioned by the grouping key across executors
(the state store shards with the shuffle), per-key state is O(1), and each
batch touches only keys present in the batch plus expired timers. Arrow
moves the per-key batch rows to Python in one block, not row-at-a-time.

Reference parity: the reference's downstream Broadway processors hold no
state (events flow through, `producer.ex:87`); this is target-surface
([TGT]) machinery for the engine's streaming completeness.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "cnt long, total double"
OUTPUT_SCHEMA = "key long, cnt long, total double, final boolean"


def running_totals(
    events: DataFrame,
    *,
    key_col: str = "uid",
    value_col: str = "value",
    idle_timeout_ms: int = 60_000,
) -> DataFrame:
    """Attach the stateful running-totals operator to a streaming DataFrame.

    ``events`` must be a streaming DataFrame with ``key_col`` (long) and
    ``value_col`` (double). Returns the update stream described in the
    module docstring; write it with ``outputMode("update")`` (or append —
    rows are emitted once per batch either way).
    """
    import pandas as pd

    def update(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        if state.hasTimedOut:
            cnt, total = state.get
            state.remove()
            yield pd.DataFrame(
                {"key": [key[0]], "cnt": [cnt], "total": [total], "final": [True]}
            )
            return
        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((cnt, total))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame({"key": [key[0]], "cnt": [cnt], "total": [total], "final": [False]})

    return (
        events.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
