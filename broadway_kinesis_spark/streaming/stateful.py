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


FUNNEL_STAGES = ("signup", "click", "purchase")
FUNNEL_OUTPUT_SCHEMA = "uid long, stage int, stage_name string, reached_at timestamp"


def funnel_progress_v1(
    events: DataFrame,
    *,
    key_col: str = "uid",
    type_col: str = "etype",
    time_col: str = "ets",
    stages: tuple[str, ...] = FUNNEL_STAGES,
) -> DataFrame:
    """Protobuf-free twin of ``stateful_v2.funnel_progress``: the SAME
    per-user funnel state machine (monotone stage advance, no skipping,
    event-time order within a batch) on ``applyInPandasWithState`` —
    runnable in environments where transformWithState's state-server
    protocol dependency (google.protobuf) is unavailable, like this test
    container. tests/test_stateful.py asserts both implementations emit
    identical progress rows on identical batched input.
    """
    import pandas as pd

    rank = {name: i + 1 for i, name in enumerate(stages)}

    def update(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            return
        stage = state.get[0] if state.exists else 0
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("ets")
        out_stage, out_name, out_ts = [], [], []
        for etype, ets in zip(pdf["etype"], pdf["ets"]):
            nxt = rank.get(etype)
            if nxt is not None and nxt == stage + 1:  # no stage skipping
                stage = nxt
                out_stage.append(stage)
                out_name.append(etype)
                out_ts.append(ets)
        if out_stage:
            state.update((stage,))
            yield pd.DataFrame(
                {
                    "uid": [key[0]] * len(out_stage),
                    "stage": out_stage,
                    "stage_name": out_name,
                    "reached_at": out_ts,
                }
            )

    cols = events.select(
        events[key_col].alias("uid"),
        events[type_col].alias("etype"),
        events[time_col].alias("ets"),
    )
    return cols.groupBy("uid").applyInPandasWithState(
        update,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType="stage int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
