"""Custom stateful streaming operator via ``transformWithStateInPandas``
(Spark 4's typed arbitrary-state API — the successor to
``applyInPandasWithState`` used in stateful.py).

The worked operator is a **per-user funnel state machine**: each user's
furthest funnel stage (signup → click → purchase) persists in a typed
``ValueState`` across micro-batches; whenever a batch advances a user's
stage, one row ``(uid, stage, stage_name, reached_at)`` is emitted. Stages
cannot be skipped — a click before a signup does not advance — so the
emitted stream is each user's monotone funnel progress, computed
incrementally over an unbounded event stream.

Why the new API (vs stateful.py's applyInPandasWithState): named typed
state variables (``getValueState``/``getListState``/``getMapState``) with
per-state TTL instead of one opaque state tuple, explicit timers, and an
``init``/``close`` lifecycle — the shape Spark is converging on for custom
stateful operators.

Scale posture: state is one small tuple per user, sharded with the
grouping shuffle across executors and checkpointed with the offsets
(restart-safe — proven for the state store by
test_streaming_restart.py); each batch touches only users present in the
batch; Arrow moves each user's rows to Python as one block. TTL on the
state variable (optional) bounds state for users that never progress.

Runtime dependency (documented environment cap): Spark's transformWithState
state-server protocol needs ``google.protobuf`` in the Python runtime
(pyspark marks it optional); this container has no protobuf and installs
are not permitted, so the full-engine run of this operator is cluster-only
(the runtime test skips with that reason). The operator is still validated
three ways without it (tests/test_stateful.py): the plan/schema analyzes on
any build; the FunnelProcessor state machine is EXECUTED hermetically
against a key-scoped fake ValueState handle across simulated micro-batches;
and ``stateful.funnel_progress_v1`` — the protobuf-free
``applyInPandasWithState`` twin of this exact state machine — runs through
real MicroBatchExecution and is asserted emission-identical to the
processor on the same batched input.

Reference parity: the reference's Broadway pipeline holds no downstream
state (events flow through, ``lib/broadway_kinesis/producer.ex:87``);
this is [TGT] machinery for the engine's streaming completeness
(SURVEY.md §2.B "Streaming" rows / §8 custom stateful operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

FUNNEL_STAGES = ("signup", "click", "purchase")
OUTPUT_SCHEMA = "uid long, stage int, stage_name string, reached_at timestamp"


class FunnelProcessor(StatefulProcessor):
    """Per-key funnel progression with a single typed ValueState."""

    def __init__(self, stages: tuple[str, ...] = FUNNEL_STAGES, ttl_ms: int | None = None):
        self._stages = stages
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._stage = handle.getValueState("stage", "stage int", self._ttl_ms)

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        stage = self._stage.get()[0] if self._stage.exists() else 0
        rank = {name: i + 1 for i, name in enumerate(self._stages)}
        out_stage, out_name, out_ts = [], [], []
        # Per-key rows arrive as Arrow batches with no intra-batch order
        # guarantee; event-time order decides what "before" means.
        pdf = pd.concat(list(rows), ignore_index=True).sort_values("ets")
        for etype, ets in zip(pdf["etype"], pdf["ets"]):
            nxt = rank.get(etype)
            if nxt is not None and nxt == stage + 1:  # no stage skipping
                stage = nxt
                out_stage.append(stage)
                out_name.append(etype)
                out_ts.append(ets)
        if out_stage:
            self._stage.update((stage,))
            yield pd.DataFrame(
                {
                    "uid": [key[0]] * len(out_stage),
                    "stage": out_stage,
                    "stage_name": out_name,
                    "reached_at": out_ts,
                }
            )

    def close(self) -> None:
        pass


def funnel_progress(
    events: DataFrame,
    *,
    key_col: str = "uid",
    type_col: str = "etype",
    time_col: str = "ets",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Attach the funnel state machine to a streaming DataFrame.

    ``events`` needs ``key_col`` (long), ``type_col`` (string) and
    ``time_col`` (timestamp). Returns the append-mode progress stream
    described in the module docstring.
    """
    cols = events.select(
        events[key_col].alias("uid"),
        events[type_col].alias("etype"),
        events[time_col].alias("ets"),
    )
    return cols.groupBy("uid").transformWithStateInPandas(
        statefulProcessor=FunnelProcessor(ttl_ms=ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
