"""`kinesis_replay` — file-drop replay streaming source (hermetic twin of the
Kinesis EFO source; the engine's FakeKinesis, SURVEY.md §5).

Layout: a directory with one JSONL file per shard (``<shard_id>.jsonl``).
Each line is one SubscribeToShardEvent in the exact JSON shapes the
reference's test server encodes (FIXTURES.md §A / `fake_kinesis.ex:28-42`):

    {"ContinuationSequenceNumber": "2",
     "Records": [{"Data": "<base64>", "SequenceNumber": "2",
                  "PartitionKey": "pk", "ApproximateArrivalTimestamp": 1.7e9}],
     "MillisBehindLatest": 0}
    {"ContinuationSequenceNumber": null}        # shard-close sentinel

Semantics carried over from the reference, re-expressed on Spark's
pull-based micro-batch offset contract:

- **Offsets (A6)**: the checkpoint cursor advances per event; here the
  offset is ``{shard_id: next_line_index}`` — written to Spark's offset log
  per batch, committed after the sink succeeds (at-least-once, A14), so a
  restart replays exactly the uncommitted tail (A15: `startingPosition`
  seeds only the FIRST run; afterwards the checkpoint owns the cursor).
- **Starting positions (A2)**: all five variants resolve to a line index in
  ``initialOffset()`` (`at_sequence_number` matches the line's
  ContinuationSequenceNumber; `at_timestamp` the first event whose records
  arrive at/after the given unix time).
- **Shard close / EOF (A7)**: a null ContinuationSequenceNumber stops the
  cursor before the sentinel; the shard simply yields no further rows
  (the reference crashes-and-logs `:closed`; the engine degrades gracefully
  and `closed_shards()` reports which shards hit EOF).
- **Bounded batches (A16 — an improvement the reference lacks)**: option
  ``maxRecordsPerBatch`` caps each shard's per-batch advance, replacing the
  reference's unbounded push mailbox with pull-based pacing.
- **Multi-shard (A11 generalized)**: one input partition per shard per
  batch — the reference's single-shard limitation (`producer.ex:172-173`)
  becomes the partition axis Spark parallelizes over.

Re-subscribe / reconnect (A8/A9/A13) need no state here: each ``read()``
opens the file fresh, the micro-batch model's equivalent of issuing a new
subscribe call per batch; transient read errors surface to Spark's task
retry (`spark.task.maxFailures`), the engine's outer retry loop.

Options: ``path`` (required), ``startingPosition`` (default latest),
``streamName`` (default: directory name), ``maxRecordsPerBatch``.
"""

from __future__ import annotations

import base64
import json
import os
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

from broadway_kinesis_spark.streaming.envelope import (
    ENVELOPE_SCHEMA,
    parse_starting_position,
)


def _shard_files(path: str) -> dict[str, str]:
    return {
        fn[: -len(".jsonl")]: os.path.join(path, fn)
        for fn in sorted(os.listdir(path))
        if fn.endswith(".jsonl")
    }


def _scan(file_path: str) -> list[dict]:
    with open(file_path, encoding="utf-8") as f:
        return [json.loads(line) for line in f if line.strip()]


class KinesisReplayException(RuntimeError):
    """Typed stream exception — replay twin of the reference's
    `:message-type "exception"` dispatch (`subscribe_to_shard.ex:329-337`):
    the exception type rides in a header, the message in the body."""

    def __init__(self, exception_type: str, message: str):
        super().__init__(f"{exception_type}: {message}")
        self.exception_type = exception_type


def _open_events(events: list[dict]) -> list[dict]:
    """Events before the shard-close sentinel (null continuation = EOF, A7).

    Exception events ({"ExceptionType": ..., "message": ...}) stay in the
    stream — they surface when read() crosses them, not during offset
    resolution — and do not terminate the scan the way a close sentinel does.
    """
    out = []
    for ev in events:
        if "ExceptionType" not in ev and ev.get("ContinuationSequenceNumber") is None:
            break
        out.append(ev)
    return out


@dataclass
class _ShardSlice(InputPartition):
    shard_id: str
    file_path: str
    start: int
    end: int
    stream_name: str


class ReplayStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kinesis_replay requires .option('path', <dir>)")
        self.stream_name = options.get("streamName") or os.path.basename(
            self.path.rstrip("/")
        )
        self.position = parse_starting_position(options.get("startingPosition"))
        mrb = options.get("maxRecordsPerBatch")
        self.max_per_batch = int(mrb) if mrb else None

    # -- offset resolution ------------------------------------------------

    def _resolve_start(self, events: list[dict]) -> int:
        pos = self.position
        if pos.kind == "trim_horizon":
            return 0
        if pos.kind == "latest":
            return len(events)
        if pos.kind in ("at_sequence_number", "after_sequence_number"):
            for i, ev in enumerate(events):
                if str(ev.get("ContinuationSequenceNumber")) == pos.value:
                    return i if pos.kind == "at_sequence_number" else i + 1
            raise ValueError(
                f"sequence number {pos.value!r} not found in shard "
                f"(replay twin of AWS's invalid-position error)"
            )
        # at_timestamp: first event with any record arriving at/after T
        t = float(pos.value)
        for i, ev in enumerate(events):
            arrivals = [
                r.get("ApproximateArrivalTimestamp")
                for r in ev.get("Records", [])
                if r.get("ApproximateArrivalTimestamp") is not None
            ]
            if arrivals and max(arrivals) >= t:
                return i
        return len(events)

    def initialOffset(self) -> dict:
        return {
            shard: self._resolve_start(_open_events(_scan(fp)))
            for shard, fp in _shard_files(self.path).items()
        }

    def latestOffset(self) -> dict:
        # Pacing base = the furthest position we know was reached. Spark may
        # call latestOffset BEFORE initialOffset (offset prefetch), so an
        # unknown base falls back to the resolved starting position — never
        # to "everything", which would blow the cap on batch one and (since
        # MicroBatchExecution triggers on offset INEQUALITY) could plan a
        # backwards batch and re-deliver rows. Restart caveat: the base
        # resets to the starting position, so with pacing enabled the first
        # post-restart batches may lag (and replay) until the base catches
        # the checkpoint — at-least-once holds; leave maxRecordsPerBatch
        # unset if the sink cannot tolerate replays across restarts.
        # NOTE: the base is advanced ONLY in partitions() (when a batch is
        # actually planned) — Spark calls latestOffset more often than it
        # plans batches (offset prefetch at start, idle polls), and advancing
        # per call would let one batch span several caps' worth of events.
        out = {}
        base = getattr(self, "_last_end", None)
        for shard, fp in _shard_files(self.path).items():
            events = _open_events(_scan(fp))
            n = len(events)
            if self.max_per_batch is not None:
                at = base.get(shard) if base else None
                if at is None:
                    at = self._resolve_start(events)
                n = min(n, at + self.max_per_batch)
            if base and shard in base:
                n = max(n, base[shard])
            out[shard] = n
        return out

    def partitions(self, start: dict, end: dict):
        files = _shard_files(self.path)
        # Learn true batch bounds (covers checkpoint restarts, where the
        # engine replans from the offset log without calling initialOffset).
        known = getattr(self, "_last_end", None) or {}
        self._last_end = {
            s: max(known.get(s, 0), start.get(s, 0), end.get(s, 0)) for s in set(known) | set(end)
        }
        parts = [
            _ShardSlice(shard, files[shard], start.get(shard, 0), end[shard], self.stream_name)
            for shard in end
            if shard in files and end[shard] > start.get(shard, 0)
        ]
        return parts

    def read(self, partition: _ShardSlice):
        events = _open_events(_scan(partition.file_path))
        for ev in events[partition.start : partition.end]:
            if "ExceptionType" in ev:
                # A5/A10: typed stream exception -> raise; Spark's task retry
                # and query restart are the engine's retry loop. A replay
                # fixture's exception is persistent by construction, so the
                # query fails deterministically — that's the point (tests
                # the error path); the live source classifies and retries
                # transient errors instead (kinesis_efo._call_with_retry).
                raise KinesisReplayException(
                    ev["ExceptionType"], ev.get("message", "")
                )
            csn = ev.get("ContinuationSequenceNumber")
            millis = ev.get("MillisBehindLatest")
            for rec in ev.get("Records", []):
                data = rec.get("Data")
                arrival = rec.get("ApproximateArrivalTimestamp")
                yield (
                    str(rec.get("SequenceNumber", csn)),
                    rec.get("PartitionKey"),
                    (
                        datetime.fromtimestamp(arrival, tz=timezone.utc).replace(tzinfo=None)
                        if arrival is not None
                        else None
                    ),
                    base64.b64decode(data) if data is not None else None,
                    partition.shard_id,
                    partition.stream_name,
                    int(millis) if millis is not None else None,
                )

    def commit(self, end: dict) -> None:
        # Offsets live in Spark's checkpoint (offset log + commit log); the
        # replay files need no server-side ack — parity with A15 where the
        # checkpoint, not the source, owns the resume position.
        pass


class ReplayDataSource(DataSource):
    """``spark.readStream.format("kinesis_replay").option("path", dir)``.

    Register once per session:
    ``spark.dataSource.register(ReplayDataSource)``.
    """

    @classmethod
    def name(cls) -> str:
        return "kinesis_replay"

    def schema(self):
        return ENVELOPE_SCHEMA

    def streamReader(self, schema):
        return ReplayStreamReader(schema, self.options)


def closed_shards(path: str) -> list[str]:
    """Shards whose stream hit the close sentinel (split/merge EOF, A7)."""
    out = []
    for shard, fp in _shard_files(path).items():
        events = _scan(fp)
        # Exception events carry no ContinuationSequenceNumber either —
        # only a non-exception event with a null continuation is the
        # split/merge EOF sentinel (mirrors _open_events' exclusion).
        if any(
            "ExceptionType" not in ev and ev.get("ContinuationSequenceNumber") is None
            for ev in events
        ):
            out.append(shard)
    return sorted(out)
