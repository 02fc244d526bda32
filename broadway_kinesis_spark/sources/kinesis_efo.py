"""`kinesis_efo` — AWS Kinesis streaming source (Spark 4 Python DataSource).

The production twin of the replay source: same envelope schema, same
starting-position/offset/EOF semantics, but reading a live Kinesis stream
through the AWS SDK. Feature-parity map to the reference
(mbta/broadway_kinesis), by SURVEY.md §2.A row:

- A1: enhanced-fan-out subscribe — when ``consumerArn`` is set, executors
  consume the planned range over ``subscribe_to_shard``'s HTTP/2 push event
  stream (`subscribe_to_shard.ex:25,87-108`): dedicated 2 MB/s/consumer
  throughput instead of the shared 5-reads/sec GetRecords quota. Without a
  consumer ARN the source falls back to polling ``get_records`` (the same
  envelope rows either way).
- A2: all five starting positions via ``startingPosition`` option
  (``subscribe_to_shard.ex:423-435``).
- A3: event-stream frame decode is SDK-side (botocore's event-stream
  parser), by design.
- A5: message dispatch — SubscribeToShardEvent vs exception events vs
  stream end, mirroring `subscribe_to_shard.ex:329-366`.
- A6: per-shard continuation cursor -> the stream offset is
  ``{shard_id: {"seq": last, "at": first}}``; Spark's offset/commit logs
  replace the manual resume API (A15, ``producer.ex:196-218``). The ``at``
  pin records the CONCRETE first sequence number of each planned range so
  executor reads never re-resolve a floating position (LATEST at task time
  would point at the then-current tip — silent loss on the first batch).
- A7: shard close -> a null ContinuationSequenceNumber / null
  NextShardIterator stops delivery; re-enumeration via ``list_shards``
  picks up children (generalizing the single-shard match, A11,
  ``producer.ex:172-173``).
- A8/A9: re-subscribe — the push stream's server-side 5-minute limit ends
  the event stream without error; the reader re-subscribes AFTER the last
  continuation sequence, or from the ORIGINAL starting position when no
  events arrived yet (`subscribe_to_shard_test.exs:145-166,175-189`).
- A10/A13: error taxonomy + paced retry -> :func:`_is_transient` /
  :func:`_call_with_retry`; AWS-coded transient faults AND 3xx/5xx HTTP
  responses retry after ``reconnectDelayMs`` (default 70000 ms — the
  reference's ``@reconnection_delay``, ``producer.ex:37``, chosen to
  outlast AWS's 5-consumers/shard re-registration window); 4xx AWS-typed
  errors surface by their parsed ``__type`` (fatal unless the type itself
  is transient), mirroring `subscribe_to_shard.ex:250-269`.
- A14: emit-before-fail -> at-least-once via offset replay: a failed batch
  re-reads from the last committed cursor.
- A16: ``maxRecordsPerBatch`` bounds each batch (pull-based pacing the
  push-based reference lacks).

Batch planning strategy (scale posture): ``latestOffset()`` polls each
shard ONCE per planned batch to discover the range end — a pending-plan
cache returns the already-planned end on Spark's extra latestOffset calls
(prefetch, progress reporting) instead of re-polling, so the driver does
exactly one bounded GetRecords pass per shard per batch and idle re-polls
only when nothing was planned. Executors then re-read the concrete
(start/at, end] range — over the EFO pipe when a consumer ARN is given, so
the shared GetRecords quota is spent only on planning while record payload
bandwidth rides the dedicated per-consumer throughput. End discovery
itself must fetch records (Kinesis exposes no payload-free tail probe);
the cache bounds that to once per batch rather than once per trigger.

SDK testing tiers (boto3 ships in this environment as of round 10 — the
earlier "boto3 is NOT bundled" note was environment-stale): both read
paths are unit-tested hermetically against a fake client
(tests/test_kinesis_efo.py — the SDK-free moral equivalent of the
reference's FakeKinesis server tests) AND against the REAL SDK
(tests/test_kinesis_boto3_contract.py): real ``boto3.client("kinesis")``
construction through :func:`_default_client_factory` plus
``botocore.stub.Stubber``-backed request/response handling, where every
stubbed call still runs botocore's real request serialization against
the Kinesis service model — the engine analogue of the reference
exercising the real wire protocol via its FakeKinesis HTTP server
(test/support/fake_kinesis.ex:1-43). The contract file import-pins boto3
(importorskip) so an SDK-less deployment skips it cleanly, and the
factory keeps its clear import-gate error pointing at
``format('kinesis_replay')`` for hermetic runs.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

from broadway_kinesis_spark.streaming.envelope import (
    ENVELOPE_SCHEMA,
    parse_starting_position,
)

#: AWS error codes worth retrying (transport-ish / throttling), vs fatal
#: config errors that must surface immediately — the engine's rendering of
#: the reference's per-error-class cases (`producer.ex:89-133`).
TRANSIENT_ERRORS = frozenset(
    {
        "ProvisionedThroughputExceededException",
        "InternalFailureException",
        "ServiceUnavailable",
        "RequestTimeout",
        "ResourceInUseException",  # consumer re-registering; reference retries this
        "LimitExceededException",
    }
)
FATAL_ERRORS = frozenset(
    {"ResourceNotFoundException", "AccessDeniedException", "InvalidArgumentException"}
)

DEFAULT_RECONNECT_DELAY_MS = 70_000  # producer.ex:37
DEFAULT_MAX_ATTEMPTS = 3


def _default_client_factory(options: dict):
    try:
        import boto3  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover - env has no boto3
        raise ImportError(
            "kinesis_efo requires boto3 (pip install boto3). For hermetic runs "
            "use format('kinesis_replay') — same envelope schema and semantics."
        ) from exc
    kwargs = {}
    if options.get("region"):
        kwargs["region_name"] = options["region"]
    if options.get("endpointurl"):
        kwargs["endpoint_url"] = options["endpointurl"]
    return boto3.client("kinesis", **kwargs)


def _error_code(exc: Exception) -> str | None:
    resp = getattr(exc, "response", None)
    if isinstance(resp, dict):
        code = (resp.get("Error") or {}).get("Code")
        if code:
            return code
    return getattr(exc, "error_code", None)


def _http_status(exc: Exception) -> int | None:
    resp = getattr(exc, "response", None)
    if isinstance(resp, dict):
        status = (resp.get("ResponseMetadata") or {}).get("HTTPStatusCode")
        if status is not None:
            return int(status)
    status = getattr(exc, "status", None)
    return int(status) if status is not None else None


def _is_transient(exc: Exception) -> bool:
    """A10 taxonomy, mirroring `subscribe_to_shard.ex:250-269`:

    - AWS-coded errors classify by code (the parsed ``__type`` of a 4xx);
    - un-coded 3xx (redirect) and 5xx (server) responses are
      transient-with-delay (the reference turns both into ``:http_error``
      and retries on pacing, `producer.ex:107-114`);
    - un-coded 4xx and anything unidentifiable is fatal — surface it.
    """
    code = _error_code(exc)
    if code in TRANSIENT_ERRORS:
        return True
    if code in FATAL_ERRORS:
        return False
    status = _http_status(exc)
    if status is not None and (300 <= status < 400 or status >= 500):
        return True
    return False


def _call_with_retry(fn, *, delay_ms: int, max_attempts: int, sleep=time.sleep):
    """A10/A13: retry transient faults with the reference's fixed delay;
    raise fatal ones immediately (Spark task retry is the outer loop)."""
    last: Exception | None = None
    for attempt in range(max_attempts):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 - classified below
            if not _is_transient(exc):
                raise
            last = exc
            if attempt < max_attempts - 1:
                sleep(delay_ms / 1000.0)
    assert last is not None
    raise last


# -- offset entries --------------------------------------------------------
# Per-shard offset values are {"seq": last_sequence, "at": first_sequence}
# dicts; legacy plain-string entries (just the last sequence) and None
# (unresolved) are accepted on the start side for compatibility.


def _entry_seq(entry) -> str | None:
    if isinstance(entry, dict):
        return entry.get("seq")
    return entry


def _entry_at(entry) -> str | None:
    if isinstance(entry, dict):
        return entry.get("at")
    return None


def _seq_int(seq) -> int | None:
    """Kinesis sequence numbers are decimal strings of a 128-bit counter —
    numerically ordered. None for anything non-numeric (test fakes may use
    arbitrary tokens; ordering guards then downgrade to equality checks)."""
    try:
        return int(seq)
    except (TypeError, ValueError):
        return None


@dataclass
class _ShardRange(InputPartition):
    shard_id: str
    start_seq: str | None  # concrete cursor: read AFTER this sequence
    at_seq: str | None  # pinned first sequence of the range (read AT this)
    end_seq: str
    stream_name: str
    consumer_arn: str | None
    options: dict = field(default_factory=dict)


class KinesisEfoStreamReader(DataSourceStreamReader):
    # test hook: swap for a fake client factory (callable taking options)
    client_factory = staticmethod(_default_client_factory)

    def __init__(self, schema, options):
        # Spark's option pipeline is case-insensitive and hands the Python
        # DataSource lower-cased keys; unit tests pass plain camelCase
        # dicts. Normalize once so both paths (and the executor re-init
        # from partition.options) read the same keys.
        self.options = {str(k).lower(): v for k, v in dict(options).items()}
        options = self.options
        self.stream_name = options.get("streamname")
        if not self.stream_name:
            raise ValueError("kinesis_efo requires .option('streamName', ...)")
        # 'module:callable' dotted path overriding the boto3 client factory.
        # Resolved by IMPORT (not object injection) so it works in the
        # executor-side Python runner process too — read() re-imports it
        # from the partition's options. Used by hermetic end-to-end tests;
        # a production deployment could point it at a custom-configured
        # boto3 session factory the same way.
        factory_path = options.get("clientfactory")
        if factory_path:
            import importlib

            mod_name, fn_name = factory_path.split(":", 1)
            self.client_factory = getattr(importlib.import_module(mod_name), fn_name)
        self.consumer_arn = options.get("consumerarn")
        self.position = parse_starting_position(options.get("startingposition"))
        mrb = options.get("maxrecordsperbatch")
        self.max_per_batch = int(mrb) if mrb else 10_000
        self.delay_ms = int(options.get("reconnectdelayms", DEFAULT_RECONNECT_DELAY_MS))
        self.max_attempts = int(options.get("maxretries", DEFAULT_MAX_ATTEMPTS))
        self._client = None
        self._pending: dict[str, dict] = {}

    # -- SDK plumbing -----------------------------------------------------

    def _cli(self):
        if self._client is None:
            self._client = self.client_factory(self.options)
        return self._client

    def _retry(self, fn):
        return _call_with_retry(fn, delay_ms=self.delay_ms, max_attempts=self.max_attempts)

    def _shard_ids(self) -> list[str]:
        """A11 generalized: ALL shards, not the reference's exactly-one."""
        cli = self._cli()
        shards: list[str] = []
        token = None
        while True:
            kw = {"NextToken": token} if token else {"StreamName": self.stream_name}
            resp = self._retry(lambda kw=kw: cli.list_shards(**kw))
            shards += [s["ShardId"] for s in resp.get("Shards", [])]
            token = resp.get("NextToken")
            if not token:
                return sorted(shards)

    def _position_kwargs(self) -> dict:
        """GetShardIterator kwargs for the configured starting position."""
        pos = self.position
        if pos.kind in ("latest", "trim_horizon"):
            return {"ShardIteratorType": pos.kind.upper()}
        if pos.kind == "at_timestamp":
            return {"ShardIteratorType": "AT_TIMESTAMP", "Timestamp": float(pos.value)}
        return {
            "ShardIteratorType": pos.kind.upper(),
            "StartingSequenceNumber": pos.value,
        }

    def _iterator(self, shard_id: str, *, after_seq: str | None, at_seq: str | None = None):
        cli = self._cli()
        if after_seq is not None:
            kw = {
                "ShardIteratorType": "AFTER_SEQUENCE_NUMBER",
                "StartingSequenceNumber": after_seq,
            }
        elif at_seq is not None:
            kw = {
                "ShardIteratorType": "AT_SEQUENCE_NUMBER",
                "StartingSequenceNumber": at_seq,
            }
        else:
            kw = self._position_kwargs()
        resp = self._retry(
            lambda: cli.get_shard_iterator(
                StreamName=self.stream_name, ShardId=shard_id, **kw
            )
        )
        return resp["ShardIterator"]

    def _poll(
        self,
        shard_id: str,
        after_seq: str | None,
        limit: int,
        at_seq: str | None = None,
        start_iter: str | None = None,
        refresh_at_ts: float | None = None,
    ):
        """Bounded get_records scan; returns (records, shard_closed, next_iter).

        ``start_iter`` continues an existing iterator chain (see
        latestOffset's floating-position handling); an expired iterator is
        re-resolved once — from the concrete cursor when one exists, else
        from ``refresh_at_ts`` (the chain's last poll time) so an expired
        idle chain on a floating position does NOT re-resolve LATEST and
        silently skip records that arrived during the gap.
        """
        cli = self._cli()
        it = start_iter or self._iterator(shard_id, after_seq=after_seq, at_seq=at_seq)
        records: list[dict] = []
        refreshed = False
        while it and len(records) < limit:
            try:
                resp = self._retry(
                    lambda it=it: cli.get_records(
                        ShardIterator=it, Limit=min(limit - len(records), 10_000)
                    )
                )
            except Exception as exc:
                if _error_code(exc) == "ExpiredIteratorException" and not refreshed:
                    refreshed = True
                    if after_seq is None and at_seq is None and refresh_at_ts is not None:
                        it = self._retry(
                            lambda: cli.get_shard_iterator(
                                StreamName=self.stream_name,
                                ShardId=shard_id,
                                ShardIteratorType="AT_TIMESTAMP",
                                Timestamp=refresh_at_ts,
                            )
                        )["ShardIterator"]
                    else:
                        it = self._iterator(shard_id, after_seq=after_seq, at_seq=at_seq)
                    continue
                raise
            records += resp.get("Records", [])
            it = resp.get("NextShardIterator")  # None => shard closed (A7)
            if resp.get("MillisBehindLatest") == 0 and not resp.get("Records"):
                break  # caught up
        return records[:limit], it is None, it

    def _subscribe_position(self, partition: _ShardRange) -> dict:
        """SubscribeToShard StartingPosition for a planned range
        (`subscribe_to_shard.ex:423-435` encoding, as the SDK dict)."""
        if partition.start_seq is not None:
            return {"Type": "AFTER_SEQUENCE_NUMBER", "SequenceNumber": partition.start_seq}
        if partition.at_seq is not None:
            return {"Type": "AT_SEQUENCE_NUMBER", "SequenceNumber": partition.at_seq}
        pos = self.position
        if pos.kind in ("latest", "trim_horizon"):
            return {"Type": pos.kind.upper()}
        if pos.kind == "at_timestamp":
            return {"Type": "AT_TIMESTAMP", "Timestamp": float(pos.value)}
        return {"Type": pos.kind.upper(), "SequenceNumber": pos.value}

    def _subscribe_range(self, partition: _ShardRange) -> list[dict]:
        """A1: consume the planned range over the EFO push event stream.

        Mirrors the reference's streaming loop (`subscribe_to_shard.ex`):
        each SubscribeToShardEvent advances the resume position to
        AFTER its ContinuationSequenceNumber; a null continuation means the
        shard closed (A7); the server ending the stream without error (the
        5-minute subscription limit) triggers a re-subscribe from the last
        continuation — or from the ORIGINAL position if no events arrived
        (`subscribe_to_shard_test.exs:145-189`); exception events classify
        through the A10 taxonomy (transient → paced re-subscribe, fatal →
        raise).
        """
        cli = self._cli()
        original = self._subscribe_position(partition)
        pos = original
        got_event = False
        out: list[dict] = []
        errors = 0
        idle_rounds = 0
        while True:
            resp = self._retry(
                lambda pos=pos: cli.subscribe_to_shard(
                    ConsumerARN=partition.consumer_arn,
                    ShardId=partition.shard_id,
                    StartingPosition=pos,
                )
            )
            progressed = False
            try:
                for event in resp["EventStream"]:
                    ev = event.get("SubscribeToShardEvent")
                    if ev is None:
                        continue  # initial-response etc. (subscribe_to_shard.ex:341)
                    got_event = True
                    progressed = True
                    recs = ev.get("Records", [])
                    out += recs
                    if any(r["SequenceNumber"] == partition.end_seq for r in recs):
                        return out
                    # Overshoot guard: if sequences are numerically PAST the
                    # planned end without ever matching it (record expired /
                    # skipped between planning and a task retry), fail loudly
                    # instead of accumulating the live stream forever.
                    end_i = _seq_int(partition.end_seq)
                    if end_i is not None and any(
                        (_seq_int(r["SequenceNumber"]) or -1) > end_i for r in recs
                    ):
                        raise RuntimeError(
                            f"subscribe_to_shard: stream passed planned end "
                            f"{partition.end_seq!r} on {partition.shard_id} "
                            "without delivering it"
                        )
                    cont = ev.get("ContinuationSequenceNumber")
                    if cont is None:
                        return out  # shard closed mid-range (A7)
                    pos = {"Type": "AFTER_SEQUENCE_NUMBER", "SequenceNumber": cont}
            except Exception as exc:  # exception event mid-stream (A5/A10)
                if not _is_transient(exc):
                    raise
                errors += 1
                if errors >= self.max_attempts:
                    raise
                time.sleep(self.delay_ms / 1000.0)
                continue
            # Stream ended without error (server-side time limit): re-request
            # from the continuation, or the original position if nothing
            # arrived yet. Bound consecutive empty streams so a planning bug
            # can't spin forever against a quiet shard.
            if not got_event:
                pos = original
            idle_rounds = 0 if progressed else idle_rounds + 1
            if idle_rounds >= self.max_attempts:
                raise RuntimeError(
                    f"subscribe_to_shard: planned end {partition.end_seq!r} not "
                    f"reached on {partition.shard_id} after {idle_rounds} empty streams"
                )

    # -- DataSourceStreamReader contract ----------------------------------

    def initialOffset(self) -> dict:
        # Sequence cursors are opaque: the initial offset marks "unresolved";
        # the first planned batch pins each shard to the concrete sequence
        # number of the first record the driver observes (the "at" entry),
        # so even a 'latest' start replays deterministically.
        return {shard: None for shard in self._shard_ids()}

    def latestOffset(self) -> dict:
        base = getattr(self, "_last_end", None) or {}
        pending = getattr(self, "_pending", None) or {}
        live = getattr(self, "_live_iters", None)
        if live is None:
            live = self._live_iters = {}
        out: dict[str, dict | str | None] = {}
        for shard in self._shard_ids():
            if shard in pending:
                # Already planned, not yet consumed by partitions(): return
                # the cached end instead of re-downloading the same range
                # (Spark calls latestOffset more often than it plans).
                out[shard] = pending[shard]
                continue
            cursor_entry = base.get(shard)
            cursor = _entry_seq(cursor_entry)
            # For a shard with no concrete cursor yet, continue the SAME
            # iterator chain across triggers: re-resolving a floating LATEST
            # each trigger would skip every record that arrived in between.
            chain = live.get(shard) if cursor is None else None
            # Timestamp BEFORE the poll: if the idle chain later expires and
            # is re-resolved via AT_TIMESTAMP(ts), a pre-poll ts can only
            # DUPLICATE records that arrived during the poll (fine under
            # at-least-once); a post-poll ts would permanently skip a record
            # that landed between the server-side read point and time.time().
            poll_ts = time.time()
            records, _closed, nxt = self._poll(
                shard,
                cursor,
                self.max_per_batch,
                start_iter=chain["it"] if chain else None,
                refresh_at_ts=chain["ts"] if chain else None,
            )
            if records:
                ent = {
                    "seq": records[-1]["SequenceNumber"],
                    "at": records[0]["SequenceNumber"],
                }
                out[shard] = ent
                self._pending[shard] = ent
                live.pop(shard, None)  # concrete cursor takes over
            else:
                out[shard] = cursor_entry  # unchanged -> no batch for shard
                if cursor is None and nxt is not None:
                    live[shard] = {"it": nxt, "ts": poll_ts}
        return out

    def partitions(self, start: dict, end: dict):
        self._pending = {}
        known = getattr(self, "_last_end", None) or {}
        merged = dict(known)
        parts = []
        for s, e in end.items():
            s_entry = start.get(s)
            s_seq, e_seq = _entry_seq(s_entry), _entry_seq(e)
            if e is not None:
                merged[s] = e
            # Restart guard: a freshly restarted reader has no _last_end, so
            # its first latestOffset may have re-polled from the ORIGINAL
            # starting position and produced an end BEHIND the committed
            # start (Spark plans on offset INEQUALITY, not ordering). Plan
            # nothing for such a shard and re-anchor the cursor to the
            # committed start so the next trigger polls forward from it —
            # no backwards batch, no re-delivery.
            si, ei = _seq_int(s_seq), _seq_int(e_seq)
            if si is not None and ei is not None and ei <= si:
                merged[s] = s_entry
                continue
            if e is None or e_seq == s_seq:
                continue
            parts.append(
                _ShardRange(
                    shard_id=s,
                    start_seq=s_seq,
                    at_seq=_entry_at(e),
                    end_seq=e_seq,
                    stream_name=self.stream_name,
                    consumer_arn=self.consumer_arn,
                    options=self.options,
                )
            )
        self._last_end = merged
        return parts

    def read(self, partition: _ShardRange):
        """Deterministic range re-read on the executor: AFTER start_seq when
        a prior cursor exists, else AT the pinned first sequence — never a
        floating LATEST resolution at task time. EFO push pipe when a
        consumer ARN is configured, get_records otherwise."""
        reader = KinesisEfoStreamReader.__new__(KinesisEfoStreamReader)
        reader.__init__(None, partition.options)
        if partition.consumer_arn:
            records = reader._subscribe_range(partition)
        else:
            records, closed, _it = reader._poll(
                partition.shard_id,
                partition.start_seq,
                reader.max_per_batch,
                at_seq=partition.at_seq,
            )
            if not closed and not any(
                r["SequenceNumber"] == partition.end_seq for r in records
            ):
                # Never silently truncate a planned range: the batch would
                # commit end_seq while the tail was never emitted (lost
                # data). Loud failure -> Spark task retry / surfaced error.
                raise RuntimeError(
                    f"kinesis_efo: planned end {partition.end_seq!r} not reached on "
                    f"{partition.shard_id} ({len(records)} records read)"
                )
        from datetime import datetime, timezone

        for rec in records:
            seq = rec["SequenceNumber"]
            arrival = rec.get("ApproximateArrivalTimestamp")
            if arrival is not None and not isinstance(arrival, (int, float)):
                arrival = arrival.timestamp()
            yield (
                seq,
                rec.get("PartitionKey"),
                (
                    datetime.fromtimestamp(arrival, tz=timezone.utc).replace(tzinfo=None)
                    if arrival is not None
                    else None
                ),
                rec.get("Data"),
                partition.shard_id,
                partition.stream_name,
                None,
            )
            if seq == partition.end_seq:
                break

    def commit(self, end: dict) -> None:
        pass  # Spark's commit log owns the cursor (A15)


class KinesisEfoDataSource(DataSource):
    """``spark.readStream.format("kinesis_efo").option("streamName", ...)``.

    Register with ``spark.dataSource.register(KinesisEfoDataSource)``.
    """

    @classmethod
    def name(cls) -> str:
        return "kinesis_efo"

    def schema(self):
        return ENVELOPE_SCHEMA

    def streamReader(self, schema):
        return KinesisEfoStreamReader(schema, self.options)
