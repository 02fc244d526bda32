"""Hermetic tests for the kinesis_efo reader against a fake SDK client —
the SDK-free port of the reference's FakeKinesis server tests (SURVEY.md §5):
offset math, starting positions, shard discovery, retry taxonomy, EOF."""

from __future__ import annotations

from datetime import datetime

import pytest

from broadway_kinesis_spark.sources.kinesis_efo import (
    KinesisEfoStreamReader,
    _call_with_retry,
)


class AwsError(Exception):
    def __init__(self, code, msg="boom"):
        super().__init__(msg)
        self.response = {"Error": {"Code": code, "Message": msg}}


class FakeKinesisClient:
    """In-memory two-shard stream speaking the get_records subset used."""

    def __init__(self, shards: dict[str, list[dict]], fail_first: list[Exception] | None = None):
        self.shards = shards
        self.fail_first = list(fail_first or [])
        self.calls: list[str] = []

    def _maybe_fail(self):
        if self.fail_first:
            raise self.fail_first.pop(0)

    def list_shards(self, **kw):
        self.calls.append("list_shards")
        self._maybe_fail()
        return {"Shards": [{"ShardId": s} for s in self.shards]}

    def get_shard_iterator(self, StreamName, ShardId, ShardIteratorType, **kw):
        self.calls.append(f"get_shard_iterator:{ShardIteratorType}")
        self._maybe_fail()
        recs = self.shards[ShardId]
        if ShardIteratorType == "TRIM_HORIZON":
            idx = 0
        elif ShardIteratorType == "LATEST":
            idx = len(recs)
        elif ShardIteratorType in ("AT_SEQUENCE_NUMBER", "AFTER_SEQUENCE_NUMBER"):
            seq = kw["StartingSequenceNumber"]
            idx = next(i for i, r in enumerate(recs) if r["SequenceNumber"] == seq)
            if ShardIteratorType == "AFTER_SEQUENCE_NUMBER":
                idx += 1
        elif ShardIteratorType == "AT_TIMESTAMP":
            t = kw["Timestamp"]
            idx = next(
                (i for i, r in enumerate(recs) if r["ApproximateArrivalTimestamp"] >= t),
                len(recs),
            )
        return {"ShardIterator": f"{ShardId}:{idx}"}

    def get_records(self, ShardIterator, Limit=10000):
        self.calls.append("get_records")
        self._maybe_fail()
        shard_id, idx = ShardIterator.rsplit(":", 1)
        idx = int(idx)
        recs = self.shards[shard_id]
        out = recs[idx : idx + Limit]
        nxt = idx + len(out)
        closed = self.shards.get(f"{shard_id}__closed") is not None and nxt >= len(recs)
        return {
            "Records": out,
            "NextShardIterator": None if closed else f"{shard_id}:{nxt}",
            "MillisBehindLatest": 0,
        }


def rec(seq, data=b"x", pk="pk", arrival=1000.0):
    return {
        "SequenceNumber": str(seq),
        "PartitionKey": pk,
        "Data": data,
        "ApproximateArrivalTimestamp": arrival,
    }


def make_reader(client, **opts):
    options = {"streamName": "test-stream", "reconnectDelayMs": "1", **opts}
    r = KinesisEfoStreamReader.__new__(KinesisEfoStreamReader)
    KinesisEfoStreamReader.__init__(r, None, options)
    r._client = client
    return r


SHARDS = {
    "shard-0001": [rec(1, b"a", arrival=100.0), rec(2, b"b", arrival=200.0), rec(3, b"c", arrival=300.0)],
    "shard-0002": [rec(10, b"z", arrival=150.0)],
}


def test_initial_offset_enumerates_all_shards():
    r = make_reader(FakeKinesisClient(SHARDS))
    assert r.initialOffset() == {"shard-0001": None, "shard-0002": None}


def test_latest_offset_finds_tip_and_partitions_plan_ranges():
    r = make_reader(FakeKinesisClient(SHARDS), startingPosition="trim_horizon")
    start = r.initialOffset()
    end = r.latestOffset()
    assert end == {"shard-0001": "3", "shard-0002": "10"}
    parts = r.partitions(start, end)
    assert sorted((p.shard_id, p.start_seq, p.end_seq) for p in parts) == [
        ("shard-0001", None, "3"),
        ("shard-0002", None, "10"),
    ]


def test_latest_offset_resumes_after_cursor():
    r = make_reader(FakeKinesisClient(SHARDS), startingPosition="trim_horizon")
    r.partitions({"shard-0001": None}, {"shard-0001": "2", "shard-0002": "10"})
    end = r.latestOffset()
    assert end["shard-0001"] == "3"  # only the tail beyond seq 2
    assert end["shard-0002"] == "10"  # unchanged cursor when no new data


def test_read_yields_envelope_rows_in_range(monkeypatch):
    client = FakeKinesisClient(SHARDS)
    # read() builds a fresh reader (executor-side shape) -> inject at class level
    monkeypatch.setattr(
        KinesisEfoStreamReader, "client_factory", staticmethod(lambda opts: client)
    )
    r = make_reader(client, startingPosition="trim_horizon")
    parts = r.partitions({}, {"shard-0001": "2"})
    rows = list(r.read(parts[0]))
    assert [(x[0], x[3], x[4], x[5]) for x in rows] == [
        ("1", b"a", "shard-0001", "test-stream"),
        ("2", b"b", "shard-0001", "test-stream"),
    ]
    assert rows[0][2] == datetime(1970, 1, 1, 0, 1, 40)  # arrival 100.0 as naive UTC


def test_read_starts_after_previous_cursor(monkeypatch):
    client = FakeKinesisClient(SHARDS)
    monkeypatch.setattr(
        KinesisEfoStreamReader, "client_factory", staticmethod(lambda opts: client)
    )
    r = make_reader(client, startingPosition="trim_horizon")
    parts = r.partitions({}, {"shard-0001": "3"})
    part = parts[0]
    part.start_seq = "1"
    rows = list(r.read(part))
    assert [x[0] for x in rows] == ["2", "3"]
    assert "get_shard_iterator:AFTER_SEQUENCE_NUMBER" in client.calls


def test_starting_position_at_timestamp(monkeypatch):
    client = FakeKinesisClient(SHARDS)
    monkeypatch.setattr(
        KinesisEfoStreamReader, "client_factory", staticmethod(lambda opts: client)
    )
    r = make_reader(client, startingPosition="at_timestamp:150")
    end = r.latestOffset()
    assert end["shard-0001"] == "3"
    rows = list(r.read(r.partitions({}, {"shard-0001": "3"})[0]))
    assert [x[0] for x in rows] == ["2", "3"]  # arrivals >= 150 only


def test_max_records_per_batch_caps_poll():
    r = make_reader(FakeKinesisClient(SHARDS), startingPosition="trim_horizon", maxRecordsPerBatch="1")
    end = r.latestOffset()
    assert end["shard-0001"] == "1"


def test_shard_close_detected():
    shards = dict(SHARDS)
    shards["shard-0001__closed"] = True
    r = make_reader(FakeKinesisClient(shards), startingPosition="trim_horizon")
    records, closed = r._poll("shard-0001", None, 100)
    assert closed is True
    assert [x["SequenceNumber"] for x in records] == ["1", "2", "3"]


def test_retry_transient_then_succeed():
    sleeps = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise AwsError("ProvisionedThroughputExceededException")
        return "ok"

    out = _call_with_retry(flaky, delay_ms=70_000, max_attempts=3, sleep=sleeps.append)
    assert out == "ok"
    assert sleeps == [70.0, 70.0]  # reference's 70 s pacing (producer.ex:37)


def test_fatal_errors_raise_immediately():
    def fatal():
        raise AwsError("ResourceNotFoundException")

    with pytest.raises(AwsError):
        _call_with_retry(fatal, delay_ms=1, max_attempts=5, sleep=lambda s: None)


def test_transient_exhaustion_raises_last_error():
    def always():
        raise AwsError("ResourceInUseException")

    with pytest.raises(AwsError, match="boom"):
        _call_with_retry(always, delay_ms=1, max_attempts=2, sleep=lambda s: None)


def test_unknown_errors_are_fatal():
    def weird():
        raise AwsError("SomethingNovel")

    with pytest.raises(AwsError):
        _call_with_retry(weird, delay_ms=1, max_attempts=5, sleep=lambda s: None)
