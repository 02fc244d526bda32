#!/usr/bin/env python
"""Convert the `events` fixture table into kinesis_replay shard files.

Writes N shard JSONL files (hash-partitioned by user_id — Kinesis partition
keys map to shards the same way) with one SubscribeToShardEvent per event
row, ordered by (ts, event_id) within each shard, payload = the event row as
JSON. Lets any fixture-driven pipeline be replayed through the streaming
source, so stream results can be diffed against batch results on identical
data (tests/test_stream_batch_parity.py).

Usage: python tools/make_replay_fixture.py [sf_dir] [out_dir] [n_shards]
"""

from __future__ import annotations

import base64
import json
import os
import sys


def write_replay_fixture(sf_dir: str, out_dir: str, n_shards: int = 4) -> dict[str, int]:
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props
        FROM read_parquet('{os.path.join(sf_dir, "events.parquet")}')
        ORDER BY epoch_us(ts), event_id
        """
    ).fetchall()
    con.close()

    os.makedirs(out_dir, exist_ok=True)
    shards: dict[str, list[str]] = {f"shard-{i:04d}": [] for i in range(n_shards)}
    seq: dict[str, int] = {s: 0 for s in shards}
    for event_id, ts_us, user_id, event_type, value, props in rows:
        shard = f"shard-{user_id % n_shards:04d}"
        seq[shard] += 1
        payload = {
            "event_id": event_id,
            "ts_us": ts_us,
            "user_id": user_id,
            "event_type": event_type,
            "value": value,
            "props": props,
        }
        shards[shard].append(
            json.dumps(
                {
                    "ContinuationSequenceNumber": str(seq[shard]),
                    "MillisBehindLatest": 0,
                    "Records": [
                        {
                            "SequenceNumber": str(seq[shard]),
                            "PartitionKey": str(user_id),
                            "ApproximateArrivalTimestamp": ts_us / 1e6,
                            "Data": base64.b64encode(json.dumps(payload).encode()).decode(),
                        }
                    ],
                }
            )
        )
    for shard, lines in shards.items():
        with open(os.path.join(out_dir, f"{shard}.jsonl"), "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
    return seq


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/replay_events"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    counts = write_replay_fixture(sf, out, n)
    print(json.dumps({"out": out, "events_per_shard": counts}))
