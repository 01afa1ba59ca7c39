#!/usr/bin/env python
"""Active-key-cardinality curve for the python-stateful velocity
operator (r11 verdict item 3): tools/stress_trigger.py measured the
live trigger regime at 10k fixed users (~36k ev/s, pandas group
dispatch per ACTIVE KEY dominating); real AML monitoring has millions
of active accounts, so this tool measures WHERE applyInPandasWithState
stops keeping up as the per-trigger active-key count grows, and pins
the numbers behind the 100x-scale decision rule documented in
``velocity_breach_stream``'s docstring and SCALE.md §trigger-mode.

Method: the knee is in the per-trigger compute, not arrival timing, so
this sweep replays pre-written files (maxFilesPerTrigger=1 => one file
per micro-batch, availableNow, noop sink) instead of a wall-clock
feeder — each batch touches exactly K distinct users with E events
each, timestamps advancing INSIDE the 24h horizon so per-user buffers
accumulate across batches like a real day of activity. Per batch we
read the engine's own progress: batchDuration, numInputRows, state
rows. Batch 0 pays plan/python-worker warmup and is reported but
excluded from the medians.

Two sweeps:
- K-sweep (E fixed): keys/s vs K — the dispatch-bound regime shows
  flat keys/s (wall grows linearly with K), and the knee is where
  per-batch wall exceeds the deployment's trigger interval.
- E-sweep at fixed K: events/s vs E — if cost is per-key, doubling E
  multiplies events/s while keys/s stays flat, which is the measured
  case FOR (coarser triggers = more events per key per trigger =
  more throughput at the same key population).

Usage: python tools/stress_velocity_keys.py [K1,K2,...] [E] [n_files]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from anti_money_laundering_spark.session import get_spark  # noqa: E402
from anti_money_laundering_spark.streaming import (  # noqa: E402
    read_events_stream,
    velocity_breach_stream,
)

#: event-time step between files — inside the 24h buffer horizon so
#: state accumulates, large enough that the 1h count frame only sees
#: the current file (keeps breach volume stable across K)
_FILE_STEP_US = 2 * 3_600_000_000


def _write_file(path: str, idx: int, keys: int, events_per_key: int) -> None:
    base_us = 1_700_000_000_000_000 + idx * _FILE_STEP_US
    users = np.repeat(np.arange(keys, dtype=np.int64), events_per_key)
    seq = np.tile(np.arange(events_per_key, dtype=np.int64), keys)
    # spread a key's events over ~events_per_key seconds; stagger keys
    # inside the second so sorts see realistic interleaving
    ts_us = base_us + seq * 1_000_000 + (users % 997) * 1_000
    n = keys * events_per_key
    tbl = pa.table(
        {
            "event_id": pa.array(idx * 1_000_000_000 + np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts_us * 1000),  # nanos-as-long raw layout
            "user_id": pa.array(users),
            "event_type": pa.array(["transfer"] * n),
            "value": pa.array(((users % 9000) + 10.0).astype(np.float64)),
            "props": pa.array([None] * n, type=pa.string()),
        }
    )
    tmp = os.path.join(os.path.dirname(path), f".tmp-{idx}.parquet")
    pq.write_table(tbl, tmp)
    os.rename(tmp, path)


def run_replay(spark, keys: int, events_per_key: int, n_files: int) -> dict:
    scratch = tempfile.mkdtemp(prefix=f"velkeys_{keys}_")
    try:
        data = os.path.join(scratch, "feed")
        os.makedirs(data)
        for i in range(n_files):
            _write_file(
                os.path.join(data, f"f-{i:03d}.parquet"), i, keys, events_per_key
            )
        ev = read_events_stream(spark, data, max_files_per_trigger=1)
        # limits sized so a stable minority of events breach (rows
        # flow through the update sink without dominating the batch)
        stream = velocity_breach_stream(
            ev,
            max_1h=events_per_key,  # every key's last event of a file breaches
            max_24h_cents=2**62,
        )
        q = (
            stream.writeStream.format("noop")
            .option("checkpointLocation", os.path.join(scratch, "ck"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        prog = [json.loads(p.json) for p in q.recentProgress]
        q.stop()
        batches = [
            {
                "rows": p["numInputRows"],
                "batch_s": round(p.get("batchDuration", 0) / 1000.0, 2),
                "state_rows": (p.get("stateOperators") or [{}])[0].get("numRowsTotal"),
            }
            for p in prog
            if p.get("numInputRows", 0) > 0
        ]
        steady = batches[1:] or batches  # batch 0 = warmup
        med = statistics.median(b["batch_s"] for b in steady)
        out = {
            "keys": keys,
            "events_per_key": events_per_key,
            "files": n_files,
            "batches": len(batches),
            "warmup_batch_s": batches[0]["batch_s"] if batches else None,
            "median_batch_s": round(med, 2),
            "max_batch_s": round(max(b["batch_s"] for b in steady), 2),
            "keys_per_s": round(keys / med) if med else None,
            "events_per_s": round(keys * events_per_key / med) if med else None,
            "final_state_rows": batches[-1]["state_rows"] if batches else None,
        }
        print(json.dumps(out), flush=True)
        return out
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def main() -> int:
    ks = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [10_000, 50_000, 200_000, 1_000_000]
    )
    e = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_spark(app_name="velocity_keys_stress", shuffle_partitions=32)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "400")
    results = [run_replay(spark, k, e, n_files) for k in ks]
    # E-sweep at the middle K: per-key vs per-event cost attribution
    k_mid = ks[min(len(ks) - 1, max(0, len(ks) // 2))]
    e_sweep = [run_replay(spark, k_mid, ee, n_files) for ee in (e * 4,)]
    print("K-SWEEP " + json.dumps([
        {k: r[k] for k in ("keys", "median_batch_s", "keys_per_s", "events_per_s")}
        for r in results
    ]), flush=True)
    print("E-SWEEP " + json.dumps([
        {k: r[k] for k in ("keys", "events_per_key", "median_batch_s", "keys_per_s", "events_per_s")}
        for r in results if r["keys"] == k_mid
    ] + [
        {k: r[k] for k in ("keys", "events_per_key", "median_batch_s", "keys_per_s", "events_per_s")}
        for r in e_sweep
    ]), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
