#!/usr/bin/env python
"""Steady-state latency under a PROCESSING-TIME trigger (r9 verdict
item 6): the 20M availableNow replay (tools/stress_streaming.py)
proved throughput and state eviction, but its 25 h watermark-lag floor
is structural — 40 days of event time replayed in seconds, watermark
advancing only between micro-batches. A monitoring deployment runs the
other regime: files arrive in WALL-CLOCK time, event time ≈ arrival
time, and the number that matters is how far the pipeline's watermark
trails real time at each progress tick (= the alerting delay a 100 TB
AML monitor actually exhibits).

This tool runs that regime live: a feeder thread drops one parquet
file every ``feed_interval_s`` seconds (pyarrow write + atomic rename
— the file source must never list a half-written file) with event
timestamps stamped at write time, while the query runs under
``trigger(processingTime=...)``. Two queries, sequentially, fresh feed
dir each:

- sessionize — session_window(gap 15 s) + 30 s watermark over a
  rotating user population, so sessions CLOSE mid-run and rows flow
  (append mode emits only watermark-expired sessions).
- passthrough — interval_join_streams of the out/in faces of the same
  feed (stream_passthrough_pairs' state shape: both sides buffered in
  the state store, 30 s match horizon, 1 min watermark); each file
  plants matched (out, in) pairs ~1 s apart so the join emits.

Reported per query, from the engine's own StreamingQueryProgress:
events/s, batch duration, state rows, and wm_lag_wall_s = progress
wall timestamp − current watermark. Expected steady state:
wm_lag_wall ≈ watermark delay + one feed interval + one trigger
interval (the watermark can only advance one batch behind arrivals);
anything drifting upward means the trigger cadence can't keep up.

Usage: python tools/stress_trigger.py [rows_per_file] [n_files] [feed_interval_s]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import threading
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from anti_money_laundering_spark.session import get_spark  # noqa: E402
from anti_money_laundering_spark.streaming import (  # noqa: E402
    interval_join_streams,
    read_events_stream,
    session_event_stats,
)

_FMT = "%Y-%m-%dT%H:%M:%S.%fZ"


def _write_file(path: str, idx: int, rows: int, fixed_users: int | None = None) -> None:
    """One live file: half 'out' transfers at t_now, half 'in' at
    t_now+1s with the SAME per-pair user_id (the passthrough match),
    user population rotated per file (idx * 10^7 offset) so sessions
    close once the gap passes. ``fixed_users`` instead REUSES a stable
    population of that size across files (the velocity phase needs
    repeat activity per user so trailing frames accumulate and state
    eviction is observable)."""
    now_us = int(time.time() * 1_000_000)
    n_pairs = rows // 2
    pair = np.arange(n_pairs, dtype=np.int64)
    if fixed_users is not None:
        users = pair % fixed_users
    else:
        users = idx * 10_000_000 + pair
    jitter = (pair * 37) % 1_000_000  # spread inside the second, deterministic
    out_ts = (now_us + jitter) * 1000  # nanos-as-long, matches EVENTS_RAW_SCHEMA
    in_ts = (now_us + 1_000_000 + jitter) * 1000
    tbl = pa.table(
        {
            "event_id": pa.array(
                np.concatenate([idx * 10_000_000 + pair * 2, idx * 10_000_000 + pair * 2 + 1])
            ),
            "ts": pa.array(np.concatenate([out_ts, in_ts])),
            "user_id": pa.array(np.concatenate([users, users])),
            "event_type": pa.array(["out"] * n_pairs + ["in"] * n_pairs),
            "value": pa.array(
                np.concatenate([(pair % 9000) + 999.0, (pair % 9000) + 990.0])
            ),
            "props": pa.array([None] * (2 * n_pairs), type=pa.string()),
        }
    )
    tmp = os.path.join(os.path.dirname(path), f".tmp-{idx}.parquet")
    pq.write_table(tbl, tmp)
    os.rename(tmp, path)  # atomic: the source never lists a partial file


def _feeder(
    data_dir: str,
    n_files: int,
    rows: int,
    interval_s: float,
    stop: threading.Event,
    fixed_users: int | None = None,
):
    for i in range(n_files):
        if stop.is_set():
            return
        _write_file(
            os.path.join(data_dir, f"live-{i:05d}.parquet"), i, rows, fixed_users
        )
        time.sleep(interval_s)


def run_live(
    name: str,
    make_stream,
    scratch: str,
    rows_per_file: int,
    n_files: int,
    feed_interval_s: float,
    trigger_s: float = 2.0,
    output_mode: str = "append",
    fixed_users: int | None = None,
) -> dict:
    data = os.path.join(scratch, f"feed_{name}")
    os.makedirs(data)
    # one seed file so the stream has a schema'd non-empty listing
    _write_file(os.path.join(data, "live-seed.parquet"), 999, rows_per_file, fixed_users)
    stop = threading.Event()
    feeder = threading.Thread(
        target=_feeder,
        args=(data, n_files, rows_per_file, feed_interval_s, stop, fixed_users),
    )
    q = (
        make_stream(data)
        .writeStream.format("noop")
        .option("checkpointLocation", os.path.join(scratch, f"ck_{name}"))
        .outputMode(output_mode)
        .trigger(processingTime=f"{trigger_s} seconds")
        .start()
    )
    feeder.start()
    feeder.join()  # feed to completion...
    time.sleep(max(8.0, 4 * trigger_s))  # ...then let the tail drain
    prog = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    stop.set()

    batches = []
    for p in prog:
        if p.get("numInputRows", 0) == 0:
            continue
        state = p.get("stateOperators") or [{}]
        wm = p.get("eventTime", {}).get("watermark")
        lag = None
        if wm:
            t_prog = datetime.strptime(p["timestamp"], _FMT).replace(tzinfo=timezone.utc)
            t_wm = datetime.strptime(wm, _FMT).replace(tzinfo=timezone.utc)
            lag = (t_prog - t_wm).total_seconds()
            if lag > 1e5:
                # the first batch reports the PRE-batch watermark
                # (epoch 0 on a fresh checkpoint) — an artifact of
                # progress accounting, not a latency reading
                lag = None
        batches.append(
            {
                "rows": p["numInputRows"],
                "batch_s": round(p.get("batchDuration", 0) / 1000.0, 2),
                "state_rows": state[0].get("numRowsTotal"),
                "out_rows": sum(s.get("numRowsUpdated", 0) for s in state),
                "wm_lag_wall_s": round(lag, 1) if lag is not None else None,
            }
        )
    if not batches:
        raise AssertionError(
            f"{name}: no micro-batch processed any input rows — the file "
            f"source never picked up the live feed (check the feeder/path)"
        )
    lags = [b["wm_lag_wall_s"] for b in batches if b["wm_lag_wall_s"] is not None]
    total_rows = sum(b["rows"] for b in batches)
    total_s = sum(b["batch_s"] for b in batches)
    out = {
        "query": name,
        "trigger_s": trigger_s,
        "feed_interval_s": feed_interval_s,
        "batches": len(batches),
        "rows": total_rows,
        "events_per_s": round(total_rows / total_s) if total_s else None,
        "median_batch_s": round(statistics.median(b["batch_s"] for b in batches), 2),
        "max_batch_s": round(max(b["batch_s"] for b in batches), 2),
        "median_wm_lag_wall_s": round(statistics.median(lags), 1) if lags else None,
        "max_wm_lag_wall_s": round(max(lags), 1) if lags else None,
        "max_state_rows": max((b["state_rows"] or 0) for b in batches),
        "last_state_rows": batches[-1]["state_rows"] if batches else None,
    }
    print(name, json.dumps(out), flush=True)
    for b in batches[:: max(1, len(batches) // 10)]:
        print(f"  {name} batch: {json.dumps(b)}", flush=True)
    return out


def main() -> int:
    rows_per_file = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    feed_interval_s = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    spark = get_spark(app_name="trigger_stress", shuffle_partitions=32)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "400")
    scratch = tempfile.mkdtemp(prefix="trigger_stress_")
    try:
        def mk_sessionize(data):
            ev = read_events_stream(spark, data, max_files_per_trigger=10)
            return session_event_stats(ev, gap="15 seconds", watermark="30 seconds")

        def mk_passthrough(data):
            out_face = read_events_stream(spark, data, max_files_per_trigger=10).filter(
                "event_type = 'out'"
            )
            in_face = read_events_stream(spark, data, max_files_per_trigger=10).filter(
                "event_type = 'in'"
            )
            j = interval_join_streams(
                out_face, in_face, key="user_id", upper="30 seconds", watermark="1 minute"
            )
            return j.select("l_user_id", "l_ts", "r_ts", "l_value", "r_value")

        def mk_velocity(data):
            from anti_money_laundering_spark.streaming import velocity_breach_stream

            ev = read_events_stream(spark, data, max_files_per_trigger=10)
            # wall-clock-scale horizons (10 s count frame / 45 s sum
            # frame) so buffer eviction happens DURING the run; limits
            # sized to the feed (each user sees ~rows/fixed_users
            # events per file) so some events breach and rows flow
            return velocity_breach_stream(
                ev,
                max_1h=8,
                max_24h_cents=2_000_000,
                h1_us=10_000_000,
                h24_us=45_000_000,
            )

        run_live("sessionize", mk_sessionize, scratch, rows_per_file, n_files, feed_interval_s)
        run_live("passthrough", mk_passthrough, scratch, rows_per_file, n_files, feed_interval_s)
        # velocity: python-state operator — per-trigger cost is per
        # ACTIVE KEY (pandas group dispatch), so the knob under test is
        # the live-user population, held fixed at 10k across files
        run_live(
            "velocity",
            mk_velocity,
            scratch,
            rows_per_file,
            n_files,
            feed_interval_s,
            output_mode="update",
            fixed_users=10_000,
        )

        def mk_velocity_evict(data):
            from anti_money_laundering_spark.streaming import velocity_breach_stream

            ev = read_events_stream(spark, data, max_files_per_trigger=10)
            return velocity_breach_stream(
                ev,
                max_1h=8,
                max_24h_cents=2_000_000,
                h1_us=5_000_000,
                h24_us=20_000_000,
                evict_idle_keys=True,
            )

        # velocity_evict: the r12 state-cardinality answer under the
        # live regime — population ROTATES per file (the default
        # idx*1e7 offset), so without eviction state grows with every
        # user ever seen; with evict_idle_keys the EventTimeTimeout
        # drops keys idle past the 20 s buffer horizon, so
        # last_state_rows must land FAR below the cumulative rotated
        # population. Files are 1/10 the main phases' size: the point
        # is state-cardinality behavior, and per-key dispatch cost
        # (the key-count curve, SCALE.md) would otherwise make batches
        # so slow the run ends before any key is idle past the
        # horizon — the first live run's lesson.
        run_live(
            "velocity_evict",
            mk_velocity_evict,
            scratch,
            max(2_000, rows_per_file // 10),
            n_files,
            feed_interval_s,
            output_mode="update",
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
