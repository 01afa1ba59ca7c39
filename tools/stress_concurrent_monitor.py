#!/usr/bin/env python
"""Measure the PRODUCTION shape of the always-on monitor: the four
streaming screens of examples/streaming_monitor.py running as
CONCURRENT continuous queries on ONE SparkSession (separate durable
checkpoints, FAIR scheduler pools, processingTime triggers) vs the
same four screens run sequentially — the multi-query interference
number an operator of the monitor needs (shared scheduler, shared
python-worker pool, state-store memory pressure), which the
sequential-replay example cannot show (r12 verdict item 3).

Method: one synthetic feed (N events over 6 days, F time-ordered
parquet files written as SEQUENTIAL jobs so FileStreamSource replays
them in order; ~7% of values above FLOW_THRESHOLD so the
stream-stream join leg carries realistic selectivity), then an
UNTIMED warmup pass (all four screens over a small feed, so
JIT/Arrow/python-worker warmup lands in neither measured mode — a
fresh JVM's first phase reads ~1.5x its warm self, and a cold-first
sequential mode would inflate the concurrency speedup), then each
mode:

- sequential: start screen, drain (every file batch processed and one
  empty batch ran), stop; next screen. Per-screen clean-room cost.
- concurrent: start all four, drain all, stop all. Same feed, same
  checkpoint layout, fresh checkpoint dirs (no cross-mode reuse).

Per-screen metrics come from the query's own progress events
(batchId < n_files): total triggerExecution ms, rows/s, median batch
ms. Interference = concurrent / sequential per-screen batch-time
ratio; the aggregate trade = wall(concurrent) vs sum of sequential
walls. FAIR pools (one per screen) keep one heavy batch from
starving the other queries' sub-second batches — the deployed
setting; FIFO would serialize whole micro-batches.

Results go to SCALE.md §concurrent-monitor + DEPLOY.md.

Usage: python tools/stress_concurrent_monitor.py [n_events] [n_files]
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

from pyspark.sql import functions as F  # noqa: E402

from anti_money_laundering_spark.plans.feature_queries import (  # noqa: E402
    _COORD_MIN_SENDERS,
    _VELOCITY_MAX_1H,
    _VELOCITY_MAX_24H_CENTS,
)
from anti_money_laundering_spark.session import get_spark  # noqa: E402
from anti_money_laundering_spark.streaming import (  # noqa: E402
    coordinated_amounts_stream,
    interval_join_streams,
    read_events_stream,
    stateful_user_totals,
    velocity_breach_stream,
)

_BASE_US = 1_700_000_000_000_000
_DAY_US = 86_400_000_000
_SPAN_US = 6 * _DAY_US
_USERS = 50_000


def write_feed(spark, n_events: int, n_files: int, out: str) -> None:
    """N synthetic events as n_files time-ordered parquet files in the
    EVENTS_RAW_SCHEMA layout (ts = int64 nanos). Each file is its own
    SEQUENTIAL job so mtimes ascend — the replay-order contract
    write_events_replay documents (a single distributed write would
    give every part one mtime and an undefined replay order); the
    per-file write is distributed-then-coalesced, no driver collect."""
    chunk = n_events // n_files
    for i in range(n_files):
        lo = i * chunk
        hi = (i + 1) * chunk if i < n_files - 1 else n_events
        h = F.abs(F.xxhash64("id", F.lit(12)))
        hu = F.abs(F.xxhash64("id", F.lit(99)))
        hk = F.abs(F.xxhash64("id", F.lit(7)))
        df = spark.range(lo, hi).select(
            F.col("id").alias("event_id"),
            # float form, not id * _SPAN_US: the int64 product overflows
            # (ANSI crash) past ~1.8e7 events — the sibling stress
            # tools' convention
            ((F.lit(_BASE_US) + (F.col("id") * (_SPAN_US / n_events)).cast("long"))
             * 1000).alias("ts"),
            (hu % _USERS).alias("user_id"),
            F.lit("transfer").alias("event_type"),
            # ~7% above FLOW_THRESHOLD (140.0) -> realistic funnel-leg
            # selectivity for the stream-stream join
            ((h % 15_000) / 100.0 + 1.0).alias("value"),
            F.to_json(F.struct((hk % _USERS).alias("k"))).alias("props"),
        )
        df.coalesce(1).write.mode("append").parquet(out)


# the measured screens must be THE example's screens — import, don't
# copy, the funnel-leg builder so a parameter change there can't leave
# this tool silently measuring a different composition (r13 review)
from examples.streaming_monitor import passthrough_leg as _passthrough_leg  # noqa: E402


def screen_builders(spark, feed: str):
    """name -> zero-arg builder returning the screen's stream frame
    (each call makes FRESH readStream sources so sequential and
    concurrent modes never share a plan)."""
    return {
        "velocity": lambda: velocity_breach_stream(
            read_events_stream(spark, feed),
            max_1h=_VELOCITY_MAX_1H,
            max_24h_cents=_VELOCITY_MAX_24H_CENTS,
            evict_idle_keys=True,
        ),
        "coordination": lambda: coordinated_amounts_stream(
            read_events_stream(spark, feed), min_senders=_COORD_MIN_SENDERS
        ),
        "passthrough": lambda: interval_join_streams(
            _passthrough_leg(read_events_stream(spark, feed), inflow=True),
            _passthrough_leg(read_events_stream(spark, feed), inflow=False),
            key="mid",
            upper="48 hours",
            watermark="49 hours",
        ).filter(
            (F.col("l_event_id") != F.col("r_event_id"))
            & (F.col("r_cents") * 10 >= F.col("l_cents") * 8)
            & (F.col("r_cents") * 10 <= F.col("l_cents") * 10)
        ),
        "totals": lambda: stateful_user_totals(read_events_stream(spark, feed)),
    }


_OUTPUT_MODE = {
    "velocity": "update",
    "coordination": "append",
    "passthrough": "append",
    "totals": "update",
}


def _start(spark, name: str, frame, ckpt_root: str):
    # FAIR pool per screen — the deployed setting; the local property
    # is captured by the query's microbatch thread at start
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
    q = (
        frame.writeStream.format("noop")
        .queryName(name)
        .outputMode(_OUTPUT_MODE[name])
        .option("checkpointLocation", os.path.join(ckpt_root, name))
        .trigger(processingTime="0 seconds")
        .start()
    )
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)
    return q


def _drain(queries: dict, n_files: int, timeout_s: float = 1800.0) -> float:
    """Wait until every query has processed all n_files data batches
    and run at least one empty batch past them; returns the wall."""
    t0 = time.perf_counter()
    done: set[str] = set()
    while len(done) < len(queries):
        if time.perf_counter() - t0 > timeout_s:
            raise TimeoutError(f"drain timed out; done={sorted(done)}")
        for name, q in queries.items():
            if name in done:
                continue
            exc = q.exception()
            if exc is not None:
                raise RuntimeError(f"query {name} failed: {exc}") from exc
            lp = q.lastProgress
            if lp and lp["batchId"] >= n_files and lp["numInputRows"] == 0:
                done.add(name)
        time.sleep(0.25)
    return time.perf_counter() - t0


def _metrics(q, n_files: int) -> dict:
    batches = [
        p for p in (json.loads(j.json) for j in q.recentProgress)
        if p["batchId"] < n_files
    ]
    trig = [p["durationMs"]["triggerExecution"] for p in batches]
    rows = sum(p["numInputRows"] for p in batches)
    out = sum(p["sink"].get("numOutputRows", 0) for p in batches)
    busy = sum(trig) / 1000.0
    return {
        "batches": len(batches),
        "rows": rows,
        "out_rows": out,
        "busy_s": round(busy, 2),
        "median_batch_ms": int(statistics.median(trig)) if trig else 0,
        "rows_per_s": int(rows / busy) if busy else 0,
    }


def run_mode(spark, feed: str, n_files: int, concurrent: bool) -> dict:
    ckpt_root = tempfile.mkdtemp(prefix=f"monitor_ckpt_{'c' if concurrent else 's'}_")
    builders = screen_builders(spark, feed)
    result: dict = {}
    try:
        if concurrent:
            qs = {n: _start(spark, n, b(), ckpt_root) for n, b in builders.items()}
            wall = _drain(qs, n_files)
            for n, q in qs.items():
                result[n] = _metrics(q, n_files)
                q.stop()
            result["_wall_s"] = round(wall, 2)
        else:
            total = 0.0
            for n, b in builders.items():
                q = _start(spark, n, b(), ckpt_root)
                wall = _drain({n: q}, n_files)
                result[n] = _metrics(q, n_files)
                result[n]["wall_s"] = round(wall, 2)
                q.stop()
                total += wall
            result["_wall_s"] = round(total, 2)
    finally:
        shutil.rmtree(ckpt_root, ignore_errors=True)
    return result


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(
        app_name="concurrent_monitor_stress",
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    # _metrics reads recentProgress; the default retention (100) would
    # silently drop the earliest batches of a run with n_files > ~100
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(max(400, 2 * n_files + 50))
    )
    feed = tempfile.mkdtemp(prefix="monitor_feed_")
    warm_feed = tempfile.mkdtemp(prefix="monitor_warm_")
    try:
        t0 = time.perf_counter()
        write_feed(spark, n_events, n_files, feed)
        print(f"feed: {n_events} events / {n_files} files in "
              f"{time.perf_counter() - t0:.1f}s at {feed}")

        # UNTIMED warmup: run every screen once over a small feed so
        # JIT/Arrow/python-worker warmup lands in neither measured
        # mode — a fresh JVM's first phase reads ~1.5x its warm self
        # (tools/profile_velocity_state.py), and sequential-first
        # ordering would otherwise inflate the concurrency speedup
        # (r13 review finding)
        t0 = time.perf_counter()
        write_feed(spark, max(20_000, n_events // 20), 2, warm_feed)
        run_mode(spark, warm_feed, 2, concurrent=False)
        print(f"warmup pass (untimed): {time.perf_counter() - t0:.1f}s")

        seq = run_mode(spark, feed, n_files, concurrent=False)
        con = run_mode(spark, feed, n_files, concurrent=True)

        print(f"\nsequential total wall {seq['_wall_s']}s; "
              f"concurrent wall {con['_wall_s']}s "
              f"(speedup {seq['_wall_s'] / con['_wall_s']:.2f}x)")
        hdr = (f"{'screen':14} {'seq batch ms':>12} {'con batch ms':>12} "
               f"{'interference':>12} {'seq rows/s':>10} {'con rows/s':>10} {'out':>8}")
        print(hdr)
        for n in ["velocity", "coordination", "passthrough", "totals"]:
            s, c = seq[n], con[n]
            ratio = (c["median_batch_ms"] / s["median_batch_ms"]
                     if s["median_batch_ms"] else float("nan"))
            print(f"{n:14} {s['median_batch_ms']:>12} {c['median_batch_ms']:>12} "
                  f"{ratio:>11.2f}x {s['rows_per_s']:>10} {c['rows_per_s']:>10} "
                  f"{c['out_rows']:>8}")
        print("\nJSON:", json.dumps({"sequential": seq, "concurrent": con}))
    finally:
        shutil.rmtree(feed, ignore_errors=True)
        shutil.rmtree(warm_feed, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
