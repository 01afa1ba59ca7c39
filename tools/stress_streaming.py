#!/usr/bin/env python
"""Structured-Streaming sustained-replay stress (r8 verdict item 6):
the streaming façade has batch-parity and replay tests but no recorded
throughput/state ceiling. This replays a 20M-event synthetic corpus
through the file source one file per micro-batch and records, from the
engine's own StreamingQueryProgress feed: events/s per batch and
overall, stateful-operator state rows (growth vs bounded), and
watermark lag behind max event time at each batch.

Three queries, run one after the other over the same files:
- sessionize  — session_window + watermark (session_event_stats, the
  stream_session_stats catalog shape). State = open sessions; must
  stay ~bounded at (active users in the watermark horizon), not grow
  with total events replayed.
- dedup       — dropDuplicatesWithinWatermark on event_id
  (dedup_events_stream). State = event ids inside the horizon; the
  watermark MUST evict: unbounded growth here is the classic 100 TB
  streaming killer (state ∝ all-time events).
- coord_sliding (r13) — the sliding-grid coordination twin
  (coordinated_sliding_stream): a 2x explode into two offset 24h
  grids feeding chained dedup -> tumbling-12h finalization. State
  (summed over BOTH chained operators) = dedup'd (user, cents, win)
  triples inside the 49h horizon + open (win, cents) agg cells; must
  stay horizon-bounded, not cumulative.

Event-time design: 20M events spread over ~40 days (one file ≈ one
half-day of event time, written time-ordered via repartitionByRange on
ts), 200k users, 10% duplicate event_ids planted within the same file
so the dedup state actually drops rows. Watermark 1 hour ⇒ state
horizon is a sliver of each batch's input — recorded numbers should
show state rows << cumulative input rows.

Usage: python tools/stress_streaming.py [n_events] [n_files]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from anti_money_laundering_spark.session import get_spark  # noqa: E402
from anti_money_laundering_spark.streaming import (  # noqa: E402
    coordinated_sliding_stream,
    dedup_events_stream,
    read_events_stream,
    session_event_stats,
)


def gen_events(spark, path: str, n_events: int, n_files: int) -> None:
    """Write the replay corpus: int64 micro-ts (EVENTS_RAW_SCHEMA
    carries ts as LONG nanos-of-epoch÷1000 == micros after the
    read_events_stream rebuild; we emit plain micros*1000 so
    `ts div 1000` lands back on micros), time-ordered files so the
    file-source replay advances event time monotonically per batch."""
    span_us = 40 * 86_400 * 1_000_000  # 40 days of event time
    base_us = 1_700_000_000 * 1_000_000
    ev = spark.range(n_events).select(
        # ~10% planted duplicates: ids collapse onto the previous id
        F.when(
            F.pmod(F.xxhash64("id", F.lit("dup")), 10) == 0, (F.col("id") - 1)
        )
        .otherwise(F.col("id"))
        .alias("event_id"),
        ((base_us + (F.col("id") * (span_us // n_events))) * 1000).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit("u")), 200_000).alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.pmod(F.xxhash64("id", F.lit("t")), 3) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit("v")), 10_000) / 100.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    # range-partition on ts => part-00000 is the earliest slice
    ev.repartitionByRange(n_files, "ts").write.mode("overwrite").parquet(path)
    # FileStreamSource replays in MODIFICATION-TIME order, and parallel
    # write tasks finish out of order — observed: a later-finishing
    # early-time file replayed after newer data, landing behind the
    # watermark and silently dropping its events. Pin mtimes to the
    # part-number order so the replay advances event time monotonically
    # (what a real time-ordered file drop would do).
    parts = sorted(
        f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".parquet")
    )
    t_base = time.time() - len(parts) * 2
    for i, f in enumerate(parts):
        os.utime(os.path.join(path, f), (t_base + i * 2, t_base + i * 2))


def run_query(name: str, stream_df, checkpoint: str) -> dict:
    q = (
        stream_df.writeStream.format("noop")
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    prog = [json.loads(p.json) for p in q.recentProgress]
    assert len(prog) < int(
        stream_df.sparkSession.conf.get("spark.sql.streaming.numRecentProgressUpdates")
    ), "recentProgress hit its retention cap — early batches were dropped"
    batches = []
    for p in prog:
        if p.get("numInputRows", 0) == 0:
            continue
        ops = p.get("stateOperators") or [{}]
        state = [{
            "numRowsTotal": sum(o.get("numRowsTotal") or 0 for o in ops),
            "memoryUsedBytes": sum(o.get("memoryUsedBytes") or 0 for o in ops),
        }]  # chained stateful queries (coord_sliding) carry 2 operators
        wm = p.get("eventTime", {}).get("watermark")
        mx = p.get("eventTime", {}).get("max")
        lag_s = None
        if wm and mx:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%fZ"
            lag_s = (datetime.strptime(mx, fmt) - datetime.strptime(wm, fmt)).total_seconds()
        batches.append(
            {
                "rows": p["numInputRows"],
                "batch_s": p.get("batchDuration", 0) / 1000.0,
                "rows_per_s": p.get("processedRowsPerSecond"),
                "state_rows": state[0].get("numRowsTotal"),
                "state_mb": round((state[0].get("memoryUsedBytes") or 0) / 1e6, 1),
                "wm_lag_s": lag_s,
            }
        )
    if not batches:
        raise AssertionError(
            f"{name}: no micro-batch processed any input rows — the file "
            f"source never picked up the replay corpus (check the path/gen)"
        )
    total_rows = sum(b["rows"] for b in batches)
    total_s = sum(b["batch_s"] for b in batches)
    out = {
        "query": name,
        "batches": len(batches),
        "rows": total_rows,
        "wall_s": round(total_s, 1),
        "events_per_s": round(total_rows / total_s) if total_s else None,
        "max_state_rows": max((b["state_rows"] or 0) for b in batches),
        "last_state_rows": batches[-1]["state_rows"],
        "max_state_mb": max((b["state_mb"] or 0) for b in batches),
        "median_wm_lag_s": sorted(
            (b["wm_lag_s"] for b in batches if b["wm_lag_s"] is not None)
        )[len([b for b in batches if b["wm_lag_s"] is not None]) // 2]
        if any(b["wm_lag_s"] is not None for b in batches)
        else None,
    }
    print(name, json.dumps(out), flush=True)
    for b in batches[:: max(1, len(batches) // 8)]:
        print(f"  {name} batch: {json.dumps(b)}", flush=True)
    return out


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    spark = get_spark(app_name="streaming_stress", shuffle_partitions=32)
    # recentProgress retains only numRecentProgressUpdates entries
    # (default 100) — a >100-file replay would silently report a
    # suffix of the batches; raise the cap above the batch count and
    # assert in run_query that we stayed under it
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", str(n_files + 16))
    scratch = tempfile.mkdtemp(prefix="stream_stress_")
    data = os.path.join(scratch, "events")
    try:
        t0 = time.perf_counter()
        gen_events(spark, data, n_events, n_files)
        print(f"gen: {n_events} events in {n_files} files "
              f"wall={time.perf_counter() - t0:.1f}s", flush=True)

        ev = read_events_stream(spark, data, max_files_per_trigger=1)
        sess = session_event_stats(ev, gap="30 minutes", watermark="1 hour")
        run_query("sessionize", sess, os.path.join(scratch, "ck_sess"))

        ev2 = read_events_stream(spark, data, max_files_per_trigger=1)
        dd = dedup_events_stream(ev2, watermark="1 hour")
        run_query("dedup", dd, os.path.join(scratch, "ck_dedup"))

        # r13: the sliding-grid coordination twin — the chained
        # dedup->window shape with a 2x explode in front. State =
        # dedup'd (user, cents, win) triples inside the 49h horizon
        # PLUS open (win, cents) agg cells; must stay bounded at a few
        # horizon-days of triples, not grow with total events replayed
        # (state_rows here sums BOTH chained operators).
        ev3 = read_events_stream(spark, data, max_files_per_trigger=1)
        cs = coordinated_sliding_stream(ev3, min_senders=3)
        res = run_query("coord_sliding", cs, os.path.join(scratch, "ck_coord"))
        # horizon-scaled bound (review finding: the original
        # < n_events bound was so loose a half-broken eviction would
        # pass): state is ~(events/day) x 2 grids x the ~73h
        # dedup+agg horizon; 8 horizon-day-equivalents gives ~1.5x
        # headroom over the measured 5.32M at 20M events / 40 days
        # (re-verified against the tightened bound this session),
        # while cumulative retention (~2x n_events) fails hard.
        span_days = 40
        horizon_bound = (n_events // span_days) * 2 * 8
        assert res["max_state_rows"] < horizon_bound, (
            f"sliding-coordination state must be horizon-bounded "
            f"(< {horizon_bound}), not cumulative over the replay"
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
