#!/usr/bin/env python
"""Instrument the stateful-velocity superlinear tail (r12 verdict item
4): SCALE.md §trigger-mode records the marginal per-key cost drifting
57 -> 77 -> 91 µs/key from 200k to 2M active keys and ATTRIBUTES it to
state-store maintenance growth — but by inference, not measurement.
This tool reads the engine's own per-batch state-operator metrics so
the cause is stated from instrumentation:

- durationMs.addBatch (batch WALL, incl. python dispatch) vs the
  state store's own commitTimeMs / allUpdatesTimeMs / allRemovalsTimeMs
  — NB these are TASK-TIME SUMS across all state-store partitions
  (32 here), a different clock domain than the wall: they exceed the
  batch wall when stores commit in parallel, so they are reported
  per-key both raw and per-store-partition-normalized
  (wall-equivalent at full parallelism) and must never be subtracted from addBatch,
- memoryUsedBytes + numRowsTotal (bytes/key), and the HDFS provider's
  customMetrics (loadedMapCacheHit/Miss, stateOnCurrentVersionSizeBytes)
  — the versioned-map copy costs that grow with TOTAL entries.

Attribution test: if the per-key state task-time (updates+commit)
GROWS from 200k to 2M by about the same margin as the per-key wall
drift (57 -> 91 µs/key), the maintenance attribution stands; if it is
flat, the growth is in the python/Arrow path and SCALE.md must say so.

Second question: does the RocksDB provider flatten the tail? The tool
probes whether RocksDBStateStoreProvider loads in this container
(bundled JNI) and, if so, repeats the sweep under it. Provider is set
per-QUERY at checkpoint creation via the session conf around start().

Feed layout reuses tools/stress_velocity_keys.py's builder (same
replay regime: maxFilesPerTrigger=1, K keys x E events per file,
timestamps inside the 24h horizon; batch 0 = warmup, excluded).

Results go to SCALE.md §trigger-mode (tail attribution paragraph).

Usage: python tools/profile_velocity_state.py [K1,K2,...] [E] [n_files]
       [hdfs|rocksdb|both]

JVM-warmup control: the FIRST phase of a fresh JVM pays JIT/Arrow
warmup well past batch 0 (measured: a cold-first 200k phase reads
~1.5x its warm same-JVM reading) — lead the K list with a small
throwaway K (e.g. 20000) and read the curve from the later phases.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anti_money_laundering_spark.session import get_spark  # noqa: E402
from anti_money_laundering_spark.streaming import (  # noqa: E402
    read_events_stream,
    velocity_breach_stream,
)
from tools.stress_velocity_keys import _write_file  # noqa: E402

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def profile(spark, keys: int, events_per_key: int, n_files: int,
            provider: str | None) -> dict:
    scratch = tempfile.mkdtemp(prefix=f"velprof_{keys}_")
    old = spark.conf.get(_PROVIDER_CONF, None)
    try:
        if provider:
            spark.conf.set(_PROVIDER_CONF, provider)
        data = os.path.join(scratch, "feed")
        os.makedirs(data)
        for i in range(n_files):
            _write_file(
                os.path.join(data, f"f-{i:03d}.parquet"), i, keys, events_per_key
            )
        stream = velocity_breach_stream(
            read_events_stream(spark, data, max_files_per_trigger=1),
            max_1h=events_per_key,
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
        rows = []
        for p in prog:
            if p.get("numInputRows", 0) == 0:
                continue
            so = (p.get("stateOperators") or [{}])[0]
            cm = so.get("customMetrics") or {}
            rows.append(
                {
                    "add_batch_s": p["durationMs"].get("addBatch", 0) / 1000.0,
                    "commit_s": so.get("commitTimeMs", 0) / 1000.0,
                    "updates_s": so.get("allUpdatesTimeMs", 0) / 1000.0,
                    "removals_s": so.get("allRemovalsTimeMs", 0) / 1000.0,
                    "state_rows": so.get("numRowsTotal"),
                    "mem_mb": round((so.get("memoryUsedBytes") or 0) / 1e6, 1),
                    "map_ver_mb": round(
                        (cm.get("stateOnCurrentVersionSizeBytes") or 0) / 1e6, 1
                    ),
                    "cache_hit": cm.get("loadedMapCacheHitCount"),
                    "cache_miss": cm.get("loadedMapCacheMissCount"),
                }
            )
        steady = rows[1:] or rows
        med = lambda k: statistics.median(r[k] for r in steady)  # noqa: E731
        per_key = lambda s: round(s * 1e6 / keys, 1)  # noqa: E731
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        out = {
            "provider": "rocksdb" if provider else "hdfs",
            "keys": keys,
            "batches": len(rows),
            "median_add_batch_s": round(med("add_batch_s"), 2),
            "median_commit_s": round(med("commit_s"), 2),
            "median_updates_s": round(med("updates_s"), 2),
            "median_removals_s": round(med("removals_s"), 2),
            "us_per_key_wall": per_key(med("add_batch_s")),
            # state columns are task-time sums over all store
            # partitions — a different clock domain than the wall
            "us_per_key_state_tasktime": per_key(
                med("commit_s") + med("updates_s") + med("removals_s")
            ),
            "us_per_key_state_per_part": per_key(
                (med("commit_s") + med("updates_s") + med("removals_s")) / n_parts
            ),
            "state_rows": steady[-1]["state_rows"],
            "mem_mb": steady[-1]["mem_mb"],
            "map_ver_mb": steady[-1]["map_ver_mb"],
            "cache_hit": steady[-1]["cache_hit"],
            "cache_miss": steady[-1]["cache_miss"],
        }
        print(json.dumps(out), flush=True)
        return out
    finally:
        if old is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, old)
        shutil.rmtree(scratch, ignore_errors=True)


def rocksdb_loads(spark) -> bool:
    """Probe: can this container's Spark instantiate the RocksDB
    provider at all? (bundled JNI — absent in some minimal images)."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(_ROCKSDB)
        return True
    except Exception as exc:  # noqa: BLE001
        print(f"rocksdb provider not loadable: {exc}", flush=True)
        return False


def main() -> int:
    ks = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [200_000, 2_000_000]
    )
    e = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    which = sys.argv[4] if len(sys.argv) > 4 else "both"
    spark = get_spark(app_name="velocity_state_profile", shuffle_partitions=32)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "400")
    results = []
    if which in ("hdfs", "both"):
        results += [profile(spark, k, e, n_files, provider=None) for k in ks]
    if which in ("rocksdb", "both") and rocksdb_loads(spark):
        results += [profile(spark, k, e, n_files, provider=_ROCKSDB) for k in ks]
    print("PROFILE " + json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
