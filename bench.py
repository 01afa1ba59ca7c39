#!/usr/bin/env python
"""Benchmark harness (driver contract): run the engine's headline
queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan build + execution) with a
``count()`` action so results never collect to the driver.

Protocol (round 6 — r5 verdict item 6): THREE warmup sweeps amortize
JVM class loading, codegen, parquet footer reads and the residual JIT
decay (SCALE_CC_r04.json: identical work decays over the first ~3
executions), then each query is timed over PASSES interleaved sweeps
and the per-query MEDIAN is reported. The previous min-of-N sat on the
steep part of the warm-up curve and could not resolve a real ~15%
regression from box noise (the shared host swings ±25% through the
day); the median is robust to one slow neighbor-noise outlier AND one
fast still-warming outlier, and the emitted ``dispersion`` block
(per-query min/max/relative spread) lets a reader judge whether a
round-over-round delta exceeds the run's own noise floor.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from anti_money_laundering_spark.plans.catalog import get_catalog  # noqa: E402
from anti_money_laundering_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "5"))
WARMUPS = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", "3"))


def _sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark(app_name="aml_bench")
    catalog = get_catalog()
    headline = {n: q for n, q in catalog.items() if q.headline}

    for _ in range(WARMUPS):
        for q in headline.values():
            q.fn(spark, SF_DIR).count()

    samples: dict[str, list[float]] = {n: [] for n in headline}
    for _ in range(PASSES):
        for name, q in headline.items():
            t0 = time.perf_counter()
            q.fn(spark, SF_DIR).count()
            samples[name].append(time.perf_counter() - t0)

    timings = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    dispersion = {
        n: {
            "min": round(min(s), 3),
            "max": round(max(s), 3),
            # (max-min)/median: the run's own noise band; a
            # round-over-round delta inside this band is not a result
            "rel_spread": round((max(s) - min(s)) / statistics.median(s), 3),
        }
        for n, s in samples.items()
    }
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "dispersion": dispersion,
                "protocol": {"warmups": WARMUPS, "passes": PASSES, "stat": "median"},
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
