#!/usr/bin/env python
"""Stress the r12 screens at 100-1000x fixture scale, running the
EXACT catalog formulations (load_table swapped for synthetic frames —
the stress_screens.py pattern) so the measured plan is the shipped
plan:

- coordinated_amount_clusters over N events / U users: the claim under
  test is that cost is ONE composite (cents, day) aggregation — random
  traffic spreads over ~10M distinct cent values x days so organic
  cells stay tiny, and a planted 12-mule ring reusing one configured
  amount on one day must surface. The distinct-sender count rides the
  two-phase distinct aggregate, so the heavy side is the first
  partial — linear, no join, no window.
- trade_mispricing_alerts over N lineitems / P parts: every window
  partitions by l_partkey (ONE shuffle); per-part work is bounded by
  trades-per-part. Planted over-invoiced trades (one 3x trade among
  uniform peers) and under-invoiced trades must flag with the right
  side; parts with coordinated ties at the extreme must NOT flag (the
  documented LOO-hiding semantics).

split_leakage_audit is deliberately NOT here: its corpus-scale cost
IS the shared LSH+verify pair build, stressed at 100k docs in
tools/stress_llm.py; the audit itself adds one codegen'd md5
predicate and zero shuffles on top.

Results go to SCALE.md §r12-screens.

Usage: python tools/stress_r12_screens.py [n_events] [n_lineitems]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import anti_money_laundering_spark.plans.feature_queries as fq  # noqa: E402
from anti_money_laundering_spark.session import get_spark  # noqa: E402

_BASE_US = 1_700_000_000_000_000


def _run(module, spark, fn, frame):
    orig = module.load_table
    module.load_table = lambda _spark, _sf_dir, _t: frame
    try:
        t0 = time.perf_counter()
        rows = fn(spark, "stress").collect()
        return rows, time.perf_counter() - t0
    finally:
        module.load_table = orig


def stress_coordinated(spark, n_events: int) -> None:
    # user and amount come from INDEPENDENT hashes (review finding:
    # one shared hash with 10M % 500k == 0 made every organic
    # same-amount cell single-sender — a degenerate generator that
    # faked zero organic false positives)
    h = F.abs(F.xxhash64("id", F.lit(12)))
    hu = F.abs(F.xxhash64("id", F.lit(99)))
    span_us = 30 * 86_400_000_000  # 30 days
    noise = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.expr(
            f"timestamp_micros(cast({_BASE_US} + id * ({span_us} / {n_events}) as long))"
        ).alias("ts"),
        (hu % 500_000).alias("user_id"),
        ((h % 10_000_000) / 100.0 + 1.0).alias("value"),
    )
    # the ring: 12 mules, one configured amount, one day, one event
    # each, 30 min apart. _BASE_US lands at 22:13 UTC, so shift +4h
    # past day 3's midnight to keep all 12 inside ONE calendar day
    # (the screen's cell is (amount, day) — a midnight-straddling
    # plant would split 2/10, the first smoke's lesson)
    ring = spark.range(12).select(
        (F.lit(9_000_000_000) + F.col("id")).alias("event_id"),
        F.expr(
            f"timestamp_micros(cast({_BASE_US} + 86400000000 * 3 "
            f"+ 14400000000 + id * 1800000000 as long))"
        ).alias("ts"),
        (F.lit(900_000) + F.col("id")).alias("user_id"),
        # OFF the noise grid (noise cents <= 10_000_099 — review
        # finding: an on-grid plant absorbs a noise event w.p. ~15%
        # and the sender-count assert flakes)
        F.lit(150_000.37).alias("value"),
    )
    ev = noise.unionByName(ring)
    rows, wall = _run(fq, spark, fq.coordinated_amount_clusters, ev)
    planted = [r for r in rows if r.cents == 15_000_037]
    organic = len(rows) - len(planted)
    print(
        f"coordinated: {n_events + 12} events / 500k users -> {len(rows)} "
        f"cells in {wall:.1f}s; planted 12-mule ring flagged: "
        f"{len(planted) == 1 and planted[0].n_senders == 12}; organic "
        f">=3-sender cells (calibration/FP pressure at 10M distinct "
        f"amounts x 30 days): {organic}"
    )
    assert len(planted) == 1 and planted[0].n_senders == 12
    assert planted[0].n_events == 12 and planted[0].total_cents == 12 * 15_000_037


def stress_mispricing(spark, n_lineitems: int) -> None:
    # P parts x ~5 trades each, uniform in-part price with per-part
    # base; every 100,000th part gets one extra 3x over-invoiced trade
    # and every 100,000th+1 part one extra 4x-under trade
    p = n_lineitems // 5
    h = F.abs(F.xxhash64("id", F.lit(13)))
    base = spark.range(n_lineitems).select(
        (F.col("id") + 1).alias("l_orderkey"),
        F.lit(1).cast("long").alias("l_linenumber"),
        (F.col("id") % p).alias("l_partkey"),
        F.lit(1.0).alias("l_quantity"),
        # per-part base price 10..1009 dollars, +/- up to 49% in-part
        # jitter (stays under the 2x LOO flag ratio)
        (
            ((F.col("id") % p) % 1000 + 10.0)
            * (1.0 + (h % 49) / 100.0)
        ).alias("l_extendedprice"),
    )
    n_planted = p // 100_000
    over = spark.range(n_planted).select(
        (F.lit(8_000_000_000) + F.col("id")).alias("l_orderkey"),
        F.lit(1).cast("long").alias("l_linenumber"),
        (F.col("id") * 100_000).alias("l_partkey"),
        F.lit(1.0).alias("l_quantity"),
        ((F.col("id") * 100_000) % 1000 + 10.0).alias("__base"),
    ).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
        # 3x the part's max organic price (base * 1.49) -> always >= 2x LOO max
        (F.col("__base") * 1.49 * 3.0).alias("l_extendedprice"),
    )
    under = spark.range(n_planted).select(
        (F.lit(8_500_000_000) + F.col("id")).alias("l_orderkey"),
        F.lit(1).cast("long").alias("l_linenumber"),
        (F.col("id") * 100_000 + 1).alias("l_partkey"),
        F.lit(1.0).alias("l_quantity"),
        (((F.col("id") * 100_000 + 1) % 1000 + 10.0) / 4.0).alias("l_extendedprice"),
    )
    li = base.unionByName(over).unionByName(under)
    rows, wall = _run(fq, spark, fq.trade_mispricing_alerts, li)
    got_over = {r.l_partkey for r in rows if r.side == "over" and r.l_orderkey >= 8_000_000_000}
    got_under = {r.l_partkey for r in rows if r.side == "under" and r.l_orderkey >= 8_500_000_000}
    print(
        f"mispricing: {n_lineitems + 2 * n_planted} lineitems / {p} parts -> "
        f"{len(rows)} alerts in {wall:.1f}s; planted over {len(got_over)}/"
        f"{n_planted}, under {len(got_under)}/{n_planted}"
    )
    assert len(got_over) == n_planted, "every planted over-invoice must flag"
    assert len(got_under) == n_planted, "every planted under-invoice must flag"


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    n_lineitems = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000_000
    spark = get_spark(app_name="r12_screen_stress", shuffle_partitions=64)
    stress_coordinated(spark, n_events)
    stress_mispricing(spark, n_lineitems)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
