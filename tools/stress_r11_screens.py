#!/usr/bin/env python
"""Stress the r11 screens at 100-500x fixture scale, running the EXACT
catalog formulations (load_table swapped for synthetic frames — the
stress_screens.py pattern) so the measured plan is the shipped plan:

- peer_group_deviation over N orders / C customers / 5 segments: the
  claim under test is that cost is two keyed aggregations + a broadcast
  — per-customer rollup rides the merge-join partitioning, segment
  stats collapse to 5 rows. Planted whales (100x the organic order
  value, many orders) must flag `above`; the decimal(38,0) cross-
  multiplied 2-sigma test must survive segment sizes of C/5 customers
  (the documented (max_tc*n)^2*n <= 1e38 bound).
- amount_ramp_runs over N orders / C customers: one custkey shuffle,
  four window passes on the same sort. Planted ramp customers have
  their ENTIRE (~N/C-order) history replaced by one strictly-
  increasing cent ladder, so the asserted recovery is
  longest_run >= (N/C)/2 — a full-history plant, not a short ladder
  inside noise. Organic flags are the combinatorial mass of chance
  5-runs in iid amounts (P(any) ~ 1 - e^(-(k-4)/120) ~ 32% at k=50
  orders) — reported as calibration, not asserted away.

Results go to SCALE.md §r11-screens.

Usage: python tools/stress_r11_screens.py [n_orders] [n_customers]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import anti_money_laundering_spark.plans.feature_queries as fq  # noqa: E402
from anti_money_laundering_spark.session import get_spark  # noqa: E402

_SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def _run(spark, fn, tables):
    orig = fq.load_table
    fq.load_table = lambda _spark, _sf_dir, t: tables[t]
    try:
        t0 = time.perf_counter()
        rows = fn(spark, "stress").collect()
        wall = time.perf_counter() - t0
    finally:
        fq.load_table = orig
    return rows, wall


def main() -> int:
    n_orders = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    n_cust = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_whales = 1_000
    spark = get_spark(app_name="r11_screens_stress", shuffle_partitions=64)

    # --- shared synthetic base: ~n_orders/n_cust orders per customer,
    # organic price 10.00-99.99; whales (custkey < n_whales) at 100x --
    h = F.abs(F.xxhash64("id"))
    cust_col = (h % n_cust).alias("o_custkey")
    organic = ((F.abs(F.xxhash64("id", F.lit(1))) % 9000) / F.lit(100.0) + 10.0)
    price = F.when(
        (h % n_cust) < n_whales, organic * 100.0
    ).otherwise(organic)
    orders = spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        cust_col,
        F.expr("date_add(date'2024-01-01', cast(abs(xxhash64(id, 2)) % 365 as int))").alias(
            "o_orderdate"
        ),
        price.alias("o_totalprice"),
    )
    customer = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.element_at(
            F.array(*[F.lit(s) for s in _SEGS]), (F.col("id") % 5 + 1).cast("int")
        ).alias("c_mktsegment"),
    )

    rows, wall = _run(
        spark, fq.peer_group_deviation, {"orders": orders, "customer": customer}
    )
    flagged = {r.custkey for r in rows}
    whales_up = sum(1 for r in rows if r.custkey < n_whales and r.above)
    print(
        f"peer_group: {n_orders} orders / {n_cust} customers / 5 segments -> "
        f"{len(rows)} deviants in {wall:.1f}s; planted whales flagged above "
        f"{whales_up}/{n_whales}",
        flush=True,
    )
    assert whales_up == n_whales, whales_up
    assert all(w in flagged for w in range(n_whales))

    # --- ramp: replace the planted customers' order VALUES with a
    # strictly-increasing ladder keyed on their per-customer sequence.
    # Plant custkeys n_whales..n_whales+1999 (disjoint from whales so
    # phase 1's frame is reusable unmodified by hash determinism).
    n_ramp = 2_000
    is_ramp = (F.col("o_custkey") >= n_whales) & (
        F.col("o_custkey") < n_whales + n_ramp
    )
    # ladder: price = 100 + orderkey/100 — exactly one CENT per
    # orderkey, so consecutive orders of a ramp customer (keys ~C/n
    # apart) are strictly increasing at cent resolution (a finer step
    # like orderkey/1e6 quantizes to EQUAL cents ~10% of the time and
    # breaks runs — measured, min run 10 instead of ~50);
    # o_orderdate constant for ramp rows so (date, key) order == key
    # order and every consecutive pair is increasing
    ramp_orders = orders.select(
        "o_orderkey",
        "o_custkey",
        F.when(is_ramp, F.lit("2024-06-01").cast("date")).otherwise(
            F.col("o_orderdate")
        ).alias("o_orderdate"),
        F.when(
            is_ramp, 100.0 + F.col("o_orderkey") / F.lit(100.0)
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    rows, wall = _run(spark, fq.amount_ramp_runs, {"orders": ramp_orders})
    per_cust = n_orders / n_cust
    planted = [r for r in rows if n_whales <= r.custkey < n_whales + n_ramp]
    organic_flags = len(rows) - len(planted)
    print(
        f"ramp: {n_orders} orders / {n_cust} customers -> {len(rows)} flagged "
        f"in {wall:.1f}s; planted ladders recovered {len(planted)}/{n_ramp} "
        f"(expected run ~= {per_cust:.0f}), min planted run "
        f"{min((r.longest_run for r in planted), default=0)}; organic 5-run "
        f"calibration mass {organic_flags}",
        flush=True,
    )
    assert len(planted) == n_ramp
    # every planted ladder must be one unbroken run of ALL its orders
    assert all(r.longest_run >= per_cust * 0.5 for r in planted)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
