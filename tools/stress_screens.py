#!/usr/bin/env python
"""Stress the r9 statistical screens at 30-80x fixture scale, running
the EXACT catalog formulations (feature_queries.load_table is swapped
for synthetic frames, the hand-case-test trick) so the measured plan
is the shipped plan:

- kendall_tau_qty_discount over N lineitem-like rows: the claim under
  test is that the contingency-grid formulation is ROW-COUNT
  INDEPENDENT past the first count shuffle — the "pairwise" join runs
  over <= 550 grid cells whether N is 600k or 50M, so wall should
  scale like one scan+partial-agg and the planted q->d association
  must surface in tau's sign.
- runs_test_user_values over N events / U users: one lag window + one
  aggregate on the same user_id partitioning; per-user cost linear in
  activity, cross-user parallel. A planted subpopulation of strict
  alternators must flag nonrandom with z > 0 (too many runs).
- benford_first_digit_lineitem over N prices: ONE 9-key
  map-side-combinable aggregate; the planted leading-1 excess must
  appear in dev_micro ordering.

Results go to SCALE.md §feature-engineering (r9 screens).

Usage: python tools/stress_screens.py [kendall_rows] [runs_rows] [benford_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import anti_money_laundering_spark.plans.feature_queries as fq  # noqa: E402
from anti_money_laundering_spark.session import get_spark  # noqa: E402


def _run(spark, fn, table):
    orig = fq.load_table
    fq.load_table = lambda _spark, _sf_dir, _t: table
    try:
        t0 = time.perf_counter()
        rows = fn(spark, "stress").collect()
        wall = time.perf_counter() - t0
    finally:
        fq.load_table = orig
    return rows, wall


def main() -> int:
    n_kendall = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    n_benford = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000_000
    spark = get_spark(app_name="screens_stress", shuffle_partitions=64)

    # --- kendall: 50x11 grid with a planted monotone q->d association
    # on 20% of rows (d tracks q's decile), noise elsewhere ------------
    h = F.abs(F.xxhash64("id"))
    h2 = F.abs(F.xxhash64("id", F.lit(1)))
    q = (h % 50 + 1).cast("double")
    d_noise = (h2 % 11).cast("double") / F.lit(100.0)
    d_assoc = F.round(q * 10.0 / 50.0).cast("double") / F.lit(100.0)
    li = spark.range(n_kendall).select(
        q.alias("l_quantity"),
        F.when(h2 % 5 == 0, d_assoc).otherwise(d_noise).alias("l_discount"),
    )
    rows, wall = _run(spark, fq.kendall_tau_qty_discount, li)
    r = rows[0]
    print(
        f"kendall_tau_qty_discount: {n_kendall} rows -> 1 row in {wall:.1f}s "
        f"(tau_b={r.tau_b}, conc={r.conc}, disc={r.disc})"
    )
    assert r.n == n_kendall and r.tau_b is not None and r.tau_b > 0.05, (
        "planted positive association must surface"
    )

    # --- runs test: ~40 events/user; users divisible by 17 strictly
    # alternate high/low (too many runs -> z > 0, nonrandom) -----------
    per_user = 40
    uid = (F.col("id") / per_user).cast("long")
    seq = F.col("id") % per_user
    alternator = uid % 17 == 0
    val = F.when(
        alternator, F.when(seq % 2 == 0, 80.0).otherwise(20.0)
    ).otherwise((F.abs(F.xxhash64("id", F.lit(2))) % 10000).cast("double") / 100.0)
    ev = spark.range(n_runs).select(
        uid.alias("user_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
        val.alias("value"),
        F.col("id").cast("string").alias("event_id"),
    )
    rows, wall = _run(spark, fq.runs_test_user_values, ev)
    flagged = {r.user_id: r for r in rows if r.nonrandom}
    alts = [r for u, r in flagged.items() if u % 17 == 0]
    n_users = n_runs // per_user
    print(
        f"runs_test_user_values: {n_runs} events / {n_users} users -> "
        f"{len(rows)} scored, {len(flagged)} nonrandom "
        f"({len(alts)} planted alternators, all z>0: "
        f"{all(r.z_stat > 0 for r in alts)}) in {wall:.1f}s"
    )
    assert len(alts) >= (n_users + 16) // 17, "every planted alternator must flag"
    assert all(r.z_stat > 0 for r in alts), "alternators have too MANY runs"

    # --- benford: 70% UNIFORM magnitudes over [1.00, 100000.00] (first
    # digits near-uniform ~1/9 each — itself a Benford violation, the
    # "invented amounts" shape) + 30% planted 1xx.xx amounts -----------
    h3 = F.abs(F.xxhash64("id", F.lit(3)))
    spread = (h3 % 9999900 + 100).cast("double") / F.lit(100.0)
    planted = (h3 % 9999 + 10000).cast("double") / F.lit(100.0)  # 100.00-199.99
    li2 = spark.range(n_benford).select(
        F.when(h3 % 10 < 3, planted).otherwise(spread).alias("l_extendedprice")
    )
    rows, wall = _run(spark, fq.benford_first_digit_lineitem, li2)
    by_digit = {r.digit: r for r in rows}
    print(
        f"benford_first_digit_lineitem: {n_benford} rows -> 9 digits in "
        f"{wall:.1f}s (digit-1 share {by_digit[1].obs_share}, dev "
        f"{by_digit[1].dev_micro})"
    )
    assert by_digit[1].n_total == n_benford
    assert by_digit[1].over_represented, "planted leading-1 excess must show"
    # digit 1 carries the largest OVER-representation (the planted 30%
    # on top of the uniform baseline); digit 2 carries the largest
    # UNDER-representation (uniform ~11.1% vs Benford 17.6%)
    over = [r for r in rows if r.over_represented]
    assert max(over, key=lambda r: r.dev_micro).digit == 1

    # --- KS: 25M events a side — 12x past the OLD long-identity
    # ceiling (~2.1M a side), possible only since the decimal(38,0) /
    # HUGEINT widening; values live on a 1M-point grid (the shifted
    # side re-snaps to ~1.05M points -> ~2M distinct window rows), so
    # the single-partition ECDF window input is grid-bounded, and the
    # post-split distribution is shifted +5% -> D must flag ------------
    n_ks = n_benford
    half = n_ks // 2
    split = F.lit(fq._DRIFT_SPLIT).cast("timestamp")
    before = F.when(F.col("id") < half, 1).otherwise(0)
    h4 = F.abs(F.xxhash64("id", F.lit(4)))
    base_v = (h4 % 1_000_000).cast("double") / F.lit(10000.0)  # 4-decimal grid
    ev2 = spark.range(n_ks).select(
        F.when(
            before == 1, split - F.expr("INTERVAL 1 DAY")
        ).otherwise(split + F.expr("INTERVAL 1 DAY")).alias("ts"),
        F.when(before == 1, base_v).otherwise(base_v * 1.05).alias("value"),
    )
    rows, wall = _run(spark, fq.ks_test_periods, ev2)
    r = rows[0]
    print(
        f"ks_test_periods: {n_ks} events ({r.n_a}/{r.n_b} split) -> "
        f"D={r.ks_d} (ks_num={r.ks_num}) sig={r.sig_05} in {wall:.1f}s"
    )
    assert (r.n_a, r.n_b) == (half, n_ks - half)
    assert r.sig_05 and r.ks_d > 0.01, "planted +5% shift must flag"
    # ks_num is a VARCHAR-cast decimal since the r10 BIGINT-bound widen
    # (feature_queries.ks_test_periods) — compare as int
    assert int(r.ks_num) > 0

    # --- mann-whitney on the same drifted frame: 50M total is ~17x
    # past the OLD long effect-size identity ceiling (~3e6 total
    # events; the identity VALUE 2*u1x2*1e6 ~ 1.2e21 is ~130x past the
    # 9.2e18 LONG cap); the +5% post-split shift must give side A
    # (before, lower values) u1x2 < n1*n2 -> negative rank_biserial
    # and z, sig true --------------------------------------------------
    rows, wall = _run(spark, fq.mannwhitney_value_periods, ev2)
    r = rows[0]
    print(
        f"mannwhitney_value_periods: {n_ks} events -> z={r.z_stat} "
        f"rank_biserial={r.rank_biserial} sig={r.sig_05} in {wall:.1f}s"
    )
    assert (r.n_a, r.n_b) == (half, n_ks - half)
    assert r.sig_05 and r.z_stat < 0 and r.rank_biserial < 0, (
        "planted upward post-shift must rank side A lower"
    )
    print("SCREENS-STRESS OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
