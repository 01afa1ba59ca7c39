#!/usr/bin/env python
"""Stress the r10 screens at 100-500x fixture scale, running the EXACT
catalog formulations (load_table swapped for synthetic frames — the
stress_screens.py pattern) so the measured plan is the shipped plan:

- reciprocal_transfer_alerts over N transfers / U accounts: the claim
  under test is that cost is CHANNEL-equi-join bound — random traffic
  spreads over ~N distinct channels of ~1 transfer, so the join output
  is near-linear; planted ping-pong channels must surface in n_echo.
  A second phase plants ONE pathological channel with V transfers each
  way (a settlement-account pair) to measure the per-channel v_out ×
  v_back term honestly, the way SCALE.md §motif isolated the hub term
  — and (r11) runs the same channel through the DEFAULT channel_cap
  guard, asserting at-cap volumes survive and past-cap volumes vanish.
- velocity_limit_breaches over N events / U users: one user_id shuffle
  serves both RANGE frames + the re-aggregation; per-user cost linear
  in activity. Planted burst users (20 events in one hour) must flag.
- new_counterparty_rate over N events / U users: channel-window
  shuffle + (src, day) rollup. Planted activation-day users (day 15
  fans out to fresh counterparties) must surface with high new_share.
- amount_digit_entropy over N orders / C customers: (cust, ending)
  count shuffle + same-key window + re-agg. Planted scripted
  customers (one repeated ending) must read entropy 0.0.

Results go to SCALE.md §feature-engineering (r10 screens).

Usage: python tools/stress_r10_screens.py [n_transfers] [n_events] [n_orders]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import anti_money_laundering_spark.plans.feature_queries as fq  # noqa: E402
import anti_money_laundering_spark.plans.graph_queries as gq  # noqa: E402
from anti_money_laundering_spark.session import get_spark  # noqa: E402

_BASE_US = 1_700_000_000 * 1_000_000
_DAY_US = 86_400 * 1_000_000


def _run(mod, spark, fn, table, **kw):
    orig = mod.load_table
    mod.load_table = lambda _spark, _sf_dir, _t: table
    try:
        t0 = time.perf_counter()
        rows = fn(spark, "stress", **kw).collect()
        wall = time.perf_counter() - t0
    finally:
        mod.load_table = orig
    return rows, wall


def main() -> int:
    n_transfers = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000_000
    n_orders = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000_000
    spark = get_spark(app_name="r10_screens_stress", shuffle_partitions=64)

    # --- reciprocal: random channels over 500k accounts + 10k planted
    # ping-pong channel pairs (account a <-> 500000+a, out at t, echo
    # back at t+1h for 90% of the amount, 10 rounds each) -------------
    h = F.abs(F.xxhash64("id"))
    h2 = F.abs(F.xxhash64("id", F.lit(1)))
    span_us = 30 * _DAY_US
    noise = spark.range(n_transfers).select(
        (h % 500_000).alias("user_id"),
        F.concat(F.lit('{"k": '), (h2 % 500_000).cast("string"), F.lit("}")).alias(
            "props"
        ),
        F.expr(f"timestamp_micros(cast({_BASE_US} + id * ({span_us} / {n_transfers}) as long))").alias("ts"),
        ((h % 9000) / F.lit(100.0) + 10.0).alias("value"),
        F.col("id").alias("event_id"),
        F.lit("transfer").alias("event_type"),
    )
    p = F.col("id") % 10_000  # planted channel index
    out_leg = spark.range(100_000).select(
        p.alias("user_id"),
        F.concat(F.lit('{"k": '), (p + 500_000).cast("string"), F.lit("}")).alias("props"),
        F.expr(
            f"timestamp_micros(cast({_BASE_US} + (id % 10000) * 1000000 "
            f"+ cast(id / 10000 as long) * {2 * 3_600_000_000} as long))"
        ).alias("ts"),
        F.lit(100.00).alias("value"),
        (F.lit(2_000_000_000) + F.col("id")).alias("event_id"),
        F.lit("transfer").alias("event_type"),
    )
    back_leg = spark.range(100_000).select(
        (p + 500_000).alias("user_id"),
        F.concat(F.lit('{"k": '), p.cast("string"), F.lit("}")).alias("props"),
        F.expr(
            f"timestamp_micros(cast({_BASE_US} + (id % 10000) * 1000000 "
            f"+ cast(id / 10000 as long) * {2 * 3_600_000_000} + {3_600_000_000} as long))"
        ).alias("ts"),
        F.lit(90.00).alias("value"),
        (F.lit(3_000_000_000) + F.col("id")).alias("event_id"),
        F.lit("transfer").alias("event_type"),
    )
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    transfers = noise.select(cols).unionByName(out_leg.select(cols)).unionByName(
        back_leg.select(cols)
    )
    rows, wall = _run(gq, spark, gq.reciprocal_transfer_alerts, transfers)
    planted = [r for r in rows if r.src < 10_000 and r.dst == r.src + 500_000]
    print(
        f"reciprocal: {n_transfers + 200_000} transfers / 500k accounts -> "
        f"{len(rows)} channels in {wall:.1f}s; planted echo channels "
        f"recovered {len(planted)}/10000, echo rounds "
        f"{sorted(set(r.n_echo for r in planted))}"
    )
    assert len(planted) == 10_000
    # each planted channel: 10 rounds, back legs 1h after their out leg
    # and 2h before the NEXT out leg -> within 48h a back leg answers
    # its own round's out plus earlier rounds; n_echo >= 10 per channel
    assert all(r.n_echo >= 10 for r in planted)

    # --- reciprocal pathological channel: V transfers EACH WAY on one
    # channel inside one window -> v_out x v_back pair term ------------
    for v in (1_000, 5_000):
        hot_out = spark.range(v).select(
            F.lit(1).cast("long").alias("user_id"),
            F.lit('{"k": 2}').alias("props"),
            F.expr(f"timestamp_micros(cast({_BASE_US} + id * 1000 as long))").alias("ts"),
            F.lit(100.00).alias("value"),
            F.col("id").alias("event_id"),
            F.lit("transfer").alias("event_type"),
        )
        hot_back = spark.range(v).select(
            F.lit(2).cast("long").alias("user_id"),
            F.lit('{"k": 1}').alias("props"),
            # NB plain digits: SQL text does not accept Python's
            # underscore numeric literals (parsed as an identifier)
            F.expr(
                f"timestamp_micros(cast({_BASE_US} + 500000000 + id * 1000 as long))"
            ).alias("ts"),
            F.lit(95.00).alias("value"),
            (F.lit(1_000_000) + F.col("id")).alias("event_id"),
            F.lit("transfer").alias("event_type"),
        )
        hot = hot_out.select(cols).unionByName(hot_back.select(cols))
        # uncapped (cap lifted past the volume): the honest quadratic
        rows, wall = _run(
            gq, spark, gq.reciprocal_transfer_alerts, hot, channel_cap=2**62
        )
        r = {(x.src, x.dst): x for x in rows}[(1, 2)]
        # default cap (r11 guard): an at-cap volume stays; a past-cap
        # settlement rail must vanish structurally. Read the cap from
        # the module so a retune can't silently skew the assertion.
        cap = gq._RECIPROCAL_CHANNEL_CAP
        rows_c, wall_c = _run(gq, spark, gq.reciprocal_transfer_alerts, hot)
        capped_keys = {(x.src, x.dst) for x in rows_c}
        expected = {(1, 2)} if v <= cap else set()
        assert capped_keys == expected, (v, cap, capped_keys)
        print(
            f"reciprocal hot-channel: {v} out x {v} back (one channel, one window) "
            f"-> {r.n_roundtrips} pairs in {wall:.1f}s uncapped; "
            f"default cap({cap}) -> {len(rows_c)} channels in {wall_c:.1f}s"
        )

    # --- velocity: ~50 events/user over 30 days; users % 1000 == 0
    # burst 20 events into one hour on day 15 --------------------------
    u = F.abs(F.xxhash64("id", F.lit(2))) % 1_000_000
    base_ev = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.expr(
            f"timestamp_micros(cast({_BASE_US} + (abs(xxhash64(id, 3)) % {30 * _DAY_US}) as long))"
        ).alias("ts"),
        u.alias("user_id"),
        F.lit("transfer").alias("event_type"),
        ((F.abs(F.xxhash64("id", F.lit(4))) % 2000) / F.lit(100.0)).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    n_burst_users = 2_000
    burst = spark.range(n_burst_users * 20).select(
        (F.lit(5_000_000_000) + F.col("id")).alias("event_id"),
        F.expr(
            f"timestamp_micros(cast({_BASE_US} + {15 * _DAY_US} "
            f"+ (id % 20) * {3_000_000} as long))"
        ).alias("ts"),
        (F.lit(2_000_000) + (F.col("id") / 20).cast("long")).alias("user_id"),
        F.lit("transfer").alias("event_type"),
        F.lit(1.00).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    ev = base_ev.unionByName(burst)
    rows, wall = _run(fq, spark, fq.velocity_limit_breaches, ev)
    flagged_burst = [r for r in rows if r.user_id >= 2_000_000]
    print(
        f"velocity: {n_events + n_burst_users * 20} events / 1M users -> "
        f"{len(rows)} breaching users in {wall:.1f}s; planted burst users "
        f"flagged {len(flagged_burst)}/{n_burst_users} "
        f"(organic flags = calibration: {len(rows) - len(flagged_burst)})"
    )
    assert len(flagged_burst) == n_burst_users
    assert all(r.n_count_breaches >= 18 for r in flagged_burst)

    # --- new counterparty: organic users repeat a 5-channel habit set;
    # users >= 3e6 fan out to 50 FRESH counterparties on day 15 --------
    habit = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.expr(
            f"timestamp_micros(cast({_BASE_US} + (abs(xxhash64(id, 5)) % {30 * _DAY_US}) as long))"
        ).alias("ts"),
        (F.abs(F.xxhash64("id", F.lit(6))) % 1_000_000).alias("user_id"),
        F.lit("transfer").alias("event_type"),
        F.lit(1.00).alias("value"),
        F.concat(
            F.lit('{"k": '),
            (F.abs(F.xxhash64("id", F.lit(7))) % 5).cast("string"),
            F.lit("}"),
        ).alias("props"),
    )
    n_mules = 1_000
    fanout = spark.range(n_mules * 50).select(
        (F.lit(6_000_000_000) + F.col("id")).alias("event_id"),
        F.expr(
            f"timestamp_micros(cast({_BASE_US} + {15 * _DAY_US} "
            f"+ (id % 50) * {60_000_000} as long))"
        ).alias("ts"),
        (F.lit(3_000_000) + (F.col("id") / 50).cast("long")).alias("user_id"),
        F.lit("transfer").alias("event_type"),
        F.lit(1.00).alias("value"),
        F.concat(F.lit('{"k": '), (F.lit(7_000_000) + F.col("id")).cast("string"), F.lit("}")).alias("props"),
    )
    ev2 = habit.unionByName(fanout)
    # time with count() — the output is ~N/2 (user, day) rows and a
    # driver collect of 24M rows would dominate the reading (observed:
    # 248 s collect vs the count-timed plan); assert on the planted
    # slice only
    orig = fq.load_table
    fq.load_table = lambda _spark, _sf_dir, _t: ev2
    try:
        t0 = time.perf_counter()
        n_rows = fq.new_counterparty_rate(spark, "stress").count()
        wall = time.perf_counter() - t0
        mule_days = (
            fq.new_counterparty_rate(spark, "stress")
            .filter(F.col("src") >= 3_000_000)
            .collect()
        )
    finally:
        fq.load_table = orig
    print(
        f"new_counterparty: {n_events + n_mules * 50} events -> "
        f"{n_rows} (user, day) rows in {wall:.1f}s (count-timed); planted "
        f"activation days {len(mule_days)}/{n_mules}, new_share all 1.0: "
        f"{all(r.new_share == 1.0 for r in mule_days)}"
    )
    assert len(mule_days) == n_mules
    assert all(r.n_new == 50 for r in mule_days)

    # --- digit entropy: organic endings uniform-ish; customers >= 2e6
    # repeat ONE ending (scripted template) ----------------------------
    org = spark.range(n_orders).select(
        (F.abs(F.xxhash64("id", F.lit(8))) % 1_000_000).alias("o_custkey"),
        F.col("id").alias("o_orderkey"),
        (
            (F.abs(F.xxhash64("id", F.lit(9))) % 1_000_000) / F.lit(100.0) + 1.0
        ).alias("o_totalprice"),
    )
    n_script = 2_000
    scripted = spark.range(n_script * 8).select(
        (F.lit(2_000_000) + (F.col("id") / 8).cast("long")).alias("o_custkey"),
        (F.lit(8_000_000_000) + F.col("id")).alias("o_orderkey"),
        ((F.col("id") % 8) * 100.0 + 49.99).alias("o_totalprice"),
    )
    orders = org.unionByName(scripted)
    rows, wall = _run(fq, spark, fq.amount_digit_entropy, orders)
    script_rows = [r for r in rows if r.o_custkey >= 2_000_000]
    print(
        f"digit_entropy: {n_orders + n_script * 8} orders -> {len(rows)} "
        f"customers in {wall:.1f}s; scripted accounts {len(script_rows)}/"
        f"{n_script}, entropy all 0.0: "
        f"{all(r.ending_entropy == 0.0 for r in script_rows)}"
    )
    assert len(script_rows) == n_script
    assert all(r.ending_entropy == 0.0 and r.n_endings == 1 for r in script_rows)

    stress_sorted_neighborhood(spark, n_transfers)
    return 0


def stress_sorted_neighborhood(spark, n_records: int) -> None:
    """20M-record sorted-neighborhood pairing: the claim under test is
    that the dense_index rank (range shuffle + per-partition windows)
    + bucket SMJ stays near-linear — no single-task global window —
    and that planted equi-blocking-invisible twins (same balance,
    DIFFERENT nation, adjacent custkeys) land in the candidate set."""
    import anti_money_laundering_spark.plans.linkage_queries as lq

    h = F.abs(F.xxhash64("id", F.lit(10)))
    base = spark.range(n_records).select(
        (F.col("id") * 2).alias("c_custkey"),
        F.element_at(
            F.array(*[F.lit(s) for s in ("AUTOMOBILE", "BUILDING", "FURNITURE")]),
            (h % 3 + 1).cast("int"),
        ).alias("c_mktsegment"),
        ((h % 99_000_000) / 100.0).alias("c_acctbal"),
        (h % 25).alias("c_nationkey"),
    )
    n_twins = 10_000
    # twin of record 2k: custkey 4k*? — use odd keys so twins never
    # collide with base keys; SAME balance as a hash-chosen value,
    # different nation => only the sorted window can catch the pair
    twins = spark.range(n_twins).select(
        (F.col("id") * 2 + 1).alias("c_custkey"),
        F.lit("MACHINERY").alias("c_mktsegment"),
        ((F.abs(F.xxhash64((F.col("id") * 2), F.lit(10))) % 99_000_000) / 100.0).alias(
            "c_acctbal"
        ),
        F.lit(99).alias("c_nationkey"),
    )
    cust = base.unionByName(twins)
    orig = lq.load_table
    lq.load_table = lambda _spark, _sf_dir, _t: cust
    try:
        # the r12 duplicated-subtree A/B (r11 verdict item 2): the
        # checkpoint-free default re-derives the index subtree per
        # join branch; cache_ranked=True persists the ranked frame
        # lazily so both branches read one InMemoryTableScan. One
        # UNTIMED warmup pass first so neither timed variant absorbs
        # JVM/codegen warmup (review finding: the cold-first ordering
        # overstated the persist penalty ~2x vs order-controlled
        # pairs), then time both at the same 20M input.
        lq.linkage_sorted_neighborhood(spark, "stress").count()
        t0 = time.perf_counter()
        n_pairs_cached = lq.linkage_sorted_neighborhood(
            spark, "stress", cache_ranked=True
        ).count()
        wall_cached = time.perf_counter() - t0
        spark.catalog.clearCache()
        # one plan, two actions: the lazy checkpoint materializes at the
        # timed count and the twin filter reuses it (without it the 36 s
        # rank+SMJ pipeline would execute twice — review finding)
        cand = lq.linkage_sorted_neighborhood(spark, "stress").localCheckpoint(
            eager=False
        )
        t0 = time.perf_counter()
        n_pairs = cand.count()
        wall = time.perf_counter() - t0
        caught = cand.filter(
            (F.col("bal_gap_cents") == 0)
            & ((F.col("uid_l") % 2 == 1) | (F.col("uid_r") % 2 == 1))
        ).count()
    finally:
        lq.load_table = orig
    assert n_pairs_cached == n_pairs
    print(
        f"sorted_neighborhood: {n_records + n_twins} records -> {n_pairs} "
        f"candidate pairs in {wall:.1f}s (count-timed; recompute default) vs "
        f"{wall_cached:.1f}s with cache_ranked=True — recompute premium "
        f"{wall / max(wall_cached, 1e-9):.2f}x; planted same-balance "
        f"cross-nation twins in candidates: {caught} (>= {n_twins} expected "
        f"incl. organic same-cent collisions)"
    )
    assert n_pairs == 3 * (n_records + n_twins) - 6
    # a twin is missed only if >= 3 ORGANIC records share its exact
    # cent value AND all sort between it and its base (Poisson(~0.2)
    # tail ~1e-3 per twin) — assert the 99% floor, not exact recall
    assert caught >= int(n_twins * 0.99)


if __name__ == "__main__":
    raise SystemExit(main())
