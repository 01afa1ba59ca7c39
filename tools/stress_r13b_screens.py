#!/usr/bin/env python
"""Stress the two r13-new AML screens at 100-1000x fixture scale with
the EXACT catalog formulations (load_table swap, the stress_screens.py
pattern):

- corridor_concentration_alerts over 50M lineitems / 10M orders / 1M
  customers / 100k suppliers / 25 nations: a planted hot corridor
  (nation 7 -> nation 13: ~2% of all rows into one of 625 cells,
  ~13x its uniform share) must flag; the
  organic alert count under a UNIFORM trade mix is reported as
  calibration (uniform corridors hug the mean, so the 1.25x line
  should stay quiet or nearly so).
- funds_tracing_alerts over 50M events / 500k users (~6.6% flow-edge
  band, matching the fixture's sparsity): 5k planted seed accounts
  whose onward reach rides organic noise edges, plus one planted
  3-hop layering chain through mule accounts that only the planted
  edges touch — its (1, 2, 3)-hop rows and exact first arrivals are
  asserted; per-seed reach stats are reported as the frontier-growth
  calibration (the scale question for a 3-hop trace is frontier
  fan-out, not edge count).

Noise dimensions use INDEPENDENT hashes (the r12 generator-
independence lesson). Each screen gets one untimed warmup pass before
its recorded wall (the r13 measurement-ordering lesson); results go
to SCALE.md §r13-corridor-tracing.

Usage: python tools/stress_r13b_screens.py [n_lineitems] [n_events]
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
from tools.stress_r12_screens import _BASE_US  # noqa: E402

_N_CUST = 1_000_000
_N_SUPP = 100_000
_N_NATIONS = 25
_HOT_CUST_NATION = 7
_HOT_SUPP_NATION = 13


def _run_tables(module, spark, fn, tables, warmup=True):
    # patch BOTH load_table seams: the plan module's own import and
    # fixture_graphs' (the tracing screens derive edges through
    # fixture_graphs.flow_graph — the shared flow-edge rule)
    import anti_money_laundering_spark.plans.fixture_graphs as fg

    orig, orig_fg = module.load_table, fg.load_table
    module.load_table = fg.load_table = lambda _spark, _sf_dir, t: tables[t]
    try:
        if warmup:
            fn(spark, "stress").collect()
        t0 = time.perf_counter()
        rows = fn(spark, "stress").collect()
        return rows, time.perf_counter() - t0
    finally:
        module.load_table, fg.load_table = orig, orig_fg


def _corridor_tables(spark, n_lineitems: int):
    nation = spark.range(_N_NATIONS).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
        F.lit(0).alias("n_regionkey"),
    )
    customer = spark.range(_N_CUST).select(
        F.col("id").alias("c_custkey"),
        (F.col("id") % _N_NATIONS).cast("int").alias("c_nationkey"),
    )
    supplier = spark.range(_N_SUPP).select(
        F.col("id").alias("s_suppkey"),
        (F.col("id") % _N_NATIONS).cast("int").alias("s_nationkey"),
    )
    n_orders = n_lineitems // 5
    ho = F.abs(F.xxhash64("id", F.lit(3)))
    orders = spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        (ho % _N_CUST).alias("o_custkey"),
    )
    hl = F.abs(F.xxhash64("id", F.lit(4)))
    hp = F.abs(F.xxhash64("id", F.lit(5)))
    noise_li = spark.range(n_lineitems).select(
        (F.col("id") % n_orders).alias("l_orderkey"),
        (hl % _N_SUPP).alias("l_suppkey"),
        ((hp % 100_000) / 100.0 + 1.0).alias("l_extendedprice"),
    )
    # planted hot corridor: customers fixed in nation 7 order from
    # suppliers fixed in nation 13 at the same price law — ~2% extra
    # rows into ONE of 625 corridors ~ 13x its uniform share
    n_hot = max(n_lineitems // 50, 1)
    hh = F.abs(F.xxhash64("id", F.lit(6)))
    hot_orders = spark.range(n_orders, n_orders + n_hot // 5 + 1).select(
        F.col("id").alias("o_orderkey"),
        ((F.abs(F.xxhash64("id", F.lit(7))) % (_N_CUST // _N_NATIONS))
         * _N_NATIONS + _HOT_CUST_NATION).alias("o_custkey"),
    )
    hot_li = spark.range(n_hot).select(
        (n_orders + F.col("id") % (n_hot // 5 + 1)).alias("l_orderkey"),
        ((hh % (_N_SUPP // _N_NATIONS)) * _N_NATIONS + _HOT_SUPP_NATION
         ).alias("l_suppkey"),
        ((F.abs(F.xxhash64("id", F.lit(8))) % 100_000) / 100.0 + 1.0
         ).alias("l_extendedprice"),
    )
    return {
        "nation": nation,
        "customer": customer,
        "supplier": supplier,
        "orders": orders.unionByName(hot_orders),
        "lineitem": noise_li.unionByName(hot_li),
    }


def stress_corridor(spark, n_lineitems: int) -> None:
    tables = _corridor_tables(spark, n_lineitems)
    rows, wall = _run_tables(fq, spark, fq.corridor_concentration_alerts, tables)
    hot_name_c = f"NATION_{_HOT_CUST_NATION}"
    hot_name_s = f"NATION_{_HOT_SUPP_NATION}"
    hot = [r for r in rows if (r.cust_nation, r.supp_nation) == (hot_name_c, hot_name_s)]
    organic = len(rows) - len(hot)
    print(
        f"corridor: {n_lineitems + n_lineitems // 50} lineitems / "
        f"{_N_CUST} customers / {_N_SUPP} suppliers / 625 corridors; "
        f"planted 2%-of-rows corridor ({hot_name_c} -> {hot_name_s}) "
        f"{'FLAGGED' if hot else 'MISSED'} "
        f"(cents={hot[0].corridor_cents if hot else 0}, "
        f"n_txns={hot[0].n_txns if hot else 0}); organic alerts under "
        f"the uniform mix: {organic}; wall {wall:.1f}s (warm)"
    )
    assert hot, rows[:5]


def _tracing_events(spark, n_events: int):
    # noise: value 1..150 => ~6.6% above the 140 flow band (matches
    # fixture sparsity), NO organic seed (cap < 200); independent
    # user / counterparty / value hashes
    hu = F.abs(F.xxhash64("id", F.lit(11)))
    hk = F.abs(F.xxhash64("id", F.lit(12)))
    hv = F.abs(F.xxhash64("id", F.lit(13)))
    span_us = 30 * 86_400_000_000
    noise = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.expr(
            f"timestamp_micros(cast({_BASE_US} + id * ({span_us} / {n_events}) as long))"
        ).alias("ts"),
        (hu % 500_000).alias("user_id"),
        ((hv % 14_900) / 100.0 + 1.0).alias("value"),
        F.concat(F.lit('{"k": '), (hk % 500_000), F.lit("}")).alias("props"),
    )
    # 5k planted seed accounts (ids 900_000+): one >200 transfer each
    # into a random organic user — their 2+/3-hop reach rides noise
    seeds = spark.range(5_000).select(
        (F.lit(8_000_000_000) + F.col("id")).alias("event_id"),
        F.expr(
            f"timestamp_micros(cast({_BASE_US} + id * 1000000 as long))"
        ).alias("ts"),
        (F.lit(900_000) + F.col("id")).alias("user_id"),
        F.lit(250.0).alias("value"),
        F.concat(
            F.lit('{"k": '), F.abs(F.xxhash64("id", F.lit(14))) % 500_000, F.lit("}")
        ).alias("props"),
    )
    # one planted 3-hop layering chain through mule-only accounts:
    # 990000 -(300)-> 995001 -(150)-> 995002 -(150)-> 995003, 1h apart
    t0 = _BASE_US + 10 * 86_400_000_000
    h_us = 3_600_000_000
    chain = spark.createDataFrame(
        [
            (9_100_000_001, t0, 990_000, 300.0, '{"k": 995001}'),
            (9_100_000_002, t0 + h_us, 995_001, 150.0, '{"k": 995002}'),
            (9_100_000_003, t0 + 2 * h_us, 995_002, 150.0, '{"k": 995003}'),
        ],
        "event_id long, ts_us long, user_id long, value double, props string",
    ).select(
        "event_id",
        F.expr("timestamp_micros(ts_us)").alias("ts"),
        "user_id",
        "value",
        "props",
    )
    return noise.unionByName(seeds).unionByName(chain), t0, h_us


def stress_tracing(spark, n_events: int) -> None:
    ev, t0, h_us = _tracing_events(spark, n_events)
    rows, wall = _run_tables(
        gq, spark, gq.funds_tracing_alerts, {"events": ev}
    )
    chain = {r.node: r for r in rows if r.seed == 990_000}
    by_seed: dict[int, int] = {}
    for r in rows:
        by_seed[r.seed] = by_seed.get(r.seed, 0) + 1
    reach = sorted(by_seed.values())
    n_seeds = len(reach)
    print(
        f"tracing: {n_events} events / 500k users / ~6.6% flow band; "
        f"{n_seeds} seeds traced, output {len(rows)} (seed, node) rows; "
        f"per-seed 3-hop reach p50/p95/max = "
        f"{reach[n_seeds // 2]}/{reach[int(n_seeds * 0.95)]}/{reach[-1]}; "
        f"planted chain hops = "
        f"{[chain.get(n) and chain[n].min_hops for n in (995_001, 995_002, 995_003)]}; "
        f"wall {wall:.1f}s (warm)"
    )
    assert (chain[995_001].min_hops, chain[995_001].first_us) == (1, t0)
    assert (chain[995_002].min_hops, chain[995_002].first_us) == (2, t0 + h_us)
    assert (chain[995_003].min_hops, chain[995_003].first_us) == (3, t0 + 2 * h_us)


def stress_watchlist(spark, n_customers: int) -> None:
    """Stress the SymSpell deletion-neighborhood screening join
    list-vs-base: n_customers synthetic digit-string names probed
    against a 0.5% watchlist. Digit-string names are an ADVERSARIALLY
    dense edit-distance space (every name has dozens of distance-1
    neighbors), so hit volume and candidate pressure are far above
    realistic name data — an upper-bound stress, not a calibration.
    A planted typo pair pins recall at scale."""
    import anti_money_laundering_spark.plans.sketch_queries as sq

    base = spark.range(n_customers).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("ENTITY "), F.col("id") + 10_000_000).alias("c_name"),
    )
    planted = spark.createDataFrame(
        [
            (n_customers * 2 * 199, "ZZQ HOLDING CO"),     # listed
            (n_customers * 2 + 1, "ZZQ HOLDINGS CO"),      # dist-1 typo
            (n_customers * 2 + 2, "ZZQ TRADING CO"),       # dist>1: miss
        ],
        "c_custkey long, c_name string",
    )
    cust = base.unionByName(planted)
    rows, wall = _run_tables(
        sq, spark, sq.watchlist_screen_hits, {"customer": cust}
    )
    listed = n_customers * 2 * 199
    plant_hits = sorted(
        (r.cust_id, r.dist) for r in rows if r.list_id == listed
    )
    # base ids 0..n_customers-1 divisible by 199, plus the planted
    # listed entry (review finding: // undercounted by one)
    n_list = (n_customers + 198) // 199 + 1
    print(
        f"watchlist: {n_customers + 3} names / {n_list} listed; "
        f"{len(rows)} hits in {wall:.1f}s (warm; digit-string name "
        f"space — dozens of d1 neighbors per name, an upper-bound "
        f"load); planted listed entity hits: {plant_hits}"
    )
    assert plant_hits == [(n_customers * 2 + 1, 1), (listed, 0)], plant_hits


def stress_tracing_ab(spark, n_events: int, n_pairs: int = 3) -> None:
    """Order-controlled A/B of the level-prefix recompute (default)
    vs persist_levels=True, per the r12 cache-trade protocol: one
    untimed warmup of BOTH modes first, then ``n_pairs`` alternating
    timed pairs; cache cleared after every persist run so no pair
    contaminates the next. (The recorded SCALE.md verdict pooled 9
    pairs across a 3-pair and a 6-pair run of this protocol.)"""
    import anti_money_laundering_spark.plans.fixture_graphs as fg

    ev, _t0, _h = _tracing_events(spark, n_events)
    orig, orig_fg = gq.load_table, fg.load_table
    gq.load_table = fg.load_table = lambda _spark, _sf_dir, _t: ev

    def run(persist: bool) -> float:
        t0 = time.perf_counter()
        n = gq.funds_tracing_alerts(spark, "stress", persist_levels=persist).count()
        wall = time.perf_counter() - t0
        if persist:
            spark.catalog.clearCache()
        assert n > 0
        return wall

    try:
        run(False), run(True)  # untimed warmup of BOTH paths
        pairs = [(run(False), run(True)) for _ in range(n_pairs)]
    finally:
        gq.load_table, fg.load_table = orig, orig_fg
    import statistics

    rec = statistics.median(p[0] for p in pairs)
    per = statistics.median(p[1] for p in pairs)
    print(
        f"tracing-ab: {n_events} events; recompute median "
        f"{rec:.1f}s vs persist_levels {per:.1f}s over {len(pairs)} warm "
        f"alternating pairs ({['%.1f/%.1f' % p for p in pairs]})"
    )


def main() -> int:
    n_lineitems = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000_000
    spark = get_spark(app_name="r13b_screen_stress", shuffle_partitions=64)
    phases = sys.argv[3].split(",") if len(sys.argv) > 3 else [
        "corridor", "tracing", "tracing_ab", "watchlist",
    ]
    if "corridor" in phases:
        stress_corridor(spark, n_lineitems)
    if "tracing" in phases:
        stress_tracing(spark, n_events)
    if "tracing_ab" in phases:
        n_pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
        stress_tracing_ab(spark, n_events, n_pairs)
    if "watchlist" in phases:
        stress_watchlist(spark, n_events // 5)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
