"""Investigator triage workflow: what an AML analyst runs AFTER the
alert fires — the expand-and-contextualize loop the screens feed
(the screens themselves are the retrospective surface in
examples/reference_workflow.py and the always-on surface in
examples/streaming_monitor.py).

Stages (each a plain library/catalog composition — no new operators):
1. case seeds — accounts flagged by the fan-in structuring motif
   (the reference's own alert grain, 01_aml_network_analysis.py
   structuring levels) plus any account that moved a single large
   transfer (the tracing screen's seed rule).
2. follow the money — ``graph.temporal_reachability`` from the case
   seeds over the flow graph: every account the funds COULD have
   reached within 3 time-respecting hops, with min hops and earliest
   arrival (static connectivity would overstate reach — a hop before
   the money arrived traces nothing).
3. context join — which reached accounts are THEMSELVES flagged
   funnels (pass-through screen), so the analyst sees onward-routing
   risk inside the traced perimeter.
4. carousel check — the round-trip filter over the SAME case seeds
   (raw temporal_reachability levels, node == seed at hop >= 2): case
   accounts whose movement can RETURN to them through intermediaries
   (the loop the pairwise reciprocal screen cannot see; the catalog's
   funds_roundtrip_alerts is the standalone screen form over
   large-mover seeds).
5. corridor context — the trade-book geographic screen
   (corridor_concentration_alerts) for the entity's TBML review tab.

Run: python examples/investigation_workflow.py [sf_dir]
(defaults to /root/testdata/sf0.001; prints one row-count line per
stage, exits 0 on success). The onward-funnel intersection is
legitimately empty at sf0.001 (10 seeds, sparse graph); sf0.01 traces
124 case seeds across 2,637 (seed, account) reach rows, 26 DISTINCT
reached accounts are pass-through flagged, and 14 case seeds have a
time-respecting round trip.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from anti_money_laundering_spark.graph import temporal_reachability  # noqa: E402
from anti_money_laundering_spark.plans.catalog import get_catalog  # noqa: E402
from anti_money_laundering_spark.plans.fixture_graphs import flow_graph  # noqa: E402
from anti_money_laundering_spark.plans.graph_queries import (  # noqa: E402
    _TRACE_SEED_MIN,
)
from anti_money_laundering_spark.session import get_spark  # noqa: E402
from anti_money_laundering_spark.sources import load_table  # noqa: E402


def run_stages(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    """Execute the five triage stages; returns per-stage row counts."""
    catalog = get_catalog()

    # 1. case seeds: fan-in motif middles + large-transfer senders
    # (the SAME trigger constant as funds_tracing_alerts — imported,
    # not restated, so the example cannot drift from the screen).
    motif = catalog["motif_fanin_structuring"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    large = (
        ev.filter(F.col("value") > _TRACE_SEED_MIN)
        .select(F.col("user_id").alias("seed"))
    )
    seeds = (
        motif.select(F.col("c_id").alias("seed")).unionByName(large).distinct()
    )

    # 2. follow the money: 3-hop time-respecting reach over the SHARED
    # flow graph (fixture_graphs.flow_graph — the same edge derivation
    # every flow screen uses), with event time as integer micros. The
    # raw exact-hop levels are computed ONCE and both faces derive
    # from them (review finding: a separate aggregated call would run
    # the hop-join pyramid twice).
    edges = flow_graph(spark, sf_dir).edges.select(
        "src", "dst", F.unix_micros("ts").alias("us")
    )
    lv = temporal_reachability(edges, seeds, max_hops=3, aggregate=False)
    reach = lv.groupBy("seed", "node").agg(
        F.min("hop").alias("min_hops"),
        F.min("us").cast("long").alias("first_us"),
    )

    # 3. context: DISTINCT traced accounts that are flagged funnels
    # themselves (a funnel reached from several case seeds counts
    # once — review finding: the raw join is (seed, node) pairs).
    funnels = catalog["passthrough_funds_alerts"].fn(spark, sf_dir)
    hot = (
        reach.join(
            funnels.select(F.col("mid").alias("node"), "n_passthrough"), "node"
        )
        .select("node")
        .distinct()
    )

    # 4. carousel check over the CASE seeds (not just the screen's
    # large-mover seeds — a motif middle with a loop must be caught
    # too): the same raw levels, filtered to time-respecting
    # self-returns through >= 1 intermediary.
    loops = (
        lv.filter((F.col("node") == F.col("seed")) & (F.col("hop") >= 2))
        .select("seed")
        .distinct()
    )

    # 5. TBML tab: the corridor screen over the trade book.
    corridors = catalog["corridor_concentration_alerts"].fn(spark, sf_dir)

    return {
        "case_seeds": seeds.count(),
        "traced_reach": reach.count(),
        "onward_funnels": hot.count(),
        "roundtrip_seeds": loops.count(),
        "corridor_alerts": corridors.count(),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="investigation_workflow")
    counts = run_stages(spark, sf_dir)
    print(f"case_seeds: {counts['case_seeds']} accounts (motif middles + large movers)")
    print(f"traced_reach: {counts['traced_reach']} (seed, account) rows within 3 hops")
    print(f"onward_funnels: {counts['onward_funnels']} traced accounts are pass-through flagged")
    print(f"roundtrip_seeds: {counts['roundtrip_seeds']} case seeds whose funds can return to them")
    print(f"corridor_alerts: {counts['corridor_alerts']} over-concentrated trade corridors")
    assert counts["case_seeds"] > 0 and counts["traced_reach"] > 0
    assert counts["corridor_alerts"] > 0
    print("investigation workflow OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
