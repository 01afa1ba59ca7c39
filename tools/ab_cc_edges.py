#!/usr/bin/env python
"""A/B the connected-components bidirectional edge storage (r6 verdict
item 6): checkpoint-once ("bi") vs re-derive-per-round ("recompute"),
interleaved passes on the 10M-edge synthetic power-law graph. Records
wall + rounds per pass; SCALE.md §CC takes the medians.

Usage: python tools/ab_cc_edges.py [n_edges] [n_vertices] [passes]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anti_money_laundering_spark.graph.components import connected_components  # noqa: E402
from anti_money_laundering_spark.session import get_spark  # noqa: E402
from tools.stress_graph import synth_graph  # noqa: E402


def main() -> int:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_vertices = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="cc_edge_ab", shuffle_partitions=64)
    g = synth_graph(spark, n_edges, n_vertices)
    # warmup (JIT/codegen) once per variant
    walls: dict[str, list[float]] = {"bi": [], "recompute": []}
    for p in range(passes + 1):
        for variant in ("bi", "recompute"):
            stats: dict = {}
            t0 = time.perf_counter()
            cc = connected_components(
                g,
                max_iter=30,
                stats=stats,
                join_rounds=True,
                edge_storage=variant,
                # this harness A/Bs the LOOP's storage variants; the
                # small-graph collapse would replace the loop outright
                # at small synth sizes
                collapse_rows=None,
            )
            n = cc.count()
            wall = time.perf_counter() - t0
            if p > 0:  # pass 0 is warmup
                walls[variant].append(wall)
            print(
                f"pass={p} variant={variant} wall={wall:.1f}s rounds={stats['rounds']} "
                f"rows={n} round_s={stats['round_seconds']}",
                flush=True,
            )
    for v, s in walls.items():
        print(f"MEDIAN {v}: {statistics.median(s):.1f}s over {len(s)} passes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
