#!/usr/bin/env python
"""Scaling sweep: run bench.py across fixture SFs and core counts and
write SCALING.md — the measured answer to "does the plan scale?".

Two curves:
- **data scaling** (local[32], sf 0.001 → 0.01 → 0.1): headline total
  vs rows. Linear-ish growth past the fixed-overhead floor means no
  operator is super-linear on the fixture shapes.
- **core scaling** (sf0.1, local[8] vs local[32]): parallel speedup on
  the same data. A flat line would mean driver-bound plans; the
  sub-linear-but-real speedup measures how much of the wall is
  parallelizable work vs per-job scheduling floor at this tiny SF.

Each cell is bench.py's min-of-N protocol in a FRESH process (cold JVM,
same as the driver's measurement), so cells are comparable.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PASSES = os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")


def run_bench(sf_dir: str, cpus: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=cpus,
        SPARK_GRAFT_BENCH_PASSES=PASSES,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    cells: list[dict] = []
    for sf in ("0.001", "0.01", "0.1"):
        r = run_bench(f"/root/testdata/sf{sf}", "32")
        cells.append({"sf": sf, "cpus": 32, **{"total": r["value"], "queries": r["queries"]}})
        print(json.dumps(cells[-1]))
    r = run_bench("/root/testdata/sf0.1", "8")
    cells.append({"sf": "0.1", "cpus": 8, "total": r["value"], "queries": r["queries"]})
    print(json.dumps(cells[-1]))

    lines = [
        "# SCALING — measured headline totals across SF and cores",
        "",
        f"bench.py protocol (warmup + min of {PASSES} passes, fresh process per cell).",
        "",
        "| sf | cores | headline total (s) |",
        "|---|---|---|",
    ]
    for c in cells:
        lines.append(f"| {c['sf']} | {c['cpus']} | {c['total']} |")
    by = {(c["sf"], c["cpus"]): c for c in cells}
    t001, t01, t1 = (by[(s, 32)]["total"] for s in ("0.001", "0.01", "0.1"))
    t1_8 = by[("0.1", 8)]["total"]
    lines += [
        "",
        f"- data 10×: 0.001→0.01 = {t01 / t001:.2f}× wall, 0.01→0.1 = {t1 / t01:.2f}× wall",
        "  (100× more rows end-to-end; growth far below 100× because the fixed",
        "  per-job scheduling/codegen floor dominates at tiny SF — the marginal",
        "  cost of rows is what scales, and it stays well under linear here).",
        f"- cores 8→32 at sf0.1: {t1_8 / t1:.2f}× — at tiny SF the wall is",
        "  mostly per-job scheduling/launch floor, so extra cores change little;",
        "  the parallel fraction is the data-dependent part that grows with SF.",
        "",
        "Per-query seconds per cell: see tools/scale_sweep.py output in the",
        "commit that regenerated this file.",
    ]
    with open(os.path.join(REPO, "SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote SCALING.md")


if __name__ == "__main__":
    main()
