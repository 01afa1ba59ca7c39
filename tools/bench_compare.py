#!/usr/bin/env python
"""Compare two bench artifacts (BENCH_r{N}.json or a raw bench.py JSON
line) with the protocol-v3 reading rule applied per query:

- WALL moved but CPU flat  -> box noise (neighbor load), ignore
- CPU moved                -> real engine change, investigate

Usage: python tools/bench_compare.py OLD NEW [--threshold 0.15]
Accepts either the driver artifact shape ({"parsed": {...}}) or the
raw bench.py line ({"queries": ..., "cpu_s": ...}).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    d = json.load(open(path))
    return d.get("parsed", d)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[4]) if len(sys.argv) > 4 and sys.argv[3] == "--threshold" else 0.15
    ow, nw = old.get("queries", {}), new.get("queries", {})
    oc, nc = old.get("cpu_s", {}), new.get("cpu_s", {})
    print(f"{'query':32s} {'wall Δ':>8s} {'cpu Δ':>8s}  verdict")
    flagged = 0
    for k in sorted(nw, key=lambda k: -(nw[k] - ow.get(k, 0))):
        if k not in ow or ow[k] <= 0:
            print(f"{k:32s} {'new':>8s}")
            continue
        dw = nw[k] / ow[k] - 1
        dc = (nc[k] / oc[k] - 1) if k in nc and k in oc and oc[k] > 0 else None
        if abs(dw) < thr and (dc is None or abs(dc) < thr):
            continue
        # sub-noise-floor magnitudes: ratio swings on <0.25s wall /
        # <0.5s CPU are scheduling-floor jitter, not signal
        if max(ow[k], nw[k]) < 0.25 and (
            dc is None or abs(nc.get(k, 0) - oc.get(k, 0)) < 0.5
        ):
            continue
        if dc is None:
            verdict = "wall-only data (pre-v3 artifact) — rerun to judge"
        elif dc > thr:
            verdict = "CPU UP: real engine change — investigate"
            flagged += 1
        elif dw > thr:
            verdict = "wall up, CPU flat: box noise"
        else:
            verdict = "faster"
        cpart = f"{dc:+8.0%}" if dc is not None else f"{'n/a':>8s}"
        print(f"{k:32s} {dw:+8.0%} {cpart}  {verdict}")
    tw = sum(nw.values()) / max(sum(ow.get(k, 0) for k in nw), 1e-9) - 1
    print(f"\ntotal wall {tw:+.0%}; {flagged} queries flagged by CPU")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
