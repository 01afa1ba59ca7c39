#!/usr/bin/env python
"""Full-catalog parity audit at sf0.1 (once per round, ~75 min).

The driver's correctness gate runs at sf0.01; this sweep runs the SAME
driver-sim compare (tests/oracle_utils.compare) for every oracled
catalog query at sf0.1 to surface the failure classes that only
manifest at 10x the data: round-half boundary flips on rational
quotients (loo_value_encoding, r8), IEEE negative-zero sign wobble
(graph_modularity, r8), and second-boundary-counting gap semantics
(stream_session_stats, r8). Failures print and the sweep continues;
treat any FAIL as a latent oracle-discipline bug, not noise.

The per-query result is committed as a round artifact (r8 verdict
item 2) so the evidence is inspectable without a 75-minute rerun.
ARTIFACT DISCIPLINE (r10 advice item 2): the living sweep is written
to the round-neutral ``AUDIT_LATEST.json``; per-round ``AUDIT_r0N``
files are frozen at their round's close and never mutated afterwards
— same append-only rule as the CORRECTNESS_r0N ledgers:

    python tools/audit_sf01.py --out AUDIT_LATEST.json

``--names a,b,c`` restricts the sweep and MERGES into an existing
--out file — the incremental path when a round edits individual
queries after the full sweep already ran.

COLD ROWS (r10 verdict item 4): several query families share memoized
per-(session, sf) state (linkage ``_EM_SHARED``, dedup/clean
``_LSH_SHARED``/``_PAIRS_SHARED``, tfidf ``_TFIDF_W_SHARED``) — the
FIRST family member run pays the one-time materialization, so its
wall misattributes family cost to one query (r10: linkage_jw_scores
read 14.4 s cold vs 0.21 s warm). Each row now records
``"cold": true`` plus the memo keys it materialized, so a committed
artifact can never be misread as a per-query regression. The reading
rule lives in BASELINE.md §audit-reading.

Usage: python tools/audit_sf01.py [--sf-dir DIR] [--out FILE] [--names a,b]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from anti_money_laundering_spark.plans.catalog import get_catalog  # noqa: E402
from anti_money_laundering_spark.session import get_spark  # noqa: E402
from anti_money_laundering_spark.sources import TABLES  # noqa: E402
from tests.oracle_utils import compare  # noqa: E402


def _memo_dicts() -> dict[str, dict]:
    """The module-level family memos whose one-time materialization can
    land on whichever family member runs first (imported lazily —
    get_catalog() has already registered the plan modules)."""
    from anti_money_laundering_spark.plans import linkage_queries, llm_queries

    return {
        "linkage_em": linkage_queries._EM_SHARED,
        "lsh": llm_queries._LSH_SHARED,
        "verified_pairs": llm_queries._PAIRS_SHARED,
        "tfidf_weights": llm_queries._TFIDF_W_SHARED,
    }


def _memo_keys() -> set[tuple[str, str]]:
    return {(fam, str(k)) for fam, d in _memo_dicts().items() for k in d}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None, help="write per-query JSON artifact here")
    ap.add_argument("--names", default=None, help="comma-separated subset; merges into --out")
    # positional sf_dir kept for backward compatibility with r8 usage
    ap.add_argument("sf_dir_pos", nargs="?", default=None)
    args = ap.parse_args()
    sf = args.sf_dir_pos or args.sf_dir

    spark = get_spark(app_name="audit_sf01", shuffle_partitions=32)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    only = set(args.names.split(",")) if args.names else None
    results: dict[str, dict] = {}
    fails = []
    for name, q in get_catalog().items():
        if q.oracle is None or (only is not None and name not in only):
            continue
        t0 = time.time()
        tm: dict = {}
        memo_before = _memo_keys()
        try:
            n = compare(q.fn(spark, sf), con, q.oracle, timings=tm)
            row = {"pass": True, "rows": n, "wall_s": round(time.time() - t0, 1), **tm}
        except Exception as ex:  # noqa: BLE001 — the audit must continue past failures
            fails.append(name)
            row = {"pass": False, "rows": None, "wall_s": round(time.time() - t0, 1),
                   "err": str(ex)[:300]}
            traceback.print_exc(limit=1)
        # cold marking applies to BOTH outcomes: a FAILING first family
        # member still paid the memo materialization, and without the
        # flag its inflated wall_s is exactly the misattribution this
        # instrumentation exists to prevent (review finding)
        warmed = sorted({f for f, _ in (_memo_keys() - memo_before)})
        if warmed:
            row["cold"] = True
            row["warmed_memos"] = warmed
        results[name] = row
        tag = f" COLD(warmed: {','.join(warmed)})" if warmed else ""
        if row["pass"]:
            print(f"PASS {name} rows={row['rows']} {row['wall_s']}s {tm}{tag}", flush=True)
        else:
            print(f"FAIL {name} {row['wall_s']}s :: {row['err']}{tag}", flush=True)
    if args.out:
        merged: dict[str, dict] = {}
        if only is not None and os.path.exists(args.out):
            prior = json.load(open(args.out))
            # a subset merge must not relabel previously merged
            # entries with a different SF — the artifact records ONE
            # sweep scale
            assert prior.get("sf_dir") == sf, (
                f"--names merge at {sf} into an artifact recorded at "
                f"{prior.get('sf_dir')}; rerun with the matching --sf-dir"
            )
            merged = prior.get("queries", {})
        merged.update(results)
        n_fail = sum(1 for r in merged.values() if not r["pass"])
        artifact = {
            "sf_dir": sf,
            "n_queries": len(merged),
            "n_fail": n_fail,
            "fails": sorted(k for k, r in merged.items() if not r["pass"]),
            "queries": merged,
        }
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"wrote {args.out}: {len(merged)} queries, {n_fail} fails", flush=True)
    print("AUDIT-DONE fails:", fails, flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
