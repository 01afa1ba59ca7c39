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

Usage: python tools/audit_sf01.py [sf_dir]
"""

from __future__ import annotations

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


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="audit_sf01", shuffle_partitions=32)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    fails = []
    for name, q in get_catalog().items():
        if q.oracle is None:
            continue
        t0 = time.time()
        try:
            n = compare(q.fn(spark, sf), con, q.oracle)
            print(f"PASS {name} rows={n} {time.time() - t0:.1f}s", flush=True)
        except Exception as ex:  # noqa: BLE001 — the audit must continue past failures
            fails.append(name)
            print(f"FAIL {name} {time.time() - t0:.1f}s :: {str(ex)[:300]}", flush=True)
            traceback.print_exc(limit=1)
    print("AUDIT-DONE fails:", fails, flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
