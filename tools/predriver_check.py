#!/usr/bin/env python
"""Pre-driver checklist, one command (the verify-skill recipe, committed).

Runs exactly what the grading driver will exercise, in order:
1. cold driver-contract simulation: entry() smoke at sf0.001, then
   every oracle-backed query vs DuckDB at sf0.01 (row count + column
   set + order-insensitive 6-sig-digit value compare — the driver's
   gate), failing loudly on ANY mismatch or any EMPTY oracle result
   (empty == empty attests nothing);
2. approximate-op exactness pins at the chosen SF, RUN BY DEFAULT in a
   pytest subprocess (r8 advice: a fixture regen that shrinks the
   tfidf rounding-boundary margin must flip THIS command red, not wait
   for a pytest run someone forgot) — the catalog oracles for the
   minhash/LSH/IVF/k-core/tfidf queries are only valid while these
   hold. ``--skip-pins`` skips the subprocess; the full contract still
   wants the pins at ALL of sf0.001/0.01/0.1:
   SPARK_GRAFT_TEST_SF_DIR=... pytest <the _PIN_TESTS list below>

Exit 0 = driver-ready at this layer. Usage:
    python tools/predriver_check.py [--sf-dir /root/testdata/sf0.01] [--skip-pins]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


#: Exactness pins that LICENSE catalog oracles (each oracle's green
#: hash is only meaningful while its pin holds): minhash recall=1.0,
#: LSH/IVF == brute force, k-core converges within the oracle's
#: unrolled rounds, and the tfidf hashed cosines stay >= 1e-9 off
#: every round(6) half-boundary (the r8 promotion's drop-to-rows-only
#: protocol — see that test's docstring).
_PIN_TESTS = (
    "tests/test_text_dedup.py::test_minhash_pipeline_equals_exact_jaccard",
    "tests/test_text_dedup.py::test_tfidf_hashed_cosines_stay_off_rounding_boundaries",
    "tests/test_vector.py::test_lsh_topk_equals_bruteforce",
    "tests/test_vector.py::test_ivf_exact_rerank_equals_bruteforce",
    "tests/test_graph.py::test_k_core_converges_within_oracle_rounds",
    "tests/test_operators.py::test_kendall_runs_stay_off_rounding_boundaries",
)


def run_pins(sf_dir: str) -> bool:
    """Run the exactness pins at ``sf_dir`` in a pytest subprocess
    (fresh JVM — the pins must also hold cold). Returns True on green."""
    import subprocess

    env = dict(os.environ, SPARK_GRAFT_TEST_SF_DIR=sf_dir)
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", *_PIN_TESTS, "-q", "--no-header"],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    return proc.returncode == 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--skip-pins", action="store_true")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from anti_money_laundering_spark.session import get_spark
    from anti_money_laundering_spark.sources import TABLES
    from tests.oracle_utils import compare

    spark = get_spark(app_name="predriver_check")
    smoke = entrymod.entry(spark)
    n = smoke.count()
    assert n > 0, "entry() smoke returned 0 rows"
    print(f"entry() smoke: {n} rows, schema {[f.name for f in smoke.schema.fields]}")

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert set(osql) <= set(qs), "oracle_sql keys not a subset of queries"
    print(f"contract: {len(qs)} queries, {len(osql)} oracled, "
          f"{len(qs) - len(osql)} rows-only")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    failures: list[str] = []
    for i, (name, oracle) in enumerate(osql.items(), 1):
        try:
            df = qs[name](spark, args.sf_dir)
            rows = compare(df, con, oracle)
            if rows == 0:
                raise AssertionError("EMPTY oracle result (attests nothing)")
            status = f"ok ({rows} rows)"
        except Exception as ex:  # noqa: BLE001 — collect everything, report once
            failures.append(f"{name}: {ex}")
            status = f"FAIL: {ex}"
        print(f"[{i}/{len(osql)}] {name}: {status}", flush=True)

    for name in set(qs) - set(osql):
        try:
            c = qs[name](spark, args.sf_dir).count()
            print(f"[rows-only] {name}: {c} rows", flush=True)
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name} (rows-only): {ex}")

    if not args.skip_pins:
        print("\nrunning exactness pins (pytest subprocess)...", flush=True)
        if not run_pins(args.sf_dir):
            failures.append(
                "exactness pins FAILED — the affected oracles must drop to "
                "rows-only before the driver runs (see the pin docstrings)"
            )

    if failures:
        print(f"\nNOT DRIVER-READY — {len(failures)} failure(s):")
        for f in failures:
            print(f"  - {f}")
        return 1
    print("\nDRIVER-READY: all oracled queries match, no empty oracles, "
          "rows-only queries execute, exactness pins hold."
          if not args.skip_pins else
          "\nDRIVER-READY at the compare layer (pins SKIPPED — run them "
          "before the driver).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
