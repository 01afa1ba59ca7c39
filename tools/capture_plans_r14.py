#!/usr/bin/env python
"""Dump .explain("formatted") for headline queries (or names given on
argv) to plans/r14/<query>_<suffix>.txt — the optimization round's
before/after plan evidence (guide §1: measure first, capture the plan
shape per query)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anti_money_laundering_spark.plans.catalog import get_catalog  # noqa: E402
from anti_money_laundering_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    spark = get_spark(app_name="capture_plans_r14")
    cat = get_catalog()
    os.makedirs(OUT, exist_ok=True)
    targets = names or [n for n, q in cat.items() if q.headline]
    for name in targets:
        df = cat[name].fn(spark, SF_DIR)
        plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {SF_DIR} ({suffix})\n\n")
            f.write(plan.rstrip() + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
