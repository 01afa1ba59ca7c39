"""Repo-wide physical-plan lint: every catalog query's plan is swept
for the two unambiguous scale antipatterns this engine claims to have
zero of (SURVEY §2.12 UDF discipline; the 100 TB posture):

- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan. The
  engine's contract is JVM codegen everywhere, with Arrow-vectorized
  ``ArrowEvalPython`` / ``MapInPandas`` as the only Python path.
- ``CartesianProduct`` — an unkeyed all-pairs join. Every pairwise
  operator here blocks/buckets first (LSH bands, IVF lists, blocking
  rules, bucketized range join); broadcast nested loops over tiny
  broadcast sides (``BroadcastNestedLoopJoin``) are acceptable and not
  flagged.

This executes each query's PLAN BUILD only (eager sub-steps like EM
fits and versioned-table writes do run), at the smallest fixture —
~80 s for the whole catalog. A query that cannot even build is a
failure here too, which doubles as an import/registration smoke for
catalog entries past the driver window.
"""

from __future__ import annotations

from anti_money_laundering_spark.plans.catalog import get_catalog
from tests.test_plans import explain_str

ANTIPATTERNS = ("BatchEvalPython", "CartesianProduct")


def test_no_catalog_plan_contains_scale_antipatterns(spark, sf_dir):
    bad: dict[str, str] = {}
    for name, q in get_catalog().items():
        plan = explain_str(q.fn(spark, sf_dir), "simple")
        hits = [p for p in ANTIPATTERNS if p in plan]
        if hits:
            bad[name] = ",".join(hits)
    assert not bad, f"scale antipatterns in catalog plans: {bad}"
