"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``anti_money_laundering_spark`` package;
this module just exposes its query catalog.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from anti_money_laundering_spark.plans.catalog import get_catalog  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The AML alert feed — every alert family the reference's notebooks
    produce (structuring fan-in 01:308-322, round-tripping 01:376-405,
    synthetic identities 01:164-228, propagated risk 01:450-461)
    unioned into one typed feed; exercises motifs, connected
    components, Pregel and union in a single hash-verified composite.
    """
    catalog = get_catalog()
    return catalog["aml_alert_feed"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in get_catalog().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; non-SQL-expressible ops
    (iterative/EM/LSH) are omitted → driver runs rows-only checks."""
    return {name: q.oracle for name, q in get_catalog().items() if q.oracle is not None}
