"""Every catalog query with an oracle must match DuckDB — this mirrors
the driver's CORRECTNESS gate before the driver runs it."""

from __future__ import annotations

import pytest

from anti_money_laundering_spark.plans.catalog import get_catalog
from tests.oracle_utils import compare

CATALOG = get_catalog()
WITH_ORACLE = sorted(name for name, q in CATALOG.items() if q.oracle is not None)
ROWS_ONLY = sorted(name for name, q in CATALOG.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, duck, sf_dir):
    q = CATALOG[name]
    compare(q.fn(spark, sf_dir), duck, q.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    q = CATALOG[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_contract_shape():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 1
