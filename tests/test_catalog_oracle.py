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


def test_no_oracle_is_empty_at_driver_sf():
    """Empty == empty passes the hash gate silently and attests
    nothing (round-4 lesson: a mis-set PMI frequency floor shipped an
    empty-but-"green" query). Every oracle must return rows at the
    DRIVER's correctness SF (0.01) — DuckDB-only, so this also guards
    against fixture regens hollowing out thresholds. (At sf0.001 six
    graph oracles are legitimately empty; the driver never runs there.)"""
    import duckdb

    from anti_money_laundering_spark.sources import TABLES

    con = duckdb.connect()
    sf = "/root/testdata/sf0.01"
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    empty = []
    for name, q in CATALOG.items():
        if q.oracle is None:
            continue
        if con.execute(f"SELECT count(*) FROM ({q.oracle})").fetchone()[0] == 0:
            empty.append(name)
    assert not empty, f"zero-row oracles at driver SF: {empty}"


def test_events_value_is_nonnegative_at_all_sfs():
    """Fixture assumption pin (r8 advice): the integer round-half-up
    identity (2a*1e6 + b) div (2b) used by loo_value_encoding and
    burstiness_daily_users is only round-half-up for NONNEGATIVE
    numerators — Spark ``div`` truncates toward zero while DuckDB
    ``//`` floors, so a negative events.value sum would silently
    diverge between the engines. This DuckDB-only check turns the
    assumption into a tripwire: if a fixture regen ever introduces
    negative values, reformulate those queries with the
    nonnegative-shift pattern mannwhitney_value_periods uses for
    rank_biserial BEFORE the driver runs."""
    import duckdb

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        lo = con.execute(
            f"SELECT min(value) FROM read_parquet('/root/testdata/{sf}/events.parquet')"
        ).fetchone()[0]
        assert lo is not None and lo >= 0, f"events.value went negative at {sf}: {lo}"
