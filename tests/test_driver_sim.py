"""Regression tests for the driver-sim canonicalizer (r7 verdict item
6): each injected case reproduces a class of r7 red driver row and must
FAIL the pytest-side compare the same way it failed the driver —
proving the sim is at least as strict as the grading driver on the
failure modes we have observed.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_utils import compare, driver_sortcheck


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_scalar_frames_pass(spark, con):
    sdf = spark.sql("SELECT 1 AS k, CAST(1.5 AS DOUBLE) AS v UNION ALL SELECT 2, 2.25")
    assert compare(sdf, con, "SELECT 2 AS k, 2.25 AS v UNION ALL SELECT 1, 1.5") == 2


def test_decimal_output_vs_float_oracle_fails(spark, con):
    """The decimal_money_totals r7 class: identical VALUES, but a Spark
    Decimal column against a float64 oracle diverges at magnitudes
    >= 1e6 because the driver normalizes Decimals to 6 significant
    digits and floats not at all."""
    sdf = spark.sql("SELECT CAST(1233170551.74 AS DECIMAL(18,2)) AS total")
    with pytest.raises(AssertionError, match="value mismatch"):
        compare(sdf, con, "SELECT 1233170551.74 AS total")


def test_array_output_crashes_like_the_driver(spark, con):
    """The user_event_type_profile / ml_embedding_pca r7 class: any
    ArrayType output makes the driver's raw-column sort_values raise
    TypeError before comparing anything."""
    sdf = spark.sql("SELECT 1 AS k, array('a', 'b') AS types")
    with pytest.raises(TypeError, match="unhashable"):
        compare(sdf, con, "SELECT 1 AS k, ['a', 'b'] AS types")


def test_sortcheck_rejects_list_cells():
    import pandas as pd

    driver_sortcheck(pd.DataFrame({"k": [1, 2]}))  # scalars fine
    with pytest.raises(TypeError):
        driver_sortcheck(pd.DataFrame({"k": [[1], [2]], "j": [1, 2]}))


def test_sixth_decimal_difference_fails(spark, con):
    """The loo_value_encoding r7 class: a 1e-6 value difference (a
    round-half tie broken differently) must fail even when 6
    significant digits would mask it."""
    sdf = spark.sql("SELECT CAST(523.123456 AS DOUBLE) AS v")
    with pytest.raises(AssertionError, match="value mismatch"):
        compare(sdf, con, "SELECT CAST(523.123457 AS DOUBLE) AS v")
