"""Order-insensitive Spark-vs-DuckDB result comparison.

Mirrors the driver's correctness gate: row count + schema (column
names) + order-insensitive value comparison, with columns sorted by
name first. Floats are compared to 6 significant decimals after the
queries' own round() discipline; timestamps normalized to ISO strings.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pandas as pd
from pyspark.sql import DataFrame


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return f"{v:.6g}"
    if isinstance(v, Decimal):
        return f"{float(v):.6g}"
    if isinstance(v, (datetime, pd.Timestamp)):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf[sorted(pdf.columns)]
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return sorted(rows)


def compare(spark_df: DataFrame, duck_con: duckdb.DuckDBPyConnection, oracle: str) -> int:
    """Assert the Spark result matches the DuckDB oracle result.
    Returns the compared row count so callers (tools/predriver_check.py)
    can reject empty-vs-empty without re-executing the oracle."""
    sp = spark_df.toPandas()
    dk = duck_con.execute(oracle).fetchdf()
    sp_cols, dk_cols = sorted(c.lower() for c in sp.columns), sorted(c.lower() for c in dk.columns)
    assert sp_cols == dk_cols, f"schema mismatch: spark={sp_cols} duck={dk_cols}"
    assert len(sp) == len(dk), f"row count mismatch: spark={len(sp)} duck={len(dk)}"
    sp.columns = [c.lower() for c in sp.columns]
    dk.columns = [c.lower() for c in dk.columns]
    a, b = _canon(sp), _canon(dk)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"value mismatch (first diffs): {diffs}")
    return len(dk)
