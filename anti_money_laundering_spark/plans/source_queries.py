"""Source/sink round-trip catalog query (SURVEY.md §2.1).

One query exercises the whole non-parquet source surface end-to-end so
the driver's correctness gate attests it: CSV sink+scan (S2), managed
table write/read through the catalog (S3/S4), database DDL (S8) and the
Spark↔pandas Arrow exchange (S9). The reference's load path this
mirrors is config/aml_config.py:73-94 (CSV dedupe seeds + managed
tables).

The scratch directory lives INSIDE the repo (driver sandboxing); all
writes are mode=overwrite so the query is idempotent across runs and
sessions.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

from anti_money_laundering_spark.plans.catalog import register
from anti_money_laundering_spark.sources import load_table

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
)


@register(
    "sources_roundtrip",
    tags=("S2", "S3", "S4", "S8", "S9"),
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def sources_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → CSV sink → CSV scan (explicit schema) → managed table in
    a dedicated database → catalog scan → pandas (Arrow) → Spark.
    Every hop must be lossless, so the identity oracle over the original
    parquet is the correctness check for the full chain."""
    nation = load_table(spark, sf_dir, "nation")
    csv_path = os.path.join(_SCRATCH, "sources_roundtrip", "nation_csv")

    # S4 (CSV flavor) + S2: header'd CSV out, explicit-schema scan back
    # (inferSchema is for exploration; production scans pin the schema).
    nation.write.mode("overwrite").option("header", True).csv(csv_path)
    from_csv = spark.read.schema(nation.schema).option("header", True).csv(csv_path)

    # S8 + S4 + S3: database DDL, managed-table sink, catalog scan.
    # A fresh session may find the previous session's table LOCATION on
    # disk without a catalog entry ([LOCATION_ALREADY_EXISTS]); drop the
    # entry and clear the stray location before overwriting.
    spark.sql("CREATE DATABASE IF NOT EXISTS aml_roundtrip")
    spark.sql("DROP TABLE IF EXISTS aml_roundtrip.nation_rt")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(
        os.path.join(warehouse, "aml_roundtrip.db", "nation_rt"), ignore_errors=True
    )
    from_csv.write.mode("overwrite").format("parquet").saveAsTable(
        "aml_roundtrip.nation_rt"
    )
    managed = spark.table("aml_roundtrip.nation_rt")

    # S9: Arrow-backed exchange to pandas and back.
    pdf = managed.select("n_nationkey", "n_name", "n_regionkey").toPandas()
    return spark.createDataFrame(pdf)
