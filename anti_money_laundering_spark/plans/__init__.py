"""Query plans: the engine's catalog of named analytics.

``catalog`` is the registry the driver contract (__spark_entry__.py)
and bench.py consume; ``pipeline`` is the plain-Python DAG runner that
replaces the reference's Databricks job (RUNME.py:19-92).
"""

from anti_money_laundering_spark.plans.catalog import CatalogQuery, get_catalog, register

__all__ = ["CatalogQuery", "get_catalog", "register"]
