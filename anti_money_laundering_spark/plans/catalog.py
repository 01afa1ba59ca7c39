"""Registry of named queries with DuckDB oracles.

Every operator from SURVEY.md §2 lands here as a named query over the
driver fixtures (TESTDATA.md): a Spark callable ``(spark, sf_dir) ->
DataFrame`` plus, where SQL-expressible, an equivalent ANSI-SQL string
DuckDB runs over the same parquet for the correctness gate.

Oracle discipline (FIXTURES.md §B):
- alias every computed column identically on both sides (the driver
  sorts columns by name before value-hashing);
- wrap floating aggregates in round(...) on BOTH sides so Spark/DuckDB
  summation-order ulps can't flip the hash;
- cast DuckDB integer sums (HUGEINT) back to BIGINT to match Spark.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class CatalogQuery:
    name: str
    fn: SparkQuery
    oracle: str | None = None  #: DuckDB SQL; None => driver runs rows-only check
    headline: bool = False  #: included in bench.py
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_CATALOG: dict[str, CatalogQuery] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: add a query to the engine catalog."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _CATALOG:
            raise ValueError(f"duplicate catalog query: {name}")
        _CATALOG[name] = CatalogQuery(
            name=name, fn=fn, oracle=oracle, headline=headline, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


def get_catalog() -> dict[str, CatalogQuery]:
    """Import all query modules (side-effect registration) and return
    the full catalog."""
    # Imports deferred so `import anti_money_laundering_spark` stays cheap.
    from anti_money_laundering_spark.plans import (  # noqa: F401
        extended_queries,
        graph_queries,
        linkage_queries,
        llm_queries,
        operator_queries,
        relational_queries,
        streaming_queries,
    )

    return dict(_CATALOG)
