"""PySpark-native AML analytics engine.

A brand-new engine with the query and data-processing capabilities of
databricks-industry-solutions/anti-money-laundering (see SURVEY.md),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst,
custom algorithmic drivers (connected components, motif matching,
Pregel, probabilistic record linkage) built as iterative DataFrame
programs, plus large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

Designed for a 1000-executor cluster at ~100 TB: every operator keeps
the plan declarative (predicate pushdown / column pruning / AQE),
broadcasts small dimensions, avoids driver-side collects in data
paths, and checkpoints iterative lineage.
"""

from anti_money_laundering_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
