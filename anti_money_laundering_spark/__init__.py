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

import os as _os

# One BLAS thread per process — set BEFORE pyspark (which imports
# numpy, which initializes the OpenBLAS pool at library load, reading
# this env exactly once). Driver-side numpy runs table builds and
# replays whose matrices are tiny; a 32-thread OpenBLAS pool
# busy-spins after every call and burned ~3 CPU-s PER BENCH PASS of
# pure spin on this box (measured on ann_lsh_topk: 5.1 CPU-s with the
# pool vs 1.6 without, identical wall and output). Worker processes
# fork from the JVM and inherit the same env; session.py adds the
# executorEnv twin for cluster executors. This is deliberately a
# PROCESS-GLOBAL import side effect (the only point early enough to
# beat numpy's one-shot env read); a host process that wants threaded
# BLAS for its own large-matrix work must export the vars before
# importing this package — setdefault always honors a pre-set value.
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    _os.environ.setdefault(_v, "1")

from anti_money_laundering_spark.session import get_spark  # noqa: E402

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
