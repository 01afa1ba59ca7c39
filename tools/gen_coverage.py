#!/usr/bin/env python
"""Regenerate COVERAGE.md: SURVEY.md §2 operator IDs -> catalog queries
(from each query's `tags`) + module/test pointers for machinery that
isn't a query (sinks, checkpointing, secrets, ...)."""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anti_money_laundering_spark.plans.catalog import get_catalog  # noqa: E402

DESC = {
    "S1": "Parquet batch scan",
    "S2": "CSV scan (header+inferSchema)",
    "S3": "Managed-table scan",
    "S4": "Overwrite table sink (+overwriteSchema)",
    "S5": "Temp-view registration",
    "S6": "SQL temp view DDL",
    "S7": "CTAS",
    "S8": "Database DDL / catalog",
    "S9": "Spark↔pandas exchange (Arrow)",
    "S10": "External HTTP source (batched fetch)",
    "S11": "Secrets / config access",
    "P1": "Column select / projection",
    "P2": "selectExpr struct expansion",
    "P3": "Filter vs literal",
    "P4": "Col-vs-col predicate",
    "P5": "Null predicates",
    "P6": "Arithmetic predicate on sum",
    "P7": "Drop / rename",
    "P8": "Derived column (withColumn)",
    "P9": "WHERE on struct field + range",
    "J1": "Equi inner join (key-name form)",
    "J2": "Multi-way equi join on struct fields",
    "J3": "Aliased self-join + theta residual",
    "J4": "IN-subquery → left-semi",
    "J5": "Blocked pairwise self-join (linkage)",
    "J6": "Motif pattern → structural join chain",
    "J-ext": "Outer / anti joins (engine extension)",
    "A1": "GROUP BY + count",
    "A2": "Conditional aggregate",
    "A3": "HAVING",
    "A4": "DISTINCT projection",
    "A5": "Graph message aggregation",
    "A6": "EM parameter estimation",
    "A-ext": "Rollup / cube / pivot / approx_count_distinct (extension)",
    "W1": "ORDER BY global sort",
    "W2": "LIMIT / top-k",
    "W-ext": "Window functions (extension)",
    "U1": "UNION (distinct)",
    "U2": "UNION ALL",
    "U3": "DataFrame .union()",
    "U-ext": "INTERSECT / EXCEPT (extension)",
    "F1": "translate chain",
    "F2": "coalesce",
    "F3": "SQL cast",
    "F4": "CASE WHEN count",
    "F5": "Column arithmetic",
    "F6": "greatest/when",
    "F7": "Parameterized SQL text entry",
    "F-ext": "JSON extraction, date_trunc, string/math fns (extension)",
    "G1": "Graph construction (2 DataFrames)",
    "G2": "degrees",
    "G3": "Degree-1 pruning",
    "G4": "Connected components (iterative)",
    "G5": "Motif find()",
    "G6": "Pregel",
    "G7": "Checkpoint / lineage truncation",
    "E1": "link_type=dedupe_only",
    "E2": "Blocking rules",
    "E3": "Comparison columns + TF adjustment",
    "E4": "Scored comparisons (FS posterior)",
    "E5": "Model diagnostics (fitted params)",
    "E6": "Re-link on other fields",
    "M1": "Batch image classification",
    "M2": "Media preprocessing",
    "M3": "Label join + filter + persist",
    "M4": "mlflow experiment registration",
    "OP": "As-of / range joins (custom operators)",
    "asof": "As-of join",
    "range": "Range join",
    "STR": "Streaming windows / watermark / dedup",
    "LLM": "LLM-data-pipeline surface",
    "dedup": "Deduplication",
    "ann": "Similarity search",
    "text": "Text analysis",
    "ml": "TF-IDF / MLlib",
    "multimodal": "Multimodal columns",
    "sample": "Deterministic sampling / splits",
    "G-ext": "Triangle count / shortest paths / label propagation (GraphFrames parity extension)",
}

EXTRA = {
    "S1": "`sources.read_parquet` / `load_table`; every catalog query",
    "S2": "`sources.read_csv`; tests/test_pipeline_sources.py::test_csv_roundtrip_inferschema",
    "S3": "tests/test_pipeline_sources.py::test_catalog_ddl_database_lifecycle (spark.table); pipeline.py view handoff",
    "S4": "`sources.save_table` / `write_parquet`; tests/test_pipeline_sources.py::test_parquet_write_partitioned",
    "S8": "tests/test_pipeline_sources.py::test_catalog_ddl_database_lifecycle",
    "S9": "tests/test_pipeline_sources.py::test_pandas_exchange_arrow_roundtrip; tests/oracle_utils.py (every oracle compare)",
    "S10": "`multimodal.fetch_urls` (mapInPandas, stubbed fetcher); tests/test_ml_multimodal.py::test_fetch_urls_stub",
    "S11": "env-var config in `session.get_spark` (no dbutils); SPARK_GRAFT_* variables",
    "G7": "`localCheckpoint` in graph/components.py + graph/pregel.py + linkage EM",
    "F7": "plans/*.py build parameterized SQL/DataFrame plans; no user-input string splicing",
    "P1": "also in nearly every query projection",
    "A4": "also `dedup_exact_groups` (dropDuplicates path in dedup module)",
    "M4": "import-gated ml.init_experiment_tracking (mlflow optional, like Delta/torch gates; test_ml_multimodal.py::test_experiment_tracking_gate)",
    "E5": "params also returned by `linkage.em_fit`; invariants in tests/test_linkage.py",
    "STR": "streaming/ module; batch-parity + replay tests in tests/test_streaming.py",
}

ORDER = list(DESC)

HEADER = """# COVERAGE — SURVEY.md §2 operator inventory → implementation

Auto-generated from the query catalog's `tags` (see `plans/catalog.py`).
Every operator ID from SURVEY.md §2 maps to the catalog queries exercising it
(each query = a `queries()` entry +, where SQL-expressible, an `oracle_sql()`
DuckDB oracle the driver hash-compares) and/or the module/tests implementing it.
Regenerate with `python tools/gen_coverage.py`.

| op | meaning | catalog queries | module / test pointers |
|---|---|---|---|"""


def main() -> None:
    cov = defaultdict(list)
    for name, q in get_catalog().items():
        for t in q.tags:
            cov[t].append(name)
    lines = [HEADER]
    for op in ORDER:
        qs = ", ".join(f"`{n}`" for n in sorted(cov.get(op, [])))
        lines.append(f"| {op} | {DESC[op]} | {qs or '—'} | {EXTRA.get(op, '')} |")
    lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    unmapped = [op for op in ORDER if not cov.get(op) and op not in EXTRA]
    print("wrote", out)
    if unmapped:
        print("UNMAPPED (no query AND no pointer):", unmapped)
    unknown = sorted(set(cov) - set(ORDER))
    if unknown:
        print("tags not in ORDER:", unknown)


if __name__ == "__main__":
    main()
