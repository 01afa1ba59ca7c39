"""Partitioning-invariance gate: engine results must be a pure
function of the DATA, not of shuffle width or input layout.

At 100 TB the same query runs with different executor counts, AQE
coalescing decisions, and input splits every day — any result that
depends on partitioning (nondeterministic tiebreaks, RNG seeded per
partition, first()-without-order) silently corrupts downstream
training sets. Representative queries from each family re-run under a
different shuffle width AND a repartitioned scan must match the
baseline row-for-row.
"""

from __future__ import annotations

import pytest

from anti_money_laundering_spark.plans.catalog import get_catalog
from tests.oracle_utils import _canon

CATALOG = get_catalog()

#: One query per determinism-risk class: window tiebreaks, md5-ordered
#: top-k-per-group, md5 sampling, global rank, array-frame windows,
#: iterative graph fixpoint, EM iteration.
QUERIES = [
    "scd2_user_status",
    "per_source_doc_cap",
    "weighted_sample_orders",
    "vocab_top_terms",
    "rolling_median_value",
    "connected_components",
    "linkage_em_scored",
]


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_to_shuffle_width(spark, sf_dir, name):
    fn = CATALOG[name].fn
    base = _canon(fn(spark, sf_dir).toPandas())
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        narrow = _canon(fn(spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert base == narrow, f"{name}: result depends on shuffle width"
