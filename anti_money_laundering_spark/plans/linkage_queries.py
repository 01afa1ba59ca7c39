"""Record-linkage catalog (SURVEY.md §2.9): the Splink-equivalent
pipeline over the ``customer`` fixture — blocking, gamma comparison
vectors, term frequencies (all DuckDB-oracle-checkable), and the full
EM-scored dedupe (iterative ⇒ rows-only check + invariant tests in
tests/test_linkage.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anti_money_laundering_spark.linkage import (
    candidate_pairs,
    em_fit,
    exact_comparison,
    gamma_table,
    levenshtein_comparison,
    link_dedupe,
    numeric_bucket_comparison,
    term_frequencies,
)
from anti_money_laundering_spark.plans.catalog import register
from anti_money_laundering_spark.sources import load_table

# Blocking: same nation + same market segment (the reference blocks on
# l.amount = r.amount, 03:36-38 — an equi-key choice, not a similarity).
_BLOCKING = [["c_nationkey", "c_mktsegment"]]

# Pairs-side SQL shared by the oracles below.
_PAIRS_SQL = """
    SELECT l.c_custkey AS uid_l, r.c_custkey AS uid_r,
           l.c_name AS c_name_l, r.c_name AS c_name_r,
           l.c_acctbal AS c_acctbal_l, r.c_acctbal AS c_acctbal_r
    FROM customer l JOIN customer r
      ON l.c_nationkey = r.c_nationkey AND l.c_mktsegment = r.c_mktsegment
    WHERE l.c_custkey < r.c_custkey
"""


def _comparisons():
    return [
        levenshtein_comparison("c_name", close=2, tf_adjust=False),
        numeric_bucket_comparison("c_acctbal", tolerance=100.0),
    ]


@register(
    "linkage_blocked_pairs",
    tags=("E1", "E2", "J5"),
    oracle=f"SELECT uid_l, uid_r FROM ({_PAIRS_SQL})",
)
def linkage_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked candidate pairs (E2): equi-self-join on the blocking
    keys with uid_l < uid_r — the O(n²) cartesian never materializes
    (reference blocking rules, 03:36-38, :117-119)."""
    cust = load_table(spark, sf_dir, "customer")
    return candidate_pairs(
        cust, "c_custkey", _BLOCKING, compare_cols=["c_name", "c_acctbal"]
    ).select("uid_l", "uid_r")


@register(
    "linkage_gamma_vectors",
    tags=("E3",),
    oracle=f"""
    SELECT uid_l, uid_r,
           CASE WHEN c_name_l = c_name_r THEN 2
                WHEN levenshtein(c_name_l, c_name_r) <= 2 THEN 1
                ELSE 0 END AS gamma_c_name,
           CASE WHEN c_acctbal_l = c_acctbal_r THEN 2
                WHEN abs(c_acctbal_l - c_acctbal_r) <= 100.0 THEN 1
                ELSE 0 END AS gamma_c_acctbal
    FROM ({_PAIRS_SQL})
    """,
)
def linkage_gamma_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison vectors (E3): per-column agreement levels via
    JVM-side levenshtein / abs-diff expressions (03:39-53)."""
    cust = load_table(spark, sf_dir, "customer")
    pairs = candidate_pairs(cust, "c_custkey", _BLOCKING, compare_cols=["c_name", "c_acctbal"])
    return gamma_table(pairs, _comparisons()).select(
        "uid_l", "uid_r", "gamma_c_name", "gamma_c_acctbal"
    )


@register(
    "linkage_term_frequencies",
    tags=("E3",),
    oracle="""
    SELECT c_mktsegment AS value, count(*) AS n,
           round(count(*) / (SELECT count(*) FROM customer WHERE c_mktsegment IS NOT NULL), 6) AS tf
    FROM customer WHERE c_mktsegment IS NOT NULL
    GROUP BY c_mktsegment
    """,
)
def linkage_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-frequency table (E3 tf adjustment input, 03:43): agreement
    on a common value is weaker linkage evidence than on a rare one."""
    cust = load_table(spark, sf_dir, "customer")
    return term_frequencies(cust, "c_mktsegment").select(
        "value", "n", F.round("tf", 6).alias("tf")
    )


@register(
    "linkage_em_scored",
    tags=("E4", "A6"),
    # EM is iterative driver-side parameter fitting — not expressible in
    # one SQL statement; the driver records a rows-only check and
    # tests/test_linkage.py asserts ranking invariants on known dupes.
    oracle=None,
)
def linkage_em_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Fellegi-Sunter dedupe (E4): block → gamma → EM-fit m/u →
    posterior match_probability per candidate pair (03:56-58)."""
    cust = load_table(spark, sf_dir, "customer")
    scored = link_dedupe(
        cust,
        "c_custkey",
        _BLOCKING,
        _comparisons(),
        max_iter=10,
        tf_adjust=False,
    )
    return scored.select(
        "uid_l",
        "uid_r",
        "gamma_c_name",
        "gamma_c_acctbal",
        F.round("match_probability", 6).alias("match_probability"),
    )


@register(
    "linkage_em_params",
    tags=("E5", "A6"),
    # Fitted parameters are the output of iterative EM — rows-only
    # check; tests/test_linkage.py asserts m/u separate known dupes.
    oracle=None,
)
def linkage_em_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model diagnostics (E5): the fitted Fellegi-Sunter parameters
    (λ and per-level m/u probabilities) exposed as a DataFrame — the
    engine-core replacement for Splink's chart diagnostics
    (03_aml_entity_resolution.py:72-75, :93-95)."""
    cust = load_table(spark, sf_dir, "customer")
    comparisons = _comparisons()
    pairs = candidate_pairs(cust, "c_custkey", _BLOCKING, compare_cols=["c_name", "c_acctbal"])
    params = em_fit(gamma_table(pairs, comparisons), comparisons, max_iter=10)
    rows = [("__lambda__", -1, float(params["lambda"]), float("nan"))]
    for c in comparisons:
        for lvl in range(c.n_levels):
            rows.append((c.name, lvl, float(params["m"][c.name][lvl]), float(params["u"][c.name][lvl])))
    return spark.createDataFrame(rows, "comparison string, gamma_level int, m double, u double")


@register(
    "linkage_relink_segment",
    tags=("E6", "E2", "E3"),
    oracle="""
    SELECT l.c_custkey AS uid_l, r.c_custkey AS uid_r,
           CASE WHEN l.c_mktsegment = r.c_mktsegment THEN 1 ELSE 0 END AS gamma_c_mktsegment,
           CASE WHEN l.c_acctbal = r.c_acctbal THEN 2
                WHEN abs(l.c_acctbal - r.c_acctbal) <= 50.0 THEN 1
                ELSE 0 END AS gamma_c_acctbal
    FROM customer l JOIN customer r ON l.c_nationkey = r.c_nationkey
    WHERE l.c_custkey < r.c_custkey
    """,
)
def linkage_relink_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-link on a different field set (E6): the reference enriches
    with unique_id then links again on other columns
    (03_aml_entity_resolution.py:104-105, :115-133) — here the same
    pipeline parameterized with nation-only blocking and
    segment/balance comparisons."""
    cust = load_table(spark, sf_dir, "customer")
    comparisons = [
        exact_comparison("c_mktsegment"),
        numeric_bucket_comparison("c_acctbal", tolerance=50.0),
    ]
    pairs = candidate_pairs(
        cust, "c_custkey", [["c_nationkey"]], compare_cols=["c_mktsegment", "c_acctbal"]
    )
    return gamma_table(pairs, comparisons).select(
        "uid_l", "uid_r", "gamma_c_mktsegment", "gamma_c_acctbal"
    )
