"""Linkage module tests: blocking never exceeds block sizes, gammas are
deterministic, and EM separates known duplicates from known distinct
records (the reference's BNY Mellon scenario,
/root/reference/03_aml_entity_resolution.py:30-54)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anti_money_laundering_spark.linkage import (
    candidate_pairs,
    em_fit,
    exact_comparison,
    gamma_table,
    levenshtein_comparison,
    link_dedupe,
    score_pairs,
    term_frequencies,
)


@pytest.fixture(scope="module")
def dedupe_df(spark):
    # Mirrors the reference's seed shape: org_name variants that are
    # near-duplicates, blocked on amount (03:30-54).
    rows = [
        (1, "bny mellon", "london", "uk", 100.0),
        (2, "bny melon", "london", "uk", 100.0),  # dup of 1 (typo)
        (3, "hsbc holdings", "leeds", "uk", 100.0),  # distinct, same block
        (4, "goldman sachs", "new york", "us", 200.0),
        (5, "goldman sacks", "new york", "us", 200.0),  # dup of 4
        (6, "morgan stanley", "boston", "us", 200.0),
        (7, "deutsche bank", "frankfurt", "de", 300.0),
    ]
    return spark.createDataFrame(
        rows, "unique_id long, org_name string, city string, country string, amount double"
    )


def test_blocking_bounds_pairs(dedupe_df):
    pairs = candidate_pairs(dedupe_df, "unique_id", [["amount"]])
    got = {(r.uid_l, r.uid_r) for r in pairs.collect()}
    # block 100.0 -> {1,2,3} = 3 pairs; block 200.0 -> {4,5,6} = 3; 300.0 -> none
    assert got == {(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6)}


def test_blocking_multiple_rules_dedup(dedupe_df):
    pairs = candidate_pairs(dedupe_df, "unique_id", [["amount"], ["country"]])
    # country rule adds nothing new (same partitions) — union must dedupe
    assert pairs.count() == 6


def test_gamma_levels(spark, dedupe_df):
    pairs = candidate_pairs(dedupe_df, "unique_id", [["amount"]])
    comps = [levenshtein_comparison("org_name", close=2), exact_comparison("city")]
    g = gamma_table(pairs, comps)
    got = {(r.uid_l, r.uid_r): (r.gamma_org_name, r.gamma_city) for r in g.collect()}
    assert got[(1, 2)] == (1, 1)  # levenshtein("bny mellon","bny melon")=1, same city
    assert got[(1, 3)] == (0, 0)
    assert got[(4, 5)] == (1, 1)


def test_em_separates_dupes(spark, dedupe_df):
    comps = [levenshtein_comparison("org_name", close=2), exact_comparison("city")]
    scored = link_dedupe(dedupe_df, "unique_id", [["amount"]], comps, tf_adjust=False)
    probs = {(r.uid_l, r.uid_r): r.match_probability for r in scored.collect()}
    dup_pairs = [(1, 2), (4, 5)]
    distinct_pairs = [(1, 3), (2, 3), (4, 6), (5, 6)]
    worst_dup = min(probs[p] for p in dup_pairs)
    best_distinct = max(probs[p] for p in distinct_pairs)
    assert worst_dup > best_distinct
    assert worst_dup > 0.5


def test_em_params_deterministic(spark, dedupe_df):
    comps = [levenshtein_comparison("org_name", close=2)]
    pairs = candidate_pairs(dedupe_df, "unique_id", [["amount"]])
    g = gamma_table(pairs, comps)
    p1 = em_fit(g, comps, max_iter=5)
    p2 = em_fit(g, comps, max_iter=5)
    assert p1 == p2


def test_tf_adjustment_downweights_common_values(spark):
    # 8 records in one block: 'smith' appears 6 times, 'zorn' twice.
    rows = [(i, "smith" if i < 6 else "zorn", 1.0) for i in range(8)]
    df = spark.createDataFrame(rows, "unique_id long, name string, amount double")
    comps = [levenshtein_comparison("name", close=1, tf_adjust=True)]
    pairs = candidate_pairs(df, "unique_id", [["amount"]])
    g = gamma_table(pairs, comps)
    params = em_fit(g, comps, max_iter=5)
    tf = {"name": term_frequencies(df, "name")}
    scored = score_pairs(g, comps, params, tf_tables=tf)
    w = {(r.uid_l, r.uid_r): r.match_weight for r in scored.collect()}
    # agreement on rare 'zorn' must outweigh agreement on common 'smith'
    assert w[(6, 7)] > w[(0, 1)]


def test_tf_floor_bounds_table_and_falls_back_to_baseline_u(spark):
    # 'smith' x6, 'zorn' x2, 'quine' x1: min_count=2 keeps only values
    # seen twice — the floor that bounds the TF table by construction.
    rows = [(i, "smith", 1.0) for i in range(6)] + [
        (6, "zorn", 1.0), (7, "zorn", 1.0), (8, "quine", 1.0)
    ]
    df = spark.createDataFrame(rows, "unique_id long, name string, amount double")
    tf = term_frequencies(df, "name", min_count=2)
    vals = {r.value: r.tf for r in tf.collect()}
    assert set(vals) == {"smith", "zorn"}
    # denominator stays ALL non-null rows: surviving tf is unchanged
    assert vals["smith"] == pytest.approx(6 / 9)
    # floored-out values score with the level's baseline u, i.e. the
    # same weight as a no-TF run; kept values still get adjusted
    comps = [levenshtein_comparison("name", close=1, tf_adjust=True)]
    pairs = candidate_pairs(df, "unique_id", [["amount"]])
    g = gamma_table(pairs, comps)
    params = em_fit(g, comps, max_iter=5)
    with_tf = {(r.uid_l, r.uid_r): r.match_weight
               for r in score_pairs(g, comps, params, tf_tables={"name": tf}).collect()}
    without = {(r.uid_l, r.uid_r): r.match_weight
               for r in score_pairs(g, comps, params).collect()}
    # (8, x) pairs disagree on name -> unaffected; smith-smith adjusted
    assert with_tf[(0, 1)] != pytest.approx(without[(0, 1)])
    # a disagreeing pair takes the gamma=0 branch where TF never applies
    assert with_tf[(5, 6)] == pytest.approx(without[(5, 6)])


def test_scored_pairs_probability_range(spark, dedupe_df):
    comps = [levenshtein_comparison("org_name", close=2), exact_comparison("country")]
    scored = link_dedupe(dedupe_df, "unique_id", [["amount"]], comps, tf_adjust=True)
    rows = scored.collect()
    assert all(0.0 <= r.match_probability <= 1.0 for r in rows)
    assert len(rows) == 6


def test_em_fit_empty_pairs_raises(spark):
    from anti_money_laundering_spark.linkage import em_fit, exact_comparison

    comps = [exact_comparison("name")]
    empty = spark.createDataFrame([], "uid_l long, uid_r long, gamma_name int")
    with pytest.raises(ValueError, match="no candidate pairs"):
        em_fit(empty, comps)


def test_jw_hybrid_matches_reference_loop_on_every_edge_class():
    """The r14 DuckDB-kernel fast path must be value-identical to the
    reference per-pair loop on every input class it routes: bulk ASCII
    (fast path), NULLs, empty strings (''=='' is 1.0 here, 0.0 in raw
    DuckDB), non-ASCII (DuckDB compares UTF-8 bytes, the reference
    compares codepoints), mixed batches, and high-collision alphabets
    that stress the match/transposition scan."""
    import random

    import duckdb
    import numpy as np
    import pandas as pd

    from anti_money_laundering_spark.linkage import _jw_ref, _jw_score_batch

    con = duckdb.connect()
    con.execute("SET threads TO 1")

    random.seed(20260818)
    cases = [
        (None, "x"), ("x", None), (None, None),
        ("", ""), ("", "a"), ("a", ""),
        ("élève", "éleve"), ("żółć", "zolc"), ("a", "à"),
        ("same", "same"), ("a", "a"), ("ab", "ba"),
        ("martha", "marhta"), ("dwayne", "duane"), ("dixon", "dicksonx"),
    ]
    for alpha in ("ab", "abcde", "abcdefghijklmnopqrstuvwxyz0123456789#, .-'"):
        for _ in range(4000):
            s1 = "".join(random.choice(alpha) for _ in range(random.randint(1, 25)))
            s2 = "".join(random.choice(alpha) for _ in range(random.randint(1, 25)))
            cases.append((s1, s2))
    a = pd.Series([c[0] for c in cases], dtype=object)
    b = pd.Series([c[1] for c in cases], dtype=object)
    got = _jw_score_batch(a, b, con).to_numpy()
    exp = np.array(
        [_jw_ref(x, y) for x, y in zip(a.to_numpy(object), b.to_numpy(object))],
        dtype=np.float64,
    )
    same = (got == exp) | (np.isnan(got) & np.isnan(exp))
    assert same.all(), [
        (a[i], b[i], got[i], exp[i]) for i in np.flatnonzero(~same)[:5]
    ]
