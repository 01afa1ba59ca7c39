"""The driver records correctness rows for only the first
``DRIVER_WINDOW`` catalog queries (round-1 lesson). These invariants
keep the curated window honest as queries are added: every operator tag
must be covered INSIDE the window, and the window must actually fit."""

from __future__ import annotations

from anti_money_laundering_spark.plans.catalog import DRIVER_WINDOW, _WINDOW, get_catalog


def test_window_fits_and_names_exist():
    cat = get_catalog()
    assert len(_WINDOW) <= DRIVER_WINDOW, f"window over budget: {len(_WINDOW)}"
    missing = [n for n in _WINDOW if n not in cat]
    assert not missing, f"window names not registered: {missing}"
    # get_catalog iteration order puts the window first, verbatim
    assert tuple(cat)[: len(_WINDOW)] == _WINDOW


def test_every_tag_covered_inside_window():
    cat = get_catalog()
    window = set(_WINDOW)
    covered: set[str] = set()
    for name in _WINDOW:
        covered.update(cat[name].tags)
    uncovered = {
        name: [t for t in q.tags if t not in covered]
        for name, q in cat.items()
        if name not in window and any(t not in covered for t in q.tags)
    }
    assert not uncovered, f"tags only covered OUTSIDE the driver window: {uncovered}"


def test_window_queries_prefer_oracles():
    # Rows-only queries inside the window must be the documented
    # non-SQL-expressible set, nothing else silently joining them.
    cat = get_catalog()
    rows_only = {n for n in _WINDOW if cat[n].oracle is None}
    allowed = {
        "dedup_minhash_near_dups",  # hash-family-specific candidates
        "dedup_simhash_candidates",
        "ann_lsh_topk",  # hyperplane-bucket-specific
        "ann_ivf_topk",  # KMeans-quantizer-specific
        "multimodal_classify",  # stub model distribution
        "stream_session_stats",  # streaming state semantics
        "stream_tumbling_counts",
        "stream_user_totals",
    }
    assert rows_only <= allowed, f"unexpected rows-only in window: {rows_only - allowed}"
