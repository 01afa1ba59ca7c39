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


def test_window_queries_all_oracled():
    # Round-3 curation: every window query carries a DuckDB oracle, so
    # the driver's correctness gate is 50/50 hash-compared. Rows-only
    # queries (simhash, IVF, streaming-state internals, fitted LBFGS)
    # live past the window where the driver records a weaker check and
    # pytest asserts their contracts.
    cat = get_catalog()
    rows_only = {n for n in _WINDOW if cat[n].oracle is None}
    assert not rows_only, f"rows-only queries inside the window: {rows_only}"
