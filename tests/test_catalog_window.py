"""The driver records correctness rows for only the first
``DRIVER_WINDOW`` catalog queries (round-1 lesson). These invariants
keep the curated window honest as queries are added.

Round-6 relaxation (r5 verdict item 2): tag coverage counts the
PERMANENT ATTESTATION LEDGER — queries with a full hash-green driver
row in a committed ``CORRECTNESS_r0N.json`` — alongside the current
window. The ledger is recomputed mechanically from the committed
correctness files here, so it cannot drift from the evidence: a tag is
covered iff some carrier is in the window THIS round or was
hash-attested by the driver in a PRIOR round. This is what lets the
keep core shrink to 8 canaries and the remaining never-attested
queries rotate through, closing full-catalog attestation by round 7
(schedule committed as ``_R7_PLAN``).
"""

from __future__ import annotations

import json
from pathlib import Path

from anti_money_laundering_spark.plans.catalog import (
    DRIVER_WINDOW,
    _R7_PLAN,
    _ROWS_ONLY_UNATTESTABLE,
    _WINDOW,
    get_catalog,
)

REPO_ROOT = Path(__file__).resolve().parents[1]


def attestation_ledger() -> dict[str, list[str]]:
    """name -> sorted list of round files with a full hash-green driver
    row (rows+schema+hash all matched). Recomputed from the committed
    CORRECTNESS_r0N.json files — the permanent evidence record."""
    ledger: dict[str, list[str]] = {}
    for path in sorted(REPO_ROOT.glob("CORRECTNESS_r*.json")):
        rows = json.loads(path.read_text())
        for name, row in rows.items():
            if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                ledger.setdefault(name, []).append(path.name)
    return ledger


def driver_rowed() -> set[str]:
    """Names that have EVER received any driver correctness row (green
    or not) — the set whose complement is the attestation debt."""
    rowed: set[str] = set()
    for path in REPO_ROOT.glob("CORRECTNESS_r*.json"):
        rowed.update(json.loads(path.read_text()))
    return rowed


def test_window_fits_and_names_exist():
    cat = get_catalog()
    assert len(_WINDOW) <= DRIVER_WINDOW, f"window over budget: {len(_WINDOW)}"
    missing = [n for n in _WINDOW if n not in cat]
    assert not missing, f"window names not registered: {missing}"
    # get_catalog iteration order puts the window first, verbatim
    assert tuple(cat)[: len(_WINDOW)] == _WINDOW


def test_every_tag_covered_by_window_or_ledger():
    """Every tag carried by an out-of-window query must be carried by an
    in-window query OR by a query the driver hash-attested in a
    committed prior round. (Rounds 1-5 required window-only coverage;
    see module docstring for why the ledger now counts.)"""
    cat = get_catalog()
    window = set(_WINDOW)
    covered: set[str] = set()
    for name in _WINDOW:
        covered.update(cat[name].tags)
    for name in attestation_ledger():
        if name in cat:
            covered.update(cat[name].tags)
    uncovered = {
        name: [t for t in q.tags if t not in covered]
        for name, q in cat.items()
        if name not in window and any(t not in covered for t in q.tags)
    }
    assert not uncovered, f"tags covered neither in-window nor by ledger: {uncovered}"


def test_window_queries_all_oracled():
    # Round-3 curation: every window query carries a DuckDB oracle, so
    # the driver's correctness gate is 50/50 hash-compared. Rows-only
    # queries live past the window (exception: _ROWS_ONLY_UNATTESTABLE
    # may enter the r7 window for their one rows-only driver row).
    cat = get_catalog()
    rows_only = {
        n for n in _WINDOW if cat[n].oracle is None and n not in _ROWS_ONLY_UNATTESTABLE
    }
    assert not rows_only, f"rows-only queries inside the window: {rows_only}"


def test_window_is_mostly_first_time_attestations():
    """r5 verdict item 1: >=27 window slots must be queries with NO
    driver row in any committed prior round (the driver then gives them
    their first row this round)."""
    rowed = driver_rowed()
    first_time = [n for n in _WINDOW if n not in rowed]
    assert len(first_time) >= 27, (
        f"only {len(first_time)} first-time attestations in window: {first_time}"
    )


def test_r7_plan_closes_attestation():
    """The committed round-7 schedule must account for every catalog
    query that will still lack a driver row after this round's window
    runs: catalog = rowed-in-a-prior-round ∪ current window ∪ _R7_PLAN
    ∪ _ROWS_ONLY_UNATTESTABLE, and the r7 window (core + plan +
    rows-only exceptions) must fit the 50-slot budget."""
    cat = get_catalog()
    accounted = driver_rowed() | set(_WINDOW) | set(_R7_PLAN) | _ROWS_ONLY_UNATTESTABLE
    unaccounted = [n for n in cat if n not in accounted]
    assert not unaccounted, f"queries with no attestation path: {unaccounted}"
    # _R7_PLAN entries must be real, oracled, and genuinely unattested
    for n in _R7_PLAN:
        assert n in cat, f"_R7_PLAN name not registered: {n}"
        assert cat[n].oracle is not None, f"_R7_PLAN entry not oracled: {n}"
    overlap = set(_R7_PLAN) & (driver_rowed() | set(_WINDOW))
    assert not overlap, f"_R7_PLAN entries already attested or windowed: {overlap}"
    core_size = 8  # the keep core documented at the top of _WINDOW
    assert core_size + len(_R7_PLAN) + len(_ROWS_ONLY_UNATTESTABLE) <= DRIVER_WINDOW
