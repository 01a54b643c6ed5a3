"""Registration tripwires.

Round 3 committed a query module (`windows2`) that was never imported
into ``queries/__init__`` — 327 LoC of dead code invisible to the
driver, bench, and certification. These tests make that impossible to
repeat: every module on disk with a ``QUERIES`` dict must be wired,
every query must have an oracle or an explicit rows-only marker, and
the certification window must stay a valid 50-entry slice.
"""

from __future__ import annotations

import importlib
import pkgutil

import datafusion_archive_spark.queries as qpkg
from datafusion_archive_spark.queries import (
    _ALL_QUERIES,
    _FIRST_50,
    ORACLES,
    QUERY_MODULES,
    ROWS_ONLY,
)


def _modules_on_disk():
    for info in pkgutil.iter_modules(qpkg.__path__):
        yield importlib.import_module(f"{qpkg.__name__}.{info.name}")


def test_every_query_module_is_registered():
    wired = {m.__name__ for m in QUERY_MODULES}
    for mod in _modules_on_disk():
        if hasattr(mod, "QUERIES"):
            assert mod.__name__ in wired, (
                f"{mod.__name__} defines QUERIES but is not in "
                "queries.QUERY_MODULES — its queries are dead code"
            )


def test_every_registered_query_reachable():
    for mod in QUERY_MODULES:
        for name in mod.QUERIES:
            assert name in _ALL_QUERIES, name


def test_every_query_has_oracle_or_rows_only_marker():
    for name in _ALL_QUERIES:
        assert name in ORACLES or name in ROWS_ONLY, (
            f"{name} has neither an oracle nor a ROWS_ONLY marker — "
            "add the DuckDB twin or document why it is rows-only"
        )
    # markers must not mask a real oracle, and must exist
    for name in ROWS_ONLY:
        assert name in _ALL_QUERIES, name
        assert name not in ORACLES, (
            f"{name} is marked ROWS_ONLY but has an oracle — remove one"
        )


def test_no_duplicate_query_names_across_modules():
    seen: dict[str, str] = {}
    for mod in QUERY_MODULES:
        for name in mod.QUERIES:
            assert name not in seen, (
                f"{name} defined in both {seen[name]} and {mod.__name__}"
            )
            seen[name] = mod.__name__


def test_certification_window_is_valid():
    assert len(_FIRST_50) == 50
    assert len(set(_FIRST_50)) == 50, "duplicate names in _FIRST_50"
    for name in _FIRST_50:
        assert name in _ALL_QUERIES, name


def test_rows_only_entries_stay_out_of_window():
    """A rows-only entry in the 50-slot certification window wastes
    the slot — the driver records it as a `no_oracle` err row while
    its real evidence is the differential pytest (VERDICT r5 #2)."""
    burned = set(_FIRST_50) & set(ROWS_ONLY)
    assert not burned, (
        f"rows-only entries {sorted(burned)} occupy certification "
        "slots — move them out of _FIRST_50"
    )


def test_oracles_have_no_orphans():
    for name in ORACLES:
        assert name in _ALL_QUERIES, f"oracle {name} has no query"
