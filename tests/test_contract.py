"""Driver-contract shape regression (round 5).

The driver's correctness gate checks the FIRST 50 ``queries()``
entries in registry order; rounds 3 and 4 both let the registry outgrow
that window, silently dropping the tail from CORRECTNESS_r*.json. These
tests make the constraint structural."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_registry_fits_driver_window():
    qs = entrymod.queries()
    assert len(qs) <= 50, (
        f"{len(qs)} queries — the driver only checks the first 50; "
        "merge additions into an existing suite (engine/suites.py)"
    )


def test_every_query_has_an_oracle():
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs
    assert qs - os_ == set(), f"rows-only entries: {sorted(qs - os_)}"


def test_merged_singles_stay_available():
    """Consolidation must never delete the underlying operators: every
    MERGED_AWAY single keeps its (fn, sql) in its module registry."""
    from engine.queries import SQL_QUERIES
    from engine.spatial_queries import SPATIAL_QUERIES
    from engine.suites import MERGED_AWAY
    from engine.text_queries import TEXT_QUERIES

    allsingles = {**SQL_QUERIES, **TEXT_QUERIES, **SPATIAL_QUERIES}
    for name in MERGED_AWAY:
        assert name in allsingles, name
        fn, sql = allsingles[name]
        assert callable(fn) and isinstance(sql, str) and sql.strip(), name
    # and none of them leak into the driver registry alongside a suite
    assert MERGED_AWAY.isdisjoint(entrymod.queries())
