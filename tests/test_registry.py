"""Registry hygiene: the external driver checks the FIRST 50 entries of
the ordered registry, so a typo in _PRIORITY would silently burn a window
slot on a rotated-out query. These tests make that failure loud."""

from __future__ import annotations

from sqload_spark import registry

registry.load_all()


def test_priority_names_all_registered():
    unknown = [n for n in registry._PRIORITY if n not in registry.QUERIES]
    assert not unknown, f"_PRIORITY names not in registry: {unknown}"


def test_priority_has_no_duplicates():
    assert len(registry._PRIORITY) == len(set(registry._PRIORITY))


def test_driver_window_is_fully_hash_checkable():
    """Round-5 window policy: all 50 window slots carry DuckDB oracles —
    rows-only entries give the weaker check and belong after the fold.
    (The round-9 staged exception for the two generator tables was unwound
    at the round-10 rotation once CORRECTNESS_r09 recorded their first
    driver rows; the policy is back in force with no whitelist.)"""
    window = list(registry.all_queries())[:50]
    rows_only = [n for n in window if n not in registry.ORACLES]
    assert not rows_only, f"rows-only queries occupying window slots: {rows_only}"
