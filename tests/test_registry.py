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


# Round-9 exception to the round-5 all-oracled-window policy (VERDICT r8
# #4): these two rows-only-BY-DESIGN generator tables have never received
# a driver row, and the harness does record rows-only entries inside the
# window (CORRECTNESS_r04 has one for sim_topk_hyperplane_lsh_pruned), so
# they occupy two slots THIS round to retire the "never-checked" bucket.
# Remove them from _PRIORITY (and from this whitelist) at the round-10
# rotation.
_STAGED_ROWS_ONLY = {"gen_datasource_table", "gen_stream_table"}


def test_driver_window_is_fully_hash_checkable():
    """Round-5 window policy: all 50 window slots carry DuckDB oracles —
    rows-only entries give the weaker check and belong after the fold
    (round-9 exception above)."""
    window = list(registry.all_queries())[:50]
    rows_only = [n for n in window if n not in registry.ORACLES]
    stray = [n for n in rows_only if n not in _STAGED_ROWS_ONLY]
    assert not stray, f"rows-only queries occupying window slots: {stray}"
