"""Schema-level differential gate: every (query, oracle) pair must agree on
output dtypes under the driver's type-sensitive canonicalizer, and no query
may emit complex-typed (array/map/struct) columns the driver's pandas
canonicalizer can't hash. This is the automated version of the audit that
found round 1's four latent HUGEINT/Decimal hash bombs before the driver did.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from dtype_audit import audit  # noqa: E402


def test_all_oracle_pairs_dtype_identical():
    problems = audit("/root/testdata/sf0.001")
    assert not problems, "dtype mismatches vs driver gate:\n" + "\n".join(problems)


def test_driver_window_is_exactly_the_priority_list():
    """The correctness driver checks the FIRST 50 registry entries; the
    priority list must be exactly that window (no silent displacement when
    someone registers a new query)."""
    from sqload_spark import registry

    q = registry.all_queries()
    assert len(registry._PRIORITY) == 50
    assert list(q)[:50] == registry._PRIORITY
    # and every priority name must resolve (typos would silently shrink it)
    missing = [n for n in registry._PRIORITY if n not in q]
    assert not missing, f"priority names not registered: {missing}"
