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
