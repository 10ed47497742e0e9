"""Cross-engine-stable rounding.

Spark's ``round()`` is HALF_UP (BigDecimal semantics); DuckDB's rounds
half-to-even on doubles. When a value lands EXACTLY on a .5 boundary —
which genuinely happens for integer-derived ratios like ``n_distinct /
n_tokens`` — the two engines disagree by a full 10^-n and the oracle hash
mismatches deterministically.

Fix: round explicitly as ``floor(x * 10^n + 0.5) / 10^n`` in BOTH engines.
Every step is the same IEEE-754 double operation on the same input, so the
results are bit-identical. (Only well-defined for non-negative x, which is
all we round.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, n: int) -> Column:
    scale = float(10**n)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def sql_round_half_up(expr: str, n: int) -> str:
    scale = float(10**n)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
