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


def exact_decimal_sum(col: Column, scale: int = 4, precision: int = 18) -> Column:
    """Order-independent sum for fixed-decimal data: cast each value to
    DECIMAL(p,s) (recovering the exact decimal the double approximates),
    sum exactly, cast back to double.

    Needed because floating sums are order-dependent: Spark's partial-agg
    combine order vs DuckDB's can differ by an ulp, which flips a
    subsequent rounding when the true sum sits on a .5 boundary (observed
    on sums of 4-decimal price products)."""
    return F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")


def sql_exact_decimal_sum(expr: str, scale: int = 4, precision: int = 18) -> str:
    return f"CAST(sum(CAST(({expr}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"
