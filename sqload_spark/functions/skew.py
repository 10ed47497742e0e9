"""Skew mitigation: salted joins and two-phase salted aggregation.

AQE's skew-join splitting handles most skew at runtime; these explicit
formulations are for the cases AQE can't see (e.g. a skewed aggregation
key, or a broadcast-ineligible dimension with one hot key). Salting spreads
ONE hot key over `salt_buckets` reducers at the cost of replicating the
other side / a second (tiny) aggregation.

Salts are deterministic (hash of stable row identity, not rand()), so
results are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, identity_cols: list[str], salt_buckets: int) -> DataFrame:
    """Add a deterministic `_salt` in [0, salt_buckets) derived from stable
    row identity columns."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in identity_cols]), F.lit(salt_buckets)).cast("int")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_identity: list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join on `key` with the left side salted and the right side replicated
    across all salt buckets: the shuffle key becomes (key, salt), splitting
    a hot key's rows over `salt_buckets` tasks."""
    salted_left = with_salt(left, left_identity, salt_buckets)
    replicated_right = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_left.join(replicated_right, [key, "_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: list[Column],
    identity_cols: list[str],
    salt_buckets: int = 8,
) -> DataFrame:
    """Two-phase aggregation: partial agg on (key, salt), final re-agg on
    key. Only useful for algebraic aggregates the caller composes as
    (partial_expr, final_expr) pairs — here specialized to sum/count by
    convention: pass partial aggs; the final phase sums every produced
    column."""
    salted = with_salt(df, identity_cols, salt_buckets)
    partial = salted.groupBy(key, "_salt").agg(*aggs)
    value_cols = [c for c in partial.columns if c not in (key, "_salt")]
    return partial.groupBy(key).agg(*[F.sum(c).alias(c) for c in value_cols])
