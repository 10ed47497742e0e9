"""Vector math over ``array<float>`` embedding columns — pure Catalyst
expressions (``zip_with`` / ``aggregate``), no UDFs, so similarity scans stay
inside whole-stage codegen and scale with partitions.

All arithmetic is done in double (the float32 inputs are upcast first) so
results are reproducible against the DuckDB oracle's DOUBLE[] math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — left-to-right fold, deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays."""
    return dot(a, b) / (norm(a) * norm(b))
