"""Vector math over ``array<float>`` embedding columns — pure Catalyst
expressions (``zip_with`` / ``aggregate``), no UDFs, so similarity scans stay
inside whole-stage codegen and scale with partitions.

All arithmetic is done in double (the float32 inputs are upcast first) so
results are reproducible against the DuckDB oracle's DOUBLE[] math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


EMB_DIM = 64  # the pipeline's fixed model width — single-sourced here


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


def dot_expanded(a: Column, b: Column, dim: int = EMB_DIM) -> Column:
    """Σ aᵢ·bᵢ as a flat ``dim``-term scalar expression for HOT
    (per-candidate/per-pair) paths. Bit-identical to ``dot``'s fold — the
    expanded sum keeps the same left-to-right association — but runs
    inside whole-stage codegen instead of the interpreted higher-order
    evaluator (measured ~30% per-pair at 100 K pairs and 4× at 2 M pairs,
    BASELINE.md/dedup banded notes). Requires fixed-width vectors (the
    corpus contract: 64-dim) — ``element_at`` past the end would raise
    under ANSI, so only use on validated embedding columns."""
    e = F.element_at(a, 1) * F.element_at(b, 1)
    for i in range(2, dim + 1):
        e = e + F.element_at(a, i) * F.element_at(b, i)
    return e


def dot_expanded_sql(a: str, b: str, dim: int = EMB_DIM) -> str:
    """``dot_expanded`` as ONE SQL string over column/field names — for
    ``F.expr`` / ``selectExpr`` at hot CONSTRUCTION sites (r11, guide §1/§4:
    the per-term Python loop costs ~190 py4j round trips per dot — building
    a 32-plane LSH signature that way measured 5-11 s of driver-side build
    per invocation, all of it inside the benched wall. One string parsed
    server-side builds the identical tree: `+` is left-associative in both,
    so the Add chain and therefore every IEEE result is bit-identical).

    FORM CHOICE (re-measured r12): the expanded element_at sum only wins
    where the terms are already flat SCALAR columns (the banded re-rank's
    unpacked x{i}*b{i} over ~2M pairs — there it codegens compactly and
    beat the fold 4×). Over ARRAY columns, the 64 element_at calls
    generate a method past the whole-stage-codegen size limit: the stage
    falls back and the giant expression evaluates slowly EVERY run
    (profiled at sf0.1: a NO_CODEGEN session runs the same 80 K-pair plan
    2.6× faster, and the cost never amortizes across runs). For
    array-column pair paths use ``dot_fold_sql`` below — measured 1.3-2.5×
    faster per query across the seven sim entries, both A/B orders."""
    return " + ".join(
        f"element_at({a}, {i}) * element_at({b}, {i})" for i in range(1, dim + 1)
    )


def dot_fold_sql(a: str, b: str) -> str:
    """``dot`` (the zip_with/aggregate fold) as ONE SQL string — the hot
    form for ARRAY-column pair paths (see the form-choice note on
    ``dot_expanded_sql``). Same left-to-right association as ``dot`` and as
    the expanded sum apart from the leading ``0.0 +`` — IEEE-identical on
    every term sequence except an all-signed-zero dot (measure-zero; both
    forms carry multi-round oracle-green history). Width-agnostic: the
    fold never indexes past the end, so it needs no fixed-dim contract."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "0.0D, (acc, x) -> acc + x)"
    )


def cosine_fold_sql(a: str, b: str) -> str:
    """``cosine`` via ``dot_fold_sql`` (see the form-choice note)."""
    return (
        f"({dot_fold_sql(a, b)}) / "
        f"(sqrt({dot_fold_sql(a, a)}) * sqrt({dot_fold_sql(b, b)}))"
    )


def cosine_expanded_sql(a: str, b: str, dim: int = EMB_DIM) -> str:
    """``cosine_expanded`` as one SQL string (see ``dot_expanded_sql``)."""
    return (
        f"({dot_expanded_sql(a, b, dim)}) / "
        f"(sqrt({dot_expanded_sql(a, a, dim)}) * sqrt({dot_expanded_sql(b, b, dim)}))"
    )


def cosine_expanded(a: Column, b: Column, dim: int = EMB_DIM) -> Column:
    """``cosine`` with every dot product in expanded codegen form —
    bit-identical values (verified pairwise over the sf0.1 corpus).

    Per-PAIR use recomputes both self-norms per row (Spark has no
    cross-row CSE) — on n² paths precompute a norm column per vector
    map-side and divide by ``n_a * n_b`` instead (the _pruned_rerank /
    embedding_cosine_dups pattern); this helper is for bounded pair sets
    where the 3× arithmetic doesn't matter."""
    return dot_expanded(a, b, dim) / (
        F.sqrt(dot_expanded(a, a, dim)) * F.sqrt(dot_expanded(b, b, dim))
    )


# ---------------------------------------------------------------------------
# Embedding validity contract.
#
# A real 100 TB corpus contains degenerate vectors: all-zero (failed
# encoder call), NULL (missing row), NaN/inf or absurd magnitudes
# (serialization bugs). Cosine is UNDEFINED on a zero vector — under ANSI
# mode (Spark 4's default) the division even raises DIVIDE_BY_ZERO and
# kills the stage — and the fixed-point receipt paths (Gram matrix,
# centroid means) are exact only on bounded magnitudes. The engine's
# contract, applied identically in every embedding query AND its DuckDB
# oracle (so dirty corpora stay hash-comparable, see
# tools/adversarial_run.py): an embedding participates only if it is
# finite, |x| <= EMB_MAX_ABS on every coordinate, and has positive norm.
# Typical model embeddings are ~unit-norm, so on any sane corpus the
# filter keeps everything; on a dirty one both engines drop the same rows
# instead of crashing (Spark) or inventing cosine = -1 sentinels
# (DuckDB's list_cosine_similarity on a zero vector).
# ---------------------------------------------------------------------------
EMB_MAX_ABS = 1e6


def valid_embedding(v: Column) -> Column:
    """Contract predicate over a raw ``array<float>`` column. NULL input
    yields NULL (row dropped by ``filter``). NaN is excluded by the
    EXPLICIT ``isnan`` conjunct below — not by the magnitude bound: Spark
    orders NaN GREATER than every number (``NaN > 0`` is TRUE), so without
    the guard, NaN exclusion would ride on ``abs(NaN) <= EMB_MAX_ABS``
    happening to evaluate false, and a relaxed or reordered bound check
    could silently admit NaN vectors. DuckDB also sorts NaN above all
    numbers, so its oracle-side max-bound check rejects NaN the same way;
    inf fails the bound check in both engines.

    The EMB_DIM width check is part of the contract (round-7 review): the
    hot per-pair paths are flat EMB_DIM-term expanded sums, so a
    wrong-width vector that slipped past the filter would either raise
    INVALID_ARRAY_INDEX under ANSI (too short) or silently truncate the
    sum (too long) — the contract drops it on BOTH engines instead."""
    dv = to_double_array(v)
    return (
        (F.size(dv) == EMB_DIM)
        & (dot(dv, dv) > 0)
        & F.forall(dv, lambda x: ~F.isnan(x))
        & F.forall(dv, lambda x: F.abs(x) <= F.lit(EMB_MAX_ABS))
    )


# Same predicate for DuckDB oracles, over the raw `embedding` column. The
# leading IS NOT NULL must stay FIRST: DuckDB's list_dot_product raises on
# a NULL list when it is the first conjunct evaluated over a parquet scan
# (the AND mask shields it), while Spark's filter simply drops the NULL.
# The bound literal is interpolated from EMB_MAX_ABS so the Spark predicate
# and every DuckDB oracle share ONE constant (a hardcoded twin would let an
# edit to the Python constant silently desynchronize all oracles). NaN is
# rejected by the max-bound conjunct here (DuckDB sorts NaN above all
# numbers, so the list max of a NaN-bearing vector is NaN and NaN <= bound
# is false) — mirroring the Spark side's explicit isnan guard.
EMB_VALID_SQL = (
    "(embedding IS NOT NULL"
    f" AND len(embedding) = {EMB_DIM}"
    " AND list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0"
    " AND list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)), 'max')"
    f" <= {EMB_MAX_ABS!r})"
)
