"""Deterministic, distributed randomness as pure Catalyst column expressions.

The reference draws every value from ONE global sequential mt19937
(/root/reference/generate_csv.cpp:28-29) — non-deterministic (random_device
seed) and inherently single-threaded. At 100 TB that design is the
bottleneck, so we re-architect: every draw is a pure function of
``(row id, seed, column index, draw index)`` via ``xxhash64``:

* embarrassingly parallel — no coordination, no state, no shuffle;
* reproducible — the same seed yields the same table at ANY parallelism
  (unlike ``F.rand()``, which folds the partition id into its seed and so
  changes values when partitioning changes);
* codegen-friendly — everything stays inside whole-stage codegen; no UDFs.

Uniformity notes: ``pmod(hash, n)`` has modulo bias ≤ n/2^64 — immaterial
for every range here (the widest is 2^32). Full-width int64 draws use the
hash value directly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 0-9 A-Z a-z — the reference's varchar charset (generate_csv.cpp:66-67).
ALNUM62 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

_MAX_LONG = (1 << 63) - 1


def hash64(id_col: Column, *salts) -> Column:
    """Full-width deterministic 64-bit hash of (id, salts...)."""
    return F.xxhash64(id_col, *[F.lit(s) for s in salts])


def uniform_long(id_col: Column, lo: int, hi: int, *salts) -> Column:
    """Uniform integer in [lo, hi] (inclusive), as LongType."""
    n = hi - lo + 1
    if n <= 0:
        raise ValueError(f"empty range [{lo}, {hi}]")
    return F.pmod(hash64(id_col, *salts), F.lit(n)) + F.lit(lo)


def uniform_unit(id_col: Column, *salts) -> Column:
    """Uniform double in [0, 1)."""
    return (hash64(id_col, *salts).bitwiseAND(F.lit(_MAX_LONG))).cast("double") / F.lit(
        float(1 << 63)
    )


def _salt40(*salts) -> int:
    """Stable 40-bit constant from a salt tuple (md5-derived, python-side)."""
    import hashlib

    digest = hashlib.md5(repr(salts).encode()).digest()
    return int.from_bytes(digest[:8], "little") & ((1 << 40) - 1)


_ID_SPACING = 65536  # > max string length; rows < 2^47 stay overflow-free


def random_string(id_col: Column, length, charset: str, *salts) -> Column:
    """Random fixed- or variable-length string from `charset`.

    `length` may be an int or a Column. Per-character hashing is
    ``xxhash64(id*65536 + salt40 + pos)`` — a SINGLE long input, which
    measures ~1.5× faster than hashing (id, salts…, pos) as four values
    (the per-char hash dominates generation cost for varchar(50)). ANSI
    mode forbids wrapping multiplies, so the mix is bounded: id spacing
    65536 (> any string length) plus a 40-bit md5-derived column salt —
    no overflow below 2^47 rows, and two columns only share a shifted
    character stream if their salts land within max-length of each other
    (P ≈ 2⁻³²)."""
    chars = F.array(*[F.lit(c) for c in charset])
    length_col = F.lit(length) if isinstance(length, int) else length
    base = id_col * F.lit(_ID_SPACING) + F.lit(_salt40("str", charset[:8], *salts))
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), length_col),
            lambda pos: F.element_at(
                chars,
                (F.pmod(F.xxhash64(base + pos), F.lit(len(charset))) + F.lit(1)).cast("int"),
            ),
        ),
        "",
    )


# --- the rkey bijection (unique "random-looking" uint64) -------------------
#
# The reference guarantees global uniqueness WITHOUT coordination by pushing
# a counter through a bijection on uint64 (generate_csv.cpp:149-161,201-204):
# rotate-right-1, then segregate4 = three bit_permute_step rounds (a fixed
# bit shuffle from programming.sirrida.de/calcperm.php). Both are bijections,
# so distinct counters → distinct outputs. We reproduce the same bijection on
# Spark's signed longs (two's-complement bit patterns are identical) — a pure
# expression over `spark.range`'s id, so uniqueness is shuffle-free and scale-free.

_PERMUTE_STEPS = (
    (0x2222222222222222, 1),
    (0x0C0C0C0C0C0C0C0C, 2),
    (0x00F000F000F000F0, 4),
)


def _bit_permute_step(x: Column, mask: int, shift: int) -> Column:
    t = F.shiftrightunsigned(x, shift).bitwiseXOR(x).bitwiseAND(F.lit(mask))
    return x.bitwiseXOR(t).bitwiseXOR(F.shiftleft(t, shift))


def rkey_long(counter: Column) -> Column:
    """segregate4(rotr1(counter)) as a signed long (same 64 bits as the ref's uint64)."""
    rotated = F.shiftleft(counter, 63).bitwiseOR(F.shiftrightunsigned(counter, 1))
    x = rotated
    for mask, shift in _PERMUTE_STEPS:
        x = _bit_permute_step(x, mask, shift)
    return x


def as_uint64_decimal(signed: Column) -> Column:
    """Reinterpret a signed long's bits as unsigned, printable as the
    reference prints uint64 (values ≥ 2^63 appear; Spark has no unsigned
    type, so DecimalType(20,0) carries the value)."""
    dec = signed.cast("decimal(20,0)")
    return F.when(signed >= 0, dec).otherwise(
        (dec + F.lit("18446744073709551616").cast("decimal(21,0)")).cast("decimal(20,0)")
    )


def rkey_py(counter: int) -> int:
    """Pure-Python model of the rkey bijection (test oracle)."""
    mask64 = (1 << 64) - 1
    x = ((counter << 63) | (counter >> 1)) & mask64

    def step(x: int, m: int, shift: int) -> int:
        t = ((x >> shift) ^ x) & m
        return (x ^ t ^ ((t << shift) & mask64)) & mask64

    for m, s in _PERMUTE_STEPS:
        x = step(x, m, s)
    return x
