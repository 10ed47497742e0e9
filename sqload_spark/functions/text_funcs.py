"""Text primitives over the `documents` table: tokenization, shingling,
hashing-based signatures (MinHash, SimHash, rolling-hash fingerprints) —
all Catalyst array/hash expressions, no Python in the row path.

These are the building blocks for the dedup / text-analysis operators; at
100 TB every one of them is a narrow projection that runs map-side before
any shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker words for the stopword-based language-ID heuristic. The scored
# languages match the corpus labels {de, en, es, fr, zh}.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "and", "of"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("的", "了", "是", "在", "和"),
}

STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "has")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the corpus is space-separated words)."""
    return F.split(text, " ")


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles, as an array of strings."""
    toks = tokens(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + F.lit(k)) for k in range(n)]
            ),
        )
    )


def shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct shingles as 64-bit hashes (compact dedup signature input)."""
    return F.transform(shingles(text, n), lambda s: F.xxhash64(s))


def minhash_signature(hashes: Column, num_perm: int, seed: int = 0) -> list[Column]:
    """MinHash signature: for each of `num_perm` hash families, the minimum
    re-hash over the element set. Pure expressions — one pass, map-side."""
    return [
        F.array_min(F.transform(hashes, lambda h: F.xxhash64(h, F.lit(seed), F.lit(i))))
        .alias(f"mh{i}")
        for i in range(num_perm)
    ]


def simhash64(toks: Column) -> Column:
    """64-bit SimHash of a token array: bit j is the sign of Σ(±1) over
    token-hash bit j. Built as a sum over 64 bit-contribution expressions."""
    th = F.transform(F.array_distinct(toks), lambda t: F.xxhash64(t))

    def bit_contrib(j: int):
        return lambda acc, h: acc + F.when(
            F.shiftrightunsigned(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for j in range(64):
        # bit 63 is the sign bit of the signed long carrier
        bit_value = (1 << j) if j < 63 else -(1 << 63)
        bit_sum = F.aggregate(th, F.lit(0).cast("long"), bit_contrib(j))
        out = out.bitwiseOR(
            F.when(bit_sum > 0, F.lit(bit_value).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def rolling_fingerprints(toks: Column, window: int = 4) -> Column:
    """Winnowing-style document fingerprints: hash every `window`-token
    span, keep the per-document minima set (here: the k smallest span
    hashes) as the fingerprint."""
    span_hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(window - 1), F.lit(1))),
        lambda i: F.xxhash64(
            F.concat_ws(" ", *[F.element_at(toks, i + F.lit(k)) for k in range(window)])
        ),
    )
    return F.slice(F.array_sort(F.array_distinct(span_hashes)), 1, 8)
