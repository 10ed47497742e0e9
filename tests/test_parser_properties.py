"""Hypothesis property tests for the spec parser (pure Python, no Spark):
round-trip arity, type preservation, and (p,s) law invariants over randomly
composed spec strings."""

from __future__ import annotations

from hypothesis import given, strategies as st

from sqload_spark.plans.spec_parser import (
    DEFAULT_PRECISION,
    DEFAULT_SCALE,
    KNOWN_TYPES,
    parse_spec,
)

types = st.sampled_from(sorted(KNOWN_TYPES))
lengths = st.integers(min_value=1, max_value=255)


@st.composite
def spec_elements(draw):
    t = draw(types)
    form = draw(st.integers(0, 2))
    if form == 0:
        return t, t
    if form == 1:
        n = draw(lengths)
        return f"{t}({n})", t
    p, s = draw(lengths), draw(lengths)
    return f"{t}({p},{s})", t


@given(st.lists(spec_elements(), min_size=1, max_size=12))
def test_parse_arity_and_types(elements):
    spec = ",".join(e[0] for e in elements)
    parsed = parse_spec(spec)
    assert len(parsed) == len(elements)
    assert [c.type for c in parsed] == [e[1] for e in elements]


@given(st.lists(spec_elements(), min_size=1, max_size=8))
def test_parse_case_and_space_insensitive(elements):
    spec = " , ".join(e[0].upper() for e in elements)
    parsed = parse_spec(spec)
    assert [c.type for c in parsed] == [e[1] for e in elements]


@given(lengths, lengths)
def test_precision_scale_law(p, s):
    c = parse_spec(f"decimal({p},{s})")[0]
    # reference fixup: precision < scale → precision = scale
    assert c.scale == s and c.precision == max(p, s) and c.length == 0


@given(lengths)
def test_single_arg_goes_to_length(n):
    c = parse_spec(f"decimal({n})")[0]
    assert c.length == n
    assert (c.precision, c.scale) == (DEFAULT_PRECISION, DEFAULT_SCALE)
