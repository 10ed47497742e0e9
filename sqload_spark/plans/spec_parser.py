"""Column-type-spec parser — the generator's front end.

Grammar (same surface the reference accepts, /root/reference/generate_csv.cpp:336-351):

    input   = element [',' element]...
    element = type | type '(' num ')' | type '(' num ',' num ')'
    type    = [A-Za-z0-9]+
    num     = [0-9]+

Semantics replicated from the reference parser (expectElement,
generate_csv.cpp:302-334):

* the whole input is lowercased first (generate_csv.cpp:366);
* a single ``(n)`` argument lands in ``length`` — so ``decimal(10)`` keeps
  the DEFAULT precision/scale (16, 6), exactly like the reference
  (generate_csv.cpp:312-315 vs the DataType defaults at :20);
* a two-arg form sets ``precision, scale`` and zeroes ``length``, with the
  ``precision < scale → precision = scale`` fixup (generate_csv.cpp:323-326);
* error strings match the reference throws: "Unexpected EOL",
  "No int value found in (...)", "No type found while parsing",
  "Unterminated bracket!" (generate_csv.cpp:258/270/295/329).

Unknown type names are NOT a parse error — they generate empty-string
columns downstream (generate_csv.cpp:239-241).
"""

from __future__ import annotations

from dataclasses import dataclass

DEFAULT_PRECISION = 16
DEFAULT_SCALE = 6

KNOWN_TYPES = frozenset(
    {
        "key",
        "rkey",
        "bit",
        "tinyint",
        "smallint",
        "mediumint",
        "int",
        "bigint",
        "float",
        "double",
        "char",
        "nchar",
        "varchar",
        "varchar2",
        "nvarchar2",
        "text",
        "blob",
        "date",
        "datetime",
        "timestamp",
        "time",
        "year",
        "decimal",
        "number",
    }
)


class SpecParseError(ValueError):
    """Raised with the reference's exact error message text."""


@dataclass
class ColumnSpec:
    type: str
    length: int = 0
    precision: int = DEFAULT_PRECISION
    scale: int = DEFAULT_SCALE


def _skip_space(s: str, pos: int) -> int:
    while pos < len(s) and s[pos] == " ":
        pos += 1
    return pos


def _expect_int(s: str, pos: int) -> tuple[int, int]:
    if pos >= len(s):
        raise SpecParseError("Unexpected EOL")
    start = pos
    while pos < len(s) and s[pos].isdigit():
        pos += 1
    if pos == start:
        raise SpecParseError("No int value found in (...)")
    return int(s[start:pos]), pos


def _expect_type(s: str, pos: int) -> tuple[str, int]:
    if pos >= len(s):
        raise SpecParseError("Unexpected EOL")
    start = pos
    while pos < len(s) and (s[pos].isalpha() or s[pos].isdigit()):
        pos += 1
    if pos == start:
        raise SpecParseError("No type found while parsing")
    return s[start:pos], pos


def _expect_element(s: str, pos: int) -> tuple[ColumnSpec, int]:
    pos = _skip_space(s, pos)
    if pos >= len(s):
        raise SpecParseError("Unexpected EOL")
    spec = ColumnSpec(type="")
    spec.type, pos = _expect_type(s, pos)
    if pos < len(s) and s[pos] == "(":
        pos += 1
        spec.length, pos = _expect_int(s, pos)
        pos = _skip_space(s, pos)
        if pos < len(s) and s[pos] == ",":
            pos += 1
            pos = _skip_space(s, pos)
            spec.precision = spec.length
            spec.length = 0
            spec.scale, pos = _expect_int(s, pos)
            pos = _skip_space(s, pos)
            if spec.precision < spec.scale:
                spec.precision = spec.scale
        if pos >= len(s) or s[pos] != ")":
            raise SpecParseError("Unterminated bracket!")
        pos += 1
    pos = _skip_space(s, pos)
    return spec, pos


def parse_spec(spec_string: str) -> list[ColumnSpec]:
    """Parse a comma-separated column spec into ColumnSpecs (input lowercased)."""
    s = spec_string.lower()
    specs: list[ColumnSpec] = []
    pos = 0
    while pos < len(s):
        spec, pos = _expect_element(s, pos)
        specs.append(spec)
        pos += 1  # skip the comma (or step past EOL), as the reference does
    return specs
