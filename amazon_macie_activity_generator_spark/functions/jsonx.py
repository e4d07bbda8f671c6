"""Cross-engine-pinned JSON property extraction.

At crawl scale ``props`` is routinely malformed, and the two engines'
native JSON stacks disagree at the edges (measured on pyspark 4.1.2 /
duckdb bundled in this sandbox):

- **ANSI cast is a job killer.** Spark 4 defaults to ANSI mode, so
  ``get_json_object(props,'$.k').cast('long')`` THROWS
  ``CAST_INVALID_INPUT`` on ``{"k": 1.5}`` or ``{"k": "abc"}`` — one bad
  row kills a 1000-executor job. Every data-driven string→number cast
  must be ``try_cast``.
- **DuckDB TRY_CAST(varchar AS BIGINT) rounds and parses hex**:
  ``'1.5'``→2, ``'2.0'``→2, ``'1e3'``→1000, ``'0x10'``→16 — Spark's
  ``try_cast`` rejects all four (NULL). Pinned by requiring the extracted
  text to match the integral regex ``^\\s*[+-]?[0-9]+\\s*$`` in BOTH
  engines before casting.
- **Parser leniency differs in both directions.** Spark's Jackson-based
  ``get_json_object`` accepts single-quoted keys and trailing garbage
  (``{"k":1} trailing`` → 1); DuckDB's yyjson ``json_valid`` rejects
  those but ACCEPTS trailing commas (``{"k":1,}``). Neither
  ``from_json`` with strictness options nor Spark 4's variant
  ``try_parse_json`` reproduces ``json_valid`` (variant also flips
  duplicate-key resolution to last-wins and canonicalizes ``2.0``→"2").

Pinned contract (the intersection both engines can express natively):

1. payload must be an object: ``trim(props)`` starts ``{`` and ends ``}``;
2. no trailing comma: reject on ``,\\s*[}\\]]`` anywhere;
3. strict parse gate: Spark ``from_json`` with Jackson leniency OFF
   (single quotes / unquoted names / leading zeros / NaN-Infinity all
   rejected); DuckDB ``json_valid``;
4. value at ``$.k`` via ``get_json_object`` — FIRST duplicate key wins,
   same as DuckDB ``json_extract_string`` (variant/from_json would take
   the LAST);
5. value text must be integral (regex above), then ``try_cast``.

Residual, explicitly pinned divergence (tests/test_adversarial_props.py
``test_residual_parser_divergence``): balanced-looking trailing garbage
that still ends in ``}`` — e.g. ``{"k":1}}`` — passes Jackson's
first-document parse but fails ``json_valid``. Not expressible as a
regex in either engine without brace counting; documented instead of
hidden, and the pin test fails loudly if a parser upgrade moves it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.dedup import JAVA_WS

# Integral-text guard. NOT `\s`: Java \s includes \x0B (vertical tab),
# RE2 \s does not, so a bare \s silently de-syncs the two gates on
# VT-padded numerics (both engines' casts DO trim VT, so the gate is the
# only divergence point). Interpolate the explicit JAVA_WS class, same
# as every tokenizer regex in this repo. Anchored \z, not $: Java's $
# matches BEFORE a final NEL/LS/PS line terminator while RE2's matches
# only at end of text, so '7<U+0085>' would pass the Spark gate only
# (masked today by both casts rejecting NEL — pin the gate itself).
INTEGRAL_RE = rf"^[{JAVA_WS}]*[+-]?[0-9]+[{JAVA_WS}]*\z"
# Trailing comma before a closing brace/bracket — DuckDB's yyjson
# accepts it, Jackson does not; reject in both. Same explicit-WS rule.
# NOTE (pinned over-rejection): this scans string CONTENTS too, so valid
# JSON like {"k":1,"s":"a,]b"} is rejected in BOTH engines — the gate is
# an intersection contract, symmetric by construction, and brace-aware
# scanning is not expressible as a regex in either engine.
_TRAILING_COMMA_RE = rf",[{JAVA_WS}]*[}}\]]"
# Jackson with every leniency feature switched off (mirrors json_valid
# as closely as Jackson can go).
_STRICT_OPTS = {
    "allowSingleQuotes": "false",
    "allowUnquotedFieldNames": "false",
    "allowNumericLeadingZeros": "false",
    "allowNonNumericNumbers": "false",
    "allowBackslashEscapingAnyCharacter": "false",
    "allowUnquotedControlChars": "false",
    "columnNameOfCorruptRecord": "_corrupt",
}


def props_object_gate(col: str | Column) -> Column:
    """Boolean: props passes the pinned object-payload validity gate."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return (
        trimmed.startswith("{")
        & trimmed.endswith("}")
        & ~c.rlike(_TRAILING_COMMA_RE)
        # strict parse gate. PERMISSIVE from_json returns a non-null
        # struct even for corrupt input (all fields null), so struct
        # nullity can't gate — route the corrupt record into a probe
        # column and require it empty.
        & F.from_json(c, "__probe__ string, _corrupt string", _STRICT_OPTS)
        .getField("_corrupt")
        .isNull()
    )


def extract_int_prop(col: str | Column, path: str = "$.k") -> Column:
    """Integer property at ``path``, NULL on anything outside the pinned
    contract. Never throws under ANSI."""
    c = F.col(col) if isinstance(col, str) else col
    raw = F.get_json_object(c, path)
    return F.when(
        props_object_gate(c) & raw.rlike(INTEGRAL_RE), raw.try_cast("long")
    )


def sql_int_prop(expr: str = "props", path: str = "$.k") -> str:
    """DuckDB twin of :func:`extract_int_prop` — same five gate steps,
    same explicit JAVA_WS whitespace class (RE2 ``\\s`` lacks ``\\x0B``)."""
    ws = JAVA_WS
    return f"""
      CASE WHEN trim({expr}) LIKE '{{%' AND trim({expr}) LIKE '%}}'
                AND NOT regexp_matches({expr}, ',[{ws}]*[}}\\]]')
                AND json_valid({expr})
                AND regexp_matches(json_extract_string({expr}, '{path}'),
                                   '^[{ws}]*[+-]?[0-9]+[{ws}]*\\z')
           THEN TRY_CAST(json_extract_string({expr}, '{path}') AS BIGINT)
      END"""
