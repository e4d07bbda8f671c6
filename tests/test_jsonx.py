"""Cross-engine pin for the JSON property-extraction contract
(functions/jsonx.py). Spark 4's ANSI default made the old
``get_json_object(..).cast('long')`` a job-killer on non-integral
values, and the two engines' JSON stacks disagree in BOTH directions at
the edges (DuckDB rounds decimal text, parses hex, accepts trailing
commas; Jackson accepts single quotes and trailing garbage). The table
below is the agreed surface; the residual divergence class is pinned
explicitly so a parser upgrade that moves it fails loudly.
"""

from __future__ import annotations

import duckdb
import pytest

from amazon_macie_activity_generator_spark.functions.jsonx import (
    extract_int_prop,
    sql_int_prop,
)

# (props, expected-k) — expected is identical for both engines
AGREED = [
    ('{"k": 1}', 1),
    ('{"k": 1, "k": 2}', 1),          # duplicate key: FIRST wins both
    ('{"k": "3"}', 3),
    ('{"k": 1.5}', None),             # DuckDB TRY_CAST would round to 2
    ('{"k": 1e3}', None),             # ... and parse scientific to 1000
    ('{"k": true}', None),
    ('{"k": null}', None),
    ('{"k": [1,2]}', None),
    ('{"k": {"a":1}}', None),
    ('{"k": 99999999999999999999}', None),  # > int64
    ('{"k": -9223372036854775808}', -9223372036854775808),
    ('{"k": 9223372036854775807}', 9223372036854775807),
    ('{"k": " 7 "}', 7),
    ('{"k":1} trailing', None),       # Jackson-lenient; gated by tail check
    ('{k: 1}', None),
    ("{'k': 1}", None),               # single quotes: strict from_json gate
    ('{"k": 01}', None),
    ('{"K": 1}', None),
    ('{"k": "0x10"}', None),          # DuckDB TRY_CAST would parse hex = 16
    ("", None),
    (None, None),
    ('{"k": "\\u0031\\u0032"}', 12),  # unicode-escaped digits
    ("[1,2,3]", None),
    ('"just a string"', None),
    ('{"k": Infinity}', None),
    ('{"k": NaN}', None),
    ('{"a": {"k": 5}, "k": 6}', 6),   # $.k is top-level only
    ('{"k": 2.0}', None),
    ('{"k": "1.9"}', None),
    ('{"k": "+5"}', 5),
    ('{"k": ""}', None),
    ('  {"k": 8}  ', 8),
    ('{"k": "12\\n"}', 12),            # ESCAPED newline inside value: ok
    ('{"k": "12\n"}', None),          # LITERAL control char: invalid both
    ("null", None),
    ("{}", None),
    ('{"k": 5, "j": }', None),
    ('{"k": 1,}', None),              # trailing comma: DuckDB-lenient, gated
    ('﻿{"k": 2}', None),         # BOM
    ('{"k": "007"}', 7),
    ('{"k": "\\t42\\t"}', 42),         # escaped tabs trim fine
    ('{"k": "\t42\t"}', None),        # literal tabs: invalid both
    # Java-vs-RE2 \s divergence pin (r7 review finding): \x0B is Java
    # whitespace but not RE2 whitespace; both casts DO trim it, so the
    # integral gate must use the explicit JAVA_WS class or Spark=7 vs
    # DuckDB=NULL on VT-padded numerics.
    ('{"k": "\\u000B7"}', 7),          # escaped VT inside value: agrees
    ('{"k": "\x0b7"}', None),         # literal VT: invalid JSON both
    # NEL: \z-anchored gate rejects in both engines (Java $ would have
    # matched before the trailing U+0085 NEL — the fuzzy_name_pairs anchor
    # divergence, pinned here in the gate itself)
    ('{"k": "7\\u0085"}', None),
    ('{"j": {"k": 9}}', None),
    ('{"x": "' + "y" * 100000 + '", "k": 11}', 11),   # 100 KB sibling value
    ('{"a":' * 40 + "1" + "}" * 40, None),            # depth-40, no k
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _spark_vals(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, props string"
    )
    got = {
        r["i"]: r["k"]
        for r in df.select("i", extract_int_prop("props").alias("k")).collect()
    }
    return [got[i] for i in range(len(texts))]


def test_agreed_surface_both_engines(spark, duck):
    texts = [c for c, _ in AGREED]
    want = [e for _, e in AGREED]
    assert _spark_vals(spark, texts) == want
    got_duck = [
        duck.execute(f"SELECT {sql_int_prop('$1', '$.k')}", [t]).fetchone()[0]
        for t in texts
    ]
    assert got_duck == want


def test_residual_parser_divergence(spark, duck):
    """Balanced-looking trailing garbage that still ends in '}' passes
    Jackson's first-document parse but fails yyjson's json_valid. Not
    regex-expressible without brace counting; pinned per-engine so any
    parser upgrade that moves the boundary is caught, not hidden."""
    residual = ['{"k": 1}}', '{"k": 1} }']
    assert _spark_vals(spark, residual) == [1, 1]          # Jackson-lenient
    got_duck = [
        duck.execute(f"SELECT {sql_int_prop('$1', '$.k')}", [t]).fetchone()[0]
        for t in residual
    ]
    assert got_duck == [None, None]                        # yyjson-strict


def test_never_throws_under_ansi(spark):
    """The crash class that motivated the rewrite: non-integral $.k under
    Spark 4 ANSI. One malformed crawl row must not kill the stage."""
    hostile = [
        '{"k": 1.5}', '{"k": "abc"}', '{"k": 9' + "9" * 400 + "}",
        '{"a":' * 2000 + "1" + "}" * 2000,         # deep nesting
        '{"k": "' + "z" * 500000 + '"}',           # 500 KB value
        "\x00\x01\x02", "{" * 10000,
        # 2 MB of commas inside a string value: the trailing-comma regex
        # scans the whole payload — must stay linear, no backtracking
        # (probed: ~1 s/row in Spark, agree cross-engine at MB scale)
        '{"k": 1.5, "pad": "' + "z," * 1_000_000 + '"}',
    ]
    vals = _spark_vals(spark, hostile)
    assert vals == [None] * len(hostile)


def test_deep_nesting_agrees(spark, duck):
    """Depth where both parsers still accept: value extraction agrees.
    (Extreme depth is a robustness case above, not a parity case — the
    engines' depth limits differ and deep docs carry no k anyway.)"""
    doc = '{"a":' * 30 + "1" + "}" * 30
    docs = ['{"k": 4, "pad": ' + doc + "}", doc]
    assert _spark_vals(spark, docs) == [4, None]
    got = [
        duck.execute(f"SELECT {sql_int_prop('$1', '$.k')}", [t]).fetchone()[0]
        for t in docs
    ]
    assert got == [4, None]
