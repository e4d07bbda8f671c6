"""VERDICT r7 ask #6 — property-fuzz the formula translator.

``formula.py`` is the one custom parser in the engine and had
example-based tests only. This suite hypothesis-generates formulas from
the whitelist grammar itself and checks the engine's TWO evaluators of
that grammar against each other: ``translate_formula`` -> Spark
``F.expr`` (the G5 SQL path) vs ``eval_formula_step`` (the driver-side
recurrence interpreter, the reference's ``eval`` twin —
/root/reference/src/main.py:473-475).

Contract fuzzed: wherever the interpreter PRODUCES a float (no raise),
the SQL path must produce the same double (NaN == NaN), at FP tolerance.
Where the interpreter raises — ``max(datapoints)`` on an empty prefix,
division by zero, math-domain errors — the reference would crash too,
and the SQL path's behavior is that of the underlying SQL function
(pinned separately below, not fuzzed).

Two magnitude guards keep the property honest rather than flaky:
- Python int arithmetic is exact at any magnitude while SQL runs IEEE
  doubles, so formulas whose subexpressions exceed 1e12 are skipped,
  matching the engine's real domain (t <= 20,160, blueprint constants).
  (The mod emission itself no longer needs this guard: it is fmod plus
  divisor-sign correction — CPython's own float_rem — exact at every
  magnitude, unlike the earlier ``l - floor(l/r)*r`` form this fuzz
  falsified with ``(1 % (1 / 5))``.)
- Python int arithmetic is exact where SQL is double, so unbounded
  ``**`` towers are skipped by the same guard.
"""

from __future__ import annotations

import ast
import math

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from amazon_macie_activity_generator_spark.formula import (
    AGG_PLACEHOLDERS,
    eval_formula_step,
    translate_formula,
)

DATAPOINTS = [2.0, 5.5, 3.0, 4.25]
TS = [0, 1, 2, 3, 7]
_MAG_CAP = 1e12

_LEAVES = st.sampled_from([
    "0", "1", "2", "3", "5", "0.5", "1.5", "2.25",
    "t", "datapoint_max",
    "max(datapoints)", "min(datapoints)", "len(datapoints)", "sum(datapoints)",
])
_FUNCS = ["sin", "cos", "tan", "sqrt", "abs", "exp", "log", "floor", "ceil"]


def _compose(children: st.SearchStrategy) -> st.SearchStrategy:
    return st.one_of(
        st.tuples(st.sampled_from(["+", "-", "*", "/", "%", "**"]), children, children)
        .map(lambda x: f"({x[1]} {x[0]} {x[2]})"),
        children.map(lambda x: f"(-{x})"),
        st.tuples(st.sampled_from(_FUNCS), children).map(lambda x: f"{x[0]}({x[1]})"),
    )


FORMULAS = st.recursive(_LEAVES, _compose, max_leaves=8)


def _subexpressions_innermost_first(formula: str) -> list[ast.AST]:
    """Every expression node, INNERMOST FIRST (post-order). Order matters:
    the magnitude guard must reject an inner subexpression BEFORE the
    outer one is ever evaluated — ``(3 ** (3 ** (3 ** 3)))`` is rejected
    at the 3**27 ≈ 7.6e12 step instead of materializing a terabyte-sized
    Python int at the outer power."""
    tree = ast.parse(formula, mode="eval")
    out: list[ast.AST] = []

    def walk(node: ast.AST) -> None:
        for child in ast.iter_child_nodes(node):
            walk(child)
        if isinstance(node, (ast.BinOp, ast.UnaryOp, ast.Call, ast.Name, ast.Constant)):
            out.append(node)

    walk(tree)
    return out


def _interpreter_value(formula: str, t: int) -> float | None:
    """The interpreter's verdict at t, or None when this t is outside the
    comparable domain (interpreter raised, a subexpression's magnitude
    enters the documented mod-emulation divergence zone, or an int power
    could allocate an unbounded bignum)."""
    try:
        for node in _subexpressions_innermost_first(formula):
            # unbounded-bignum guard: by post-order, a Pow's operands are
            # already magnitude-checked (<= 1e12), but 2 ** 1e12 would
            # still be a 125 GB int — cap the exponent before evaluating
            if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Pow):
                rhs = eval_formula_step(ast.unparse(node.right), t, DATAPOINTS)
                if not math.isnan(rhs) and abs(rhs) > 1e4:
                    return None
            v = eval_formula_step(ast.unparse(node), t, DATAPOINTS)
            if not math.isnan(v) and abs(v) > _MAG_CAP:
                return None
        want = float(eval_formula_step(formula, t, DATAPOINTS))
    except (ArithmeticError, ValueError, MemoryError):
        return None  # ZeroDivision/Overflow/domain/bignum — not comparable
    if math.isinf(want):
        return None
    return want


@settings(max_examples=250, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@example("(t % (0 - 3))")            # floored mod, negative divisor
@example("((0 - t) % 3)")            # floored mod, negative dividend
@example("(1 % (1 / 5))")            # fmod vs floor-form: 1/(1/5) rounds to
                                     # exactly 5.0, so floor-form gave 0.0
                                     # where Python gives 0.19999999999999996
@example("(1 % (0 - (1 / 5)))")      # same, negative float divisor (the
                                     # divisor-sign correction on top of fmod)
@example("((0 - 2) ** 0.5)")         # complex in Python -> NaN both sides
@example("((0 - 2) ** 3)")           # negative base, integral exponent
@example("(datapoint_max % (0 - 2))")
@example("(sum(datapoints) % (0 - 1.5))")
@example("floor((0 - 0.5))")         # floor/ceil at negative halves
@example("ceil((0 - 0.5))")
@given(FORMULAS)
def test_sql_translation_matches_interpreter(spark, formula):
    sql, needed = translate_formula(formula)
    wants = {t: _interpreter_value(formula, t) for t in TS}
    ts = [t for t, w in wants.items() if w is not None]
    if not ts:
        return  # whole formula outside the comparable domain at every t
    df = spark.createDataFrame([(t,) for t in ts], "t long")
    for ph in needed:
        agg = {v: k for k, v in AGG_PLACEHOLDERS.items()}[ph]
        val = {"max": max, "min": min, "len": len, "sum": sum}[agg](DATAPOINTS)
        df = df.withColumn(ph, F.lit(float(val)))
    got = {
        r.t: r.v
        for r in df.select("t", F.expr(sql).alias("v")).collect()
    }
    for t in ts:
        want, have = wants[t], got[t]
        assert have is not None, (formula, t, want, "SQL returned NULL")
        have = float(have)  # belt: a typing regression to DECIMAL must
        # fail the value comparison below, not TypeError inside approx
        if math.isnan(want):
            assert math.isnan(have), (formula, t, want, have)
        else:
            assert have == pytest.approx(want, rel=1e-9, abs=1e-9), (
                formula, t, want, have)


# ---------------------------------------------------------------- pinned
# behavior OUTSIDE the comparable domain: both evaluators of a formula
# must FAIL on division by zero (the reference's eval would raise too;
# Spark's ANSI mode raises DIVIDE_BY_ZERO), never silently disagree.


def test_division_by_zero_raises_in_both_evaluators(spark):
    formula = "(1 / (t - t))"
    with pytest.raises(ZeroDivisionError):
        eval_formula_step(formula, 3, [])
    sql, _ = translate_formula(formula)
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO|divide by zero"):
        spark.createDataFrame([(3,)], "t long").select(F.expr(sql)).collect()


def test_mod_by_zero_raises_in_both_evaluators(spark):
    formula = "(t % (t - t))"
    with pytest.raises(ZeroDivisionError):
        eval_formula_step(formula, 3, [])
    sql, _ = translate_formula(formula)
    # fmod-based emission raises REMAINDER_BY_ZERO under ANSI mode (the
    # old floor-form raised DIVIDE_BY_ZERO via its embedded division)
    with pytest.raises(Exception, match="REMAINDER_BY_ZERO|by zero"):
        spark.createDataFrame([(3,)], "t long").select(F.expr(sql)).collect()


@given(st.sampled_from([
    "import os", "t.__class__", "__builtins__", "open('x')", "lambda: 1",
    "[1,2]", "{'a': 1}", "t if t else 1", "f'{t}'", "t @ t", "x",
    "pow(2, 10)", "max(1, 2)", "sin(t, t)", "'str'", "True", "None",
]))
def test_non_whitelisted_input_always_raises(bad):
    """Anything outside the grammar must raise FormulaError (or fail to
    parse) at ANALYZE time — the no-eval guarantee the parser exists for."""
    from amazon_macie_activity_generator_spark.formula import FormulaError

    with pytest.raises((FormulaError, SyntaxError)):
        translate_formula(bad)
