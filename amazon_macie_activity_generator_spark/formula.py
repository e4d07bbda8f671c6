"""G5/T4 formula translation: blueprint ``formula`` strings -> Spark SQL.

The reference ``eval()``s user formulas with ``t`` (and ``datapoints``)
in scope (``main.py:464-477`` custom generator, ``:636-639`` anomaly
formula) — arbitrary code execution its own README warns about
(README.md:37). We never eval: a small whitelist parser (Python ``ast``
on the *grammar* only) translates the documented surface — arithmetic,
``t``, numeric literals, ``max(datapoints)``/``min(datapoints)``/
``len(datapoints)``, and a few math calls — into a SQL expression string
for ``F.expr``. Anything outside the whitelist raises at *analyze* time.

Catalyst then treats the formula as a first-class expression: constant
folding, codegen, pushdown all apply. No custom rule needed.
"""

from __future__ import annotations

import ast
import math

# formula call name -> SQL function name (arity-1 math whitelist)
_MATH_FUNCS = {
    "sin": "sin", "cos": "cos", "tan": "tan", "sqrt": "sqrt", "abs": "abs",
    "exp": "exp", "log": "ln", "floor": "floor", "ceil": "ceil",
}
# aggregate(datapoints) -> placeholder column name the caller must provide
AGG_PLACEHOLDERS = {
    "max": "__datapoints_max__",
    "min": "__datapoints_min__",
    "len": "__datapoints_len__",
    "sum": "__datapoints_sum__",
}


class FormulaError(ValueError):
    pass


def translate_formula(formula: str, t_col: str = "t") -> tuple[str, set[str]]:
    """Translate a blueprint formula to a SQL expression string.

    Returns ``(sql, needed_aggs)`` where ``needed_aggs`` is the set of
    placeholder columns (e.g. ``__datapoints_max__``) the caller must
    attach (scalar agg -> broadcast/cross join) before ``F.expr(sql)``.
    """
    try:
        tree = ast.parse(formula, mode="eval")
    except SyntaxError as e:  # pragma: no cover - message path
        raise FormulaError(f"unparseable formula {formula!r}: {e}") from e
    needed: set[str] = set()

    def emit(node: ast.AST) -> str:
        if isinstance(node, ast.Expression):
            return emit(node.body)
        if (
            isinstance(node, ast.Constant)
            and isinstance(node.value, (int, float))
            and not isinstance(node.value, bool)  # True would emit a SQL
            # boolean literal that fails analysis while the driver-side
            # interpreter happily computes t + 1 — reject symmetrically
        ):
            if isinstance(node.value, float):
                # DOUBLE, not the bare literal: Spark parses `0.5` as
                # DECIMAL(1,1), so literal-only arithmetic would run in
                # decimal (divisions rounded at scale 12) while the
                # driver-side interpreter computes IEEE doubles — the
                # formula-grammar fuzz caught `(0.5 / 3)` returning a
                # Decimal. CAST is constant-folded by Catalyst.
                if math.isinf(node.value) or math.isnan(node.value):
                    # `1e999` parses to float inf, whose repr "inf" Spark
                    # would read as a column reference — use the string
                    # form both engines cast correctly
                    s = "NaN" if math.isnan(node.value) else (
                        "Infinity" if node.value > 0 else "-Infinity")
                    return f"CAST('{s}' AS DOUBLE)"
                return f"CAST({node.value!r} AS DOUBLE)"
            return repr(node.value)
        if isinstance(node, ast.Name):
            if node.id == "t":
                return f"CAST({t_col} AS DOUBLE)"
            if node.id == "datapoint_max":
                # the reference's anomaly-formula variable (main.py:628
                # exposes `datapoint_max = int(np.max(datapoints))`
                # alongside t) — max(datapoints) truncated toward zero,
                # which is exactly CAST AS BIGINT
                needed.add(AGG_PLACEHOLDERS["max"])
                return f"CAST({AGG_PLACEHOLDERS['max']} AS BIGINT)"
            raise FormulaError(
                f"unknown variable {node.id!r} (only 't'/'datapoint_max' allowed)"
            )
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, (ast.USub, ast.UAdd)):
            sign = "-" if isinstance(node.op, ast.USub) else "+"
            return f"({sign}{emit(node.operand)})"
        if isinstance(node, ast.BinOp):
            l, r = emit(node.left), emit(node.right)
            if isinstance(node.op, ast.Add):
                return f"({l} + {r})"
            if isinstance(node.op, ast.Sub):
                return f"({l} - {r})"
            if isinstance(node.op, ast.Mult):
                return f"({l} * {r})"
            if isinstance(node.op, ast.Div):
                return f"({l} / {r})"
            if isinstance(node.op, ast.Mod):
                # Python FLOORED mod (result takes the divisor's sign),
                # not pmod (always-positive) — the reference eval()s the
                # formula with Python semantics, and the driver-side
                # recurrence interpreter uses `%`; both evaluators of one
                # formula must agree for negative divisors too.
                #
                # Emitted as CPython's own float_rem algorithm: C fmod
                # (Spark's `mod` on doubles is Java `%` = fmod) plus a
                # divisor-sign correction when the signs disagree. The
                # earlier `l - floor(l/r)*r` emulation is NOT Python `%`
                # under IEEE doubles: for `1 % (1/5)`, `1/(1/5)` rounds
                # to exactly 5.0 so it returned 0.0 where fmod-based
                # Python returns 0.19999999999999996 (hypothesis-found,
                # pinned in tests/test_formula_fuzz.py). fmod is exact at
                # every magnitude, so this form also removes the old
                # 2^53 divergence zone. NaN operands: Spark evaluates
                # `NaN <> 0` true and `NaN < 0` false, so the branch adds
                # r or nothing — either way NaN propagates, matching
                # Python's `nan % r` / `l % nan`.
                m = f"mod({l}, {r})"
                return (
                    f"({m} + (CASE WHEN {m} <> 0 AND ({m} < 0) <> ({r} < 0) "
                    f"THEN {r} ELSE 0 END))"
                )
            if isinstance(node.op, ast.Pow):
                return f"power({l}, {r})"
            raise FormulaError(f"operator {type(node.op).__name__} not allowed")
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.keywords:
                raise FormulaError("only simple calls f(x) are allowed")
            name = node.func.id
            # max(datapoints) & friends -> precomputed scalar placeholder
            if (
                name in AGG_PLACEHOLDERS
                and len(node.args) == 1
                and isinstance(node.args[0], ast.Name)
                and node.args[0].id == "datapoints"
            ):
                ph = AGG_PLACEHOLDERS[name]
                needed.add(ph)
                return ph
            if name in _MATH_FUNCS and len(node.args) == 1:
                return f"{_MATH_FUNCS[name]}({emit(node.args[0])})"
            raise FormulaError(f"call {name!r} not in whitelist")
        raise FormulaError(f"syntax {type(node).__name__} not allowed in formulas")

    return emit(tree), needed


_SAFE_MATH = {
    "sin": math.sin, "cos": math.cos, "tan": math.tan, "sqrt": math.sqrt,
    "abs": abs, "exp": math.exp, "log": math.log, "floor": math.floor,
    "ceil": math.ceil,
}
_SAFE_AGGS = {"max": max, "min": min, "len": len, "sum": sum}


def eval_formula_step(formula: str, t: int, datapoints: list[float]) -> float:
    """Evaluate ONE recurrence step v[t] = f(t, datapoints=v[0..t-1]) by
    interpreting the whitelisted AST — never ``eval``.

    The reference's custom generator runs ``eval(formula, locals())`` with
    the partially-built ``datapoints`` list in scope (main.py:473-475), so
    formulas like ``sum(datapoints) + 1`` define recurrences. A recurrence
    consumes its own prefix — inherently sequential — so the engine
    computes these driver-side per series (num_points <= 20,160) and
    parallelizes the resulting values like a replayed real series.

    Same whitelist as :func:`translate_formula` plus the four
    ``datapoints`` aggregates; anything else raises FormulaError. An
    aggregate over the empty prefix at t=0 mirrors Python semantics
    (``max``/``min`` raise — as the reference would crash — while
    ``sum``/``len`` are 0)."""
    tree = ast.parse(formula, mode="eval")

    def ev(node: ast.AST):
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if (
            isinstance(node, ast.Constant)
            and isinstance(node.value, (int, float))
            and not isinstance(node.value, bool)
        ):
            return node.value
        if isinstance(node, ast.Name):
            if node.id == "t":
                return t
            if node.id == "datapoint_max":
                try:
                    # int() like main.py:628 (truncates toward zero) —
                    # keeps this evaluator aligned with the SQL
                    # CAST(... AS BIGINT) in translate_formula
                    return int(max(datapoints))
                except ValueError as e:
                    raise FormulaError(
                        "datapoint_max over the empty prefix at t=0"
                    ) from e
            raise FormulaError(
                f"unknown variable {node.id!r} (only 't'/'datapoint_max' allowed)"
            )
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, (ast.USub, ast.UAdd)):
            v = ev(node.operand)
            return -v if isinstance(node.op, ast.USub) else +v
        if isinstance(node, ast.BinOp):
            l, r = ev(node.left), ev(node.right)
            if isinstance(node.op, ast.Add):
                return l + r
            if isinstance(node.op, ast.Sub):
                return l - r
            if isinstance(node.op, ast.Mult):
                return l * r
            if isinstance(node.op, ast.Div):
                return l / r
            if isinstance(node.op, ast.Mod):
                return l % r
            if isinstance(node.op, ast.Pow):
                v = l ** r
                # (-8) ** 0.5 is complex in Python but NaN in SQL power();
                # mirror SQL so both evaluators agree (and eval_recurrence's
                # float() never sees a complex)
                return float("nan") if isinstance(v, complex) else v
            raise FormulaError(f"operator {type(node.op).__name__} not allowed")
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.keywords:
                raise FormulaError("only simple calls f(x) are allowed")
            name = node.func.id
            if (
                name in _SAFE_AGGS
                and len(node.args) == 1
                and isinstance(node.args[0], ast.Name)
                and node.args[0].id == "datapoints"
            ):
                try:
                    return _SAFE_AGGS[name](datapoints)
                except ValueError as e:
                    raise FormulaError(
                        f"{name}(datapoints) over the empty prefix at t=0 "
                        "(the reference crashes here too)"
                    ) from e
            if name in _MATH_FUNCS and len(node.args) == 1:
                return _SAFE_MATH[name](ev(node.args[0]))
            raise FormulaError(f"call {name!r} not in whitelist")
        raise FormulaError(f"syntax {type(node).__name__} not allowed in formulas")

    return ev(tree)


def eval_recurrence(formula: str, num_points: int) -> list[float]:
    """Full recurrence series: v[t] = f(t, v[0..t-1]) for t in [0, n)."""
    values: list[float] = []
    for t in range(num_points):
        values.append(float(eval_formula_step(formula, t, values)))
    return values
