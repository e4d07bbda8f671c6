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
        if isinstance(node, ast.Constant) and isinstance(node.value, (int, float)):
            return repr(node.value)
        if isinstance(node, ast.Name):
            if node.id == "t":
                return f"CAST({t_col} AS DOUBLE)"
            raise FormulaError(f"unknown variable {node.id!r} (only 't' allowed)")
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
                return f"pmod({l}, {r})"
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
