"""Cross-engine-pinned decimal rounding.

``round(x, dp)`` is NOT portable on half boundaries: Spark rounds
HALF_UP on the shortest decimal representation (37.87875 -> 37.8788)
while DuckDB rounds the binary double (37.87874999... -> 37.8787).
Driver data rarely lands on a boundary, but any averaged/derived value
can — the non-finite-values sweep caught ``rolling_stats`` flipping a
4-dp digit when an inserted row shifted a moving window onto one.

``floor(x * 10^dp + 0.5) / 10^dp`` is the SAME IEEE arithmetic in both
engines, so the boundary resolves identically. Note the convention:
this is round-half-toward-+INFINITY (half-ceiling), not HALF_UP
away-from-zero — a NEGATIVE half boundary rounds up (-2.5 -> -2 at
dp=0, where Spark's round() would give -3). Cross-engine agreement is
the contract; callers comparing against away-from-zero conventions
must not use this on negative half boundaries. Two caveats, both
handled here:

- Spark's ``floor`` returns LONG and silently SATURATES at int64 max,
  so past ``|x| >= ~9.2e(18-dp)`` the trick corrupts the value (DuckDB's
  ``floor`` stays double). Guarded: out-of-range values pass through
  unrounded — identically in both engines.
- NaN/±Inf would hit the same saturation; ``abs(x) < bound`` is false
  for NaN and Inf, so they also pass through untouched.

For dp=4 the guard bound is 9e14 (int64 max / 1e4, floored to one digit
of headroom).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _bound(dp: int) -> float:
    # int64 max is ~9.22e18; keep one leading digit of headroom
    return 9.0 * 10.0 ** (14 - (dp - 4))


def round_fixed(col: Column, dp: int = 4) -> Column:
    """Half-toward-+inf round to ``dp`` decimals, bit-identical across
    engines (see module docstring for the negative-half convention)."""
    scale = float(10 ** dp)
    rounded = F.floor(col * scale + F.lit(0.5)) / F.lit(scale)
    return F.when(F.abs(col) < F.lit(_bound(dp)), rounded).otherwise(col)


def sql_round_fixed(expr: str, dp: int = 4) -> str:
    """DuckDB twin of :func:`round_fixed` — same guard, same arithmetic."""
    scale = float(10 ** dp)
    return (
        f"CASE WHEN abs({expr}) < {_bound(dp):g} "
        f"THEN floor(({expr}) * {scale:g} + 0.5) / {scale:g} "
        f"ELSE ({expr}) END"
    )
