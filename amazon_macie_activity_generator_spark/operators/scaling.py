"""T1/T2 — min-max rescale of a series into a target range.

Reference semantics (``main.py:340-357`` scale_range, ``:408-420``
scale_signal): ``ceil((x - min(x)) / (max(x) - min(x)) * (hi - lo) + lo)``
computed over the *whole series*, then (elsewhere) cast to int.

Reference bug B4 (SURVEY.md §2.2): constant input divides by zero ->
NaN/inf. Documented intent wins: constant series clamp to ``lo``.

Scale design: the naive translation is an unpartitioned window — a
single-reducer disaster at 100 TB. We compute per-key min/max with a
partial (map-side-combined) aggregation and broadcast-join the tiny
stats table back. One shuffle of *stats*, zero shuffles of data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scale_expr(value: Column, vmin: Column, vmax: Column, lo: Column, hi: Column, *, round_before_ceil: int | None = None) -> Column:
    """The scale_range arithmetic as a pure column expression.

    ``round_before_ceil`` rounds the pre-ceil float to N decimals — used by
    cross-engine oracle queries so libm sin() ULP differences between
    Spark and DuckDB cannot flip the ceil.
    """
    scaled = (value - vmin) / (vmax - vmin) * (hi - lo) + lo
    if round_before_ceil is not None:
        scaled = F.round(scaled, round_before_ceil)
    return F.when(vmax == vmin, F.ceil(lo)).otherwise(F.ceil(scaled))


def scale_minmax(
    df: DataFrame,
    value_col: str = "value",
    lo: float = 1.0,
    hi: float = 20.0,
    by: list[str] | None = None,
    out_col: str | None = None,
    round_before_ceil: int | None = None,
) -> DataFrame:
    """Rescale ``value_col`` into [lo, hi] per group (default: per series).

    Two-pass: groupBy-agg stats (partial aggregation -> tiny result) then
    broadcast join. At 100 TB the stats table is |distinct keys| rows —
    broadcastable for any realistic series count.
    """
    by = by if by is not None else ["series_id"]
    out_col = out_col or value_col
    v = F.col(value_col)
    stats = df.groupBy(*by).agg(
        F.min(v).alias("__vmin"), F.max(v).alias("__vmax")
    )
    if by:
        # null-SAFE equality on the group keys: a NULL group is still a
        # group (groupBy kept it and computed its stats), but a plain
        # `on=by` join drops NULL keys, silently un-scaling those rows —
        # SQL window engines (and the DuckDB oracle) keep them
        cond = None
        for c in by:
            eq = df[c].eqNullSafe(stats[c])
            cond = eq if cond is None else (cond & eq)
        joined = df.join(F.broadcast(stats), on=cond, how="left").drop(
            *[stats[c] for c in by]
        )
    else:
        # ungrouped: single global stats row, broadcast cross join
        joined = df.crossJoin(F.broadcast(stats))
    scaled = scale_expr(
        v, F.col("__vmin"), F.col("__vmax"), F.lit(float(lo)), F.lit(float(hi)),
        round_before_ceil=round_before_ceil,
    )
    return joined.withColumn(out_col, scaled).drop("__vmin", "__vmax")


def scale_signal(df: DataFrame, cfg: dict, value_col: str = "value", by: list[str] | None = None) -> DataFrame:
    """T2 — T1 with signal_min/max from config (defaults 1/20, main.py:63-64)."""
    lo = float(cfg.get("signal_min", 1))
    hi = float(cfg.get("signal_max", 20))
    return scale_minmax(df, value_col=value_col, lo=lo, hi=hi, by=by)
