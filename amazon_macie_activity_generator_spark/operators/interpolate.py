"""Linear gap interpolation over sparse per-series time grids.

Extension operator (no reference counterpart — the reference zero-fills
missing slots, T6 `src/main.py:686-696`; this is the repair-step
generalization a timeseries pipeline needs when 0 is not a neutral value).

Scale design: both neighbor lookups are RUNNING window frames
(unboundedPreceding..currentRow over t ascending, and the same frame over
t descending) — O(n) streaming state per series. A
currentRow..unboundedFollowing frame re-aggregates the shrinking frame
per row (O(n^2) per series); the descending formulation is the
equivalent-but-linear plan. One shuffle on the series key total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# Hard bound on one series' expanded slot count. A single corrupt
# timestamp (year 9999) would otherwise make sequence() build a
# multi-billion-element array in ONE task and kill the job — at crawl
# scale corrupt timestamps are a certainty, and a guard rail beats an
# OOM. Spans beyond the cap truncate at t0 + cap - 1 (guard semantics,
# not a feature: quarantine wild timestamps upstream with the
# events_time_gate entry for full-fidelity output). 500k minute-slots
# ≈ 0.95 years; driver data spans ~6 days.
MAX_GRID_SLOTS = 500_000


def expand_grid(sparse: DataFrame, series_col: str = "series_id",
                t_col: str = "t") -> DataFrame:
    """Expand each series to its full [min(t), max(t)] slot range, null
    value for unobserved slots, span-capped at MAX_GRID_SLOTS. At 100 TB
    the per-series sequence stays bounded by each series' own span
    (never a global grid) AND by the cap."""
    value_cols = [c for c in sparse.columns if c not in (series_col, t_col)]
    bounds = sparse.groupBy(series_col).agg(
        F.min(t_col).alias("__t0"), F.max(t_col).alias("__t1")
    )
    grid = bounds.select(
        series_col,
        F.explode(
            F.sequence(
                "__t0",
                F.least(F.col("__t1"), F.col("__t0") + F.lit(MAX_GRID_SLOTS - 1)),
            )
        ).alias(t_col),
    )
    return grid.join(sparse.select(series_col, t_col, *value_cols),
                     [series_col, t_col], "left")


def interpolate_linear(full: DataFrame, series_col: str = "series_id",
                       t_col: str = "t", value_col: str = "value") -> DataFrame:
    """Fill null values by linear interpolation between the nearest
    observed neighbors; edge gaps hold the boundary value. Adds
    ``was_gap``; keeps all other columns untouched."""
    wf = (
        Window.partitionBy(series_col).orderBy(t_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wb = (
        Window.partitionBy(series_col).orderBy(F.desc(t_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v = F.col(value_col)
    t = F.col(t_col)
    prev_v = F.last(value_col, ignorenulls=True).over(wf)
    next_v = F.last(value_col, ignorenulls=True).over(wb)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(wf)
    next_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(wb)
    interp = F.when(v.isNotNull(), v).otherwise(
        F.when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t))
    )
    return full.withColumn("was_gap", v.isNull()).withColumn(value_col, interp)
