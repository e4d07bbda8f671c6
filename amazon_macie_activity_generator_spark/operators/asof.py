"""As-of (most-recent-match) join — the canonical time-series join Spark
has no built-in for.

For each left row, attach the latest right row whose timestamp is <= the
left row's, within the same key group (market data: trade -> most recent
quote; here: event -> most recent prior event of another type).

Spark-first implementation: NOT a range self-join (quadratic blowup) and
NOT a per-key Python loop. Tag both sides, union, and take a running
``last(value, ignorenulls)`` over a window partitioned by key and ordered
by (ts, side) — right rows sort before left rows at equal timestamps, so
ties match (<= semantics, same as DuckDB's ASOF JOIN). Cost: ONE shuffle
on the key + a sort within partitions — the merge-join plan you'd want at
100 TB; state per key is one running value, never the whole right side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: list[str] | None = None,
    value_col: str = "value",
    out_col: str = "asof_value",
) -> DataFrame:
    """Left as-of join: every left row + the value of the latest right row
    with ``right.ts <= left.ts`` in the same ``by`` group (null if none).

    ``right`` should be unique per (by, ts) — pre-aggregate if not, or the
    match among equal-ts right rows is unspecified.
    """
    by = by if by is not None else ["user_id"]
    # side 0 = right (sorts first at equal ts => <= tie matches), 1 = left
    r = right.select(
        *by, ts_col, F.col(value_col).alias("__rv"), F.lit(0).alias("__side")
    )
    lcols = [c for c in left.columns if c not in set(by) | {ts_col}]
    l = left.select(
        *by, ts_col, *lcols, F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        F.lit(1).alias("__side"),
    )
    unioned = l.unionByName(r.select(*by, ts_col, *[F.lit(None).cast(l.schema[c].dataType).alias(c) for c in lcols], "__rv", "__side"))
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(out_col, F.last("__rv", ignorenulls=True).over(w))
    return matched.filter(F.col("__side") == 1).select(*by, ts_col, *lcols, out_col)
