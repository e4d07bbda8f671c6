"""T6 — zero-fill alignment across series (main.py:686-696; README.md:137).

Series shorter than the grid contribute literal 0 for missing slots, so
every (series, t) pair exists. Bug B2 fixed: the reference computes the
grid length as ``len(max(datapoints.values()))`` — lexicographic max of
lists, not max length (main.py:684). Intent per README.md:137: grid
length = MAX series length.

Spark design: build the full grid as ``distinct series × range(N)`` and
left-join the values, ``coalesce(value, 0)``. The series dimension is
tiny (config-driven) -> broadcast it onto the generated grid; the join
with the fact table shuffles on (series_id, t) only once, and at scale
both sides can be pre-partitioned on the same keys to avoid even that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_macie_activity_generator_spark.operators.generators import time_grid


def zero_fill(
    spark: SparkSession,
    df: DataFrame,
    n_points: int | None = None,
    series_col: str = "series_id",
    t_col: str = "t",
    value_col: str = "value",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Return a DataFrame with one row per (series, t in 0..N-1).

    ``n_points`` defaults to the max series length (B2 intent). Columns in
    ``carry_cols`` are per-series attributes (e.g. shape, run_id) carried
    onto filled rows via the series dimension.
    """
    if n_points is None:
        n_points = df.agg(F.max(t_col)).first()[0]
        n_points = int(n_points) + 1 if n_points is not None else 0

    series_dim = df.select(series_col, *carry_cols).distinct()
    grid = time_grid(spark, n_points).withColumnRenamed("t", t_col)
    full = grid.crossJoin(F.broadcast(series_dim))

    filled = full.join(
        df.select(series_col, t_col, value_col),
        on=[series_col, t_col],
        how="left",
    ).withColumn(value_col, F.coalesce(F.col(value_col), F.lit(0).cast("double")))
    return filled
