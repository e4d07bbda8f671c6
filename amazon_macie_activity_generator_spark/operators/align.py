"""T6 — zero-fill alignment across series (main.py:686-696; README.md:137).

Series shorter than the grid contribute literal 0 for missing slots, so
every (series, t) pair exists. Bug B2 fixed: the reference computes the
grid length as ``len(max(datapoints.values()))`` — lexicographic max of
lists, not max length (main.py:684). Intent per README.md:137: grid
length = MAX series length.

Spark design: build the full grid as ``distinct series × slots`` and
left-join the values, ``coalesce(value, 0)``. Slots come from
``range(N)`` when N is given, else from a lazy ``distinct t`` over the
input (identical for dense-rank series, and no driver-side action at
plan-build time). The series dimension is tiny (config-driven) ->
broadcast it onto the generated grid; the join with the fact table
shuffles on (series_id, t) only once, and at scale both sides can be
pre-partitioned on the same keys to avoid even that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_macie_activity_generator_spark.operators.generators import time_grid

# inner-sequence bound for the default (data-derived) grid: the largest
# array any single row/task materializes, regardless of max(t)
_GRID_CHUNK = 100_000


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
        # Default grid = 0..max(t) as a LAZY plan: a single-row max
        # aggregate exploded through sequence(). This keeps the
        # documented contract (every slot 0..N-1 exists, even slots
        # missing from ALL series — a distinct-t grid would silently
        # skip globally-absent slots for sparse callers) without the
        # pre-r7 df.agg(max(t)).first() at PLAN BUILD time — a full
        # scan executed before any timer starts (the triangle_count
        # eager-build failure class) and then re-executed by the
        # materialized query. Empty/all-NULL-t input → max is NULL →
        # sequence is NULL → explode yields no rows (no time, no
        # timeline — the empty-relation contract).
        #
        # TWO-LEVEL, not one sequence(0, mx): a single sequence would
        # materialize the whole grid as ONE array in ONE task — the
        # sequence()-explosion job-killer class the wild-timestamp round
        # pinned (a ~71M-element array killed the JVM). Instead the
        # one-row aggregate explodes into chunk ids (tiny array), a
        # repartition distributes the chunks, and each chunk explodes a
        # bounded _GRID_CHUNK-sized inner sequence — max per-task array
        # is _GRID_CHUNK elements regardless of grid size.
        par = max(int(spark.sparkContext.defaultParallelism), 1)
        mx = F.col("_mx")
        chunks = (
            df.select(F.col(t_col).cast("long").alias(t_col))
            .agg(F.max(t_col).alias("_mx"))
            # guard: sequence(0, negative) DESCENDS in Spark; t is a rank
            # (>= 0) by contract, so a negative-only input gets no grid
            .select(
                "_mx",
                F.explode(
                    F.when(
                        mx >= 0,
                        F.sequence(F.lit(0), F.floor(mx / _GRID_CHUNK).cast("long")),
                    )
                ).alias("_chunk"),
            )
            .repartition(par)
        )
        grid = (
            chunks.select(
                "_mx",
                "_chunk",
                F.explode(
                    F.sequence(F.lit(0), F.lit(_GRID_CHUNK - 1).cast("long"))
                ).alias("_off"),
            )
            .select(
                "_mx",
                (F.col("_chunk") * _GRID_CHUNK + F.col("_off")).alias(t_col),
            )
            .where(F.col(t_col) <= F.col("_mx"))
            .select(t_col)
        )
    else:
        grid = time_grid(spark, n_points).withColumnRenamed("t", t_col)

    series_dim = df.select(series_col, *carry_cols).distinct()
    full = grid.crossJoin(F.broadcast(series_dim))

    filled = full.join(
        df.select(series_col, t_col, value_col),
        on=[series_col, t_col],
        how="left",
    ).withColumn(value_col, F.coalesce(F.col(value_col), F.lit(0).cast("double")))
    return filled
