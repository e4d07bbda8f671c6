"""The generation plan: blueprint -> timeseries fact table.

Reference pipeline (``generate_datapoints`` main.py:643-665):
per generator: shape -> [scale] -> noise -> anomalies -> int cast;
then zero-fill alignment + pivot at queue-build (main.py:667-709).

Fact schema (SURVEY.md §1.2):
``(run_id string, series_id string, shape string, t long, ts timestamp,
value long)`` — one row per (series, slot). ``ts`` = start_time + t
minutes (1 slot = 1 minute, CloudFormationTemplate.yml:137).

Scale design: each series is an independent expression pipeline over
``spark.range`` — generation parallelizes over slots; per-series scalar
stats (scaling, anomaly max) are two-pass agg + broadcast join; the
only data-sized shuffle in the whole plan is the zero-fill join, and
that only when series actually differ in length.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_macie_activity_generator_spark.config import Blueprint, BlueprintError, GeneratorSpec
from amazon_macie_activity_generator_spark.operators import generators as G
from amazon_macie_activity_generator_spark.operators.align import zero_fill
from amazon_macie_activity_generator_spark.operators.anomalies import apply_anomalies
from amazon_macie_activity_generator_spark.operators.noise import apply_noise
from amazon_macie_activity_generator_spark.operators.scaling import scale_signal
from amazon_macie_activity_generator_spark.sources.real_series import real_series_from_file

DEFAULT_START_TIME = "2024-01-01T00:00:00"


def generate_series(spark: SparkSession, gen: GeneratorSpec, run_id: str, anomaly_mode: str = "hash") -> DataFrame:
    """One generator -> (run_id, series_id, shape, t, value double)."""
    cfg = gen.config
    n = gen.num_points
    shape = gen.shape

    if shape == "real":
        df = real_series_from_file(spark, cfg.get("path") or cfg["key"], n)
    else:
        df = G.time_grid(spark, n)
        t = F.col("t")
        if shape == "constant":
            df = df.withColumn("value", G.constant_expr(cfg, t))
        elif shape == "square":
            df = df.withColumn("value", G.square_expr(cfg, t))
        elif shape == "sinusoidal":
            df = df.withColumn("value", G.sinusoidal_expr(cfg, t, n))
        elif shape == "custom":
            expr, needed = G.custom_expr(cfg)
            if needed:
                raise BlueprintError(
                    f"generator {gen.id!r}: custom formulas may only use 't' "
                    "(datapoints aggregates are anomaly-formula-only)"
                )
            df = df.withColumn("value", expr.cast("double"))
        elif shape == "random":
            expr, _needs_scale = G.random_expr(cfg, gen.id, run_id, t)
            df = df.withColumn("value", expr.cast("double"))
        else:  # pragma: no cover - config layer rejects earlier
            raise BlueprintError(f"unknown shape {shape!r}")

    df = df.withColumn("run_id", F.lit(run_id)).withColumn("series_id", F.lit(gen.id))

    # signal scaling: sinusoidal/custom/real/random-except-triangular
    # (main.py:447-573); constant & square are not scaled.
    needs_scaling = shape in ("sinusoidal", "custom", "real") or (
        shape == "random" and cfg.get("type", "uniform") != "triangular"
    )
    if needs_scaling:
        df = scale_signal(df, cfg, value_col="value", by=["series_id"])
        df = df.withColumn("value", F.col("value").cast("double"))

    df = apply_noise(df, cfg, value_col="value", by=["series_id"])
    df = apply_anomalies(
        df, gen.anomalies, n, value_col="value", by=["series_id"], mode=anomaly_mode
    )
    return df.select("run_id", "series_id", F.lit(shape).alias("shape"), "t", "value")


def generate(
    spark: SparkSession,
    blueprint: Blueprint,
    run_id: str | None = None,
    anomaly_mode: str = "hash",
    align: bool = True,
) -> DataFrame:
    """Blueprint -> full fact table (T5 int cast + T6 zero-fill included)."""
    run_id = run_id or uuid.uuid4().hex
    parts = [generate_series(spark, g, run_id, anomaly_mode) for g in blueprint.generators]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    # T5 — final int cast (main.py:663)
    df = df.withColumn("value", F.col("value").cast("long").cast("double"))

    if align:
        df = zero_fill(
            spark, df, n_points=blueprint.num_points,
            carry_cols=("run_id", "shape"),
        )
    start = str(blueprint.commons.get("start_time", DEFAULT_START_TIME))
    df = df.withColumn(
        "ts",
        F.to_timestamp(F.lit(start)) + F.make_interval(mins=F.col("t").cast("int")),
    )
    return df.select(
        "run_id", "series_id", "shape", "t", "ts", F.col("value").cast("long").alias("value")
    )
