"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` — operator catalog; see
``amazon_macie_activity_generator_spark/queries.py`` for the implementations and the
DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amazon_macie_activity_generator_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: replay the sf0.001 events table as 5 series through
    the full reference pipeline — align (zero-fill) -> signal-scale ->
    stride anomaly injection -> wide slot rows (the queue-entry shape,
    main.py:667-709)."""
    from pyspark.sql import functions as F

    from amazon_macie_activity_generator_spark.operators.align import zero_fill
    from amazon_macie_activity_generator_spark.operators.anomalies import apply_anomalies
    from amazon_macie_activity_generator_spark.operators.reshape import pivot_slot_rows
    from amazon_macie_activity_generator_spark.operators.scaling import scale_minmax
    from amazon_macie_activity_generator_spark.queries import EVENT_TYPES
    from amazon_macie_activity_generator_spark.sources.real_series import events_as_series
    from amazon_macie_activity_generator_spark.sources.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    series = events_as_series(events).select("series_id", "t", "value")
    aligned = zero_fill(spark, series)
    scaled = scale_minmax(aligned, value_col="value", lo=1, hi=20, by=["series_id"])
    with_anomalies = apply_anomalies(
        scaled.withColumn("value", F.col("value").cast("double")),
        [{"start": 10, "end": 100, "counts": 5}],
        n_points=101,
        mode="stride",
    )
    final = with_anomalies.withColumn("value", F.col("value").cast("long"))
    return pivot_slot_rows(final, series_ids=EVENT_TYPES, agg="max").orderBy("t")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
