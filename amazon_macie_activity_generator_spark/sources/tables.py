"""Loaders for the driver's parquet tables (TESTDATA.md / FIXTURES.md §A).

``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark
does not support natively; with ``spark.sql.legacy.parquet.nanosAsLong``
it surfaces as a long of epoch-nanos. ``load_table`` normalizes it to a
microsecond TimestampType column so every downstream operator sees a real
timestamp (matching DuckDB's ns->us comparison semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table, robust to sessions we didn't configure: the
    driver passes its own SparkSession, so the nanos-compat flag is set
    here at runtime (it is a runtime-settable legacy conf), with a
    pyarrow rewrite fallback if a future Spark freezes it.

    The driver tables store timestamps as parquet TIMESTAMP(MICROS) with
    isAdjustedToUTC=false, which Spark 4 surfaces as TIMESTAMP_NTZ when
    ``spark.sql.parquet.inferTimestampNTZ.enabled`` is on (its default).
    NTZ breaks ``unix_micros`` and ``withWatermark`` (both require
    TIMESTAMP), so every NTZ column is normalized to TimestampType here —
    under a UTC session timezone the cast is value-identity, matching
    DuckDB's naive-timestamp reading of the same files."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    # The NTZ->TIMESTAMP cast below is only value-identity under UTC; if
    # the set failed (frozen conf), a silent cast would shift every
    # timestamp by the session's local offset — fail loud instead.
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        raise RuntimeError(
            "load_table requires spark.sql.session.timeZone=UTC (the "
            "NTZ->TIMESTAMP normalization is only value-preserving under "
            "UTC), but the session refused the setting"
        )
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        except Exception:
            df = _load_via_arrow(spark, path)
    else:
        df = spark.read.parquet(path)
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # integer div: float division of epoch-nanos loses precision
        # (2^53 < 1.7e18) and shifts timestamps by up to a microsecond
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz_cols = [f.name for f in df.schema.fields
                if isinstance(f.dataType, TimestampNTZType)]
    if ntz_cols:
        df = df.withColumns(
            {c: F.col(c).cast("timestamp") for c in ntz_cols}
        )
    return df


def spread_small_scan(df: DataFrame, key: str) -> DataFrame:
    """Hash-spread a CPU-heavy projection's input ONLY when the scan
    cannot provide parallelism itself (r13, guide §2.5 "input skew:
    one huge unsplittable file → repartition immediately after the
    read").

    The driver tables are single-row-group parquet files — physically
    unsplittable, so locally every map-only pipeline over them runs on
    ONE task regardless of core count. At real scale the inputs are
    many splittable files, ``getNumPartitions() >= defaultParallelism``
    holds, and this returns the scan UNCHANGED — the zero-shuffle
    map-only plan shape is preserved exactly where it matters. The
    condition is derived from the actual scan layout, not a constant
    tuned for either environment."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    if n >= par:
        return df
    return df.repartition(par, key)


def _load_via_arrow(spark: SparkSession, path: str) -> DataFrame:
    """Fallback: pyarrow read + ns->us cast, then parallelize. Only for
    the small driver tables — at real scale the data lands as us-precision
    parquet and never takes this path."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    schema = tbl.schema
    for i, field in enumerate(schema):
        if str(field.type) == "timestamp[ns]":
            tbl = tbl.set_column(i, field.name, tbl.column(i).cast("timestamp[us]"))
    return spark.createDataFrame(tbl.to_pandas())
