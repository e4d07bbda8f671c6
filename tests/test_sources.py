"""Table-loader invariants: the round driver regenerates the testdata
between rounds, and a parquet writer change once flipped timestamps to
TIMESTAMP_NTZ, silently breaking ``unix_micros``/``withWatermark`` in the
driver bench (BENCH_r02, rc 1). These smokes fail that class of
regression in pytest instead of in the driver."""

from __future__ import annotations

import pandas as pd
from pyspark.sql.types import TimestampNTZType

from amazon_macie_activity_generator_spark.sources.tables import load_table

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_no_ntz_column_survives_load(spark, sf_dir):
    """Every table, every column: load_table must normalize TIMESTAMP_NTZ
    to TimestampType (the cast at sources/tables.py), whatever precision
    or NTZ-ness the driver's parquet writer produced this round."""
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        ntz = [f.name for f in df.schema.fields
               if isinstance(f.dataType, TimestampNTZType)]
        assert not ntz, f"{name}: TIMESTAMP_NTZ survived load: {ntz}"


def test_load_table_pins_utc_session_timezone(spark, sf_dir):
    """The NTZ->TIMESTAMP cast is only value-identity under UTC;
    load_table must leave the session timezone pinned (and would raise,
    not silently shift, if the conf refused the set)."""
    load_table(spark, sf_dir, "events")
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_events_ts_is_microsecond_timestamp(spark, sf_dir):
    """events.ts must surface as a real TimestampType with microsecond
    values DuckDB agrees with (ns->us integer division, no float loss)."""
    df = load_table(spark, sf_dir, "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    row = df.selectExpr("min(ts) AS lo", "max(ts) AS hi").collect()[0]
    assert isinstance(row.lo, pd.Timestamp) or row.lo is not None
    assert row.lo <= row.hi


def test_arrow_fallback_loader_matches_native_read(spark, sf_dir):
    """The pyarrow fallback (taken when the nanosAsLong conf can't be
    set) is dormant on every normal run — exercise it directly: same
    row count as the native path and a microsecond TimestampType ts."""
    from amazon_macie_activity_generator_spark.sources.tables import _load_via_arrow

    native = load_table(spark, sf_dir, "events")
    fallback = _load_via_arrow(spark, f"{sf_dir}/events.parquet")
    assert fallback.count() == native.count()
    assert fallback.schema["ts"].dataType.typeName() == "timestamp"


def test_load_table_raises_when_utc_cannot_be_pinned(sf_dir):
    """The fail-loud branch: a session that refuses the UTC timezone set
    must raise instead of silently shifting NTZ casts."""
    import pytest

    class _Conf:
        def set(self, *a):
            raise RuntimeError("conf is frozen")

        def get(self, key):
            return "America/New_York"

    class _FrozenSpark:
        conf = _Conf()

    with pytest.raises(RuntimeError, match="UTC"):
        load_table(_FrozenSpark(), sf_dir, "events")
