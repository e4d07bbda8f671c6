"""Local replica of the driver's correctness gate: run every oracle-backed
queries() entry on Spark AND its oracle_sql() on DuckDB, compare row count,
schema-compatible values, and order-insensitive content."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style: columns sorted by name, rows sorted by all columns."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def assert_frames_match(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != {len(duck_pdf)}"
    )
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    assert list(s.columns) == list(d.columns), f"{name}: columns {list(s.columns)} != {list(d.columns)}"
    for col in s.columns:
        # driver compares schemas too: int32-vs-int64 drift (e.g. Spark's
        # levenshtein returns int) must fail here, not at the driver
        assert s[col].dtype == d[col].dtype, (
            f"{name}.{col}: dtype {s[col].dtype} != {d[col].dtype}"
        )
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert a == b, f"{name}.{col}[{i}]: {a!r} != {b!r}"
            else:
                assert a == b, f"{name}.{col}[{i}]: {a!r} != {b!r}"


ORACLE_QUERIES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, sf_dir, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    spark_pdf = fn(spark, sf_dir).toPandas()
    duck_pdf = duck.sql(sql).df()
    assert_frames_match(name, spark_pdf, duck_pdf)


def test_rows_only_queries_run(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        if name in ORACLE_QUERIES:
            continue
        assert fn(spark, sf_dir).count() > 0, f"{name}: empty result"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 2
