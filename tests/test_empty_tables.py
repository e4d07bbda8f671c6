"""Cross-engine agreement on FULLY EMPTY tables — the empty partition /
empty source / fully-filtered-input case a 100 TB pipeline hits
routinely (a new tenant, a day with no traffic, a predicate that prunes
everything). Every builder must (a) not crash, and (b) agree with its
oracle on the empty relation.

The sweep that created this file found zero crashes in either engine
and four latent divergences, all fixed at the source:

- Spark's CUBE/ROLLUP/GROUPING SETS emit NO rows for an empty relation
  while SQL emits the grand-total grouping set (count 0) — pinned to
  Spark semantics via ``HAVING count(*) > 0`` in the three oracles
  (a no-op on non-empty input: every grouping-set row aggregates >= 1
  source row).
- ``event_funnel``'s global ``sum(flag)`` is NULL over the empty
  relation while the oracle's ``count`` is 0 — builder now coalesces.
- ``table_profile`` stringified a NULL min/max as the literal ``'null'``
  (Java ``String.format`` via ``format_string``) — an ALL-NULL column
  would hit the same at any scale.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

ORACLE_ENTRIES = sorted(entrymod.oracle_sql())
ROWS_ONLY_ENTRIES = sorted(set(entrymod.queries()) - set(ORACLE_ENTRIES))


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """Every driver table, schema intact, zero rows."""
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(os.path.join(src, f"{t}.parquet"))
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def empty_duck(empty_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{empty_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


from _cross_engine import assert_agree  # noqa: E402


@pytest.mark.parametrize("name", ORACLE_ENTRIES)
def test_engines_agree_on_empty_tables(name, spark, empty_sf_dir, empty_duck):
    assert_agree(name, spark, empty_sf_dir, empty_duck, what="empty input")


@pytest.mark.parametrize("name", ROWS_ONLY_ENTRIES)
def test_rows_only_entries_survive_empty_tables(name, spark, empty_sf_dir):
    # no oracle to agree with — the contract is: an empty source is a
    # normal input, never a crash
    entrymod.queries()[name](spark, empty_sf_dir).collect()
    spark.catalog.clearCache()
