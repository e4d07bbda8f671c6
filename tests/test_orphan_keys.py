"""Referential-orphan sweep (round 8): foreign keys that point NOWHERE.

At crawl/ingest scale, fact rows routinely outlive (or precede) their
dimension rows — orders naming a customer that was never loaded,
lineitems naming a missing order/part/supplier, customers naming a
missing nation. The engines must agree on what an orphan means: inner
joins drop it identically, anti joins don't count it, aggregations that
never join keep it. Probed green first (round-8 probe), pinned here
forever after — the same probe-then-pin protocol as the degenerate-value
sweeps in test_degenerate_corpus.py.

The orphan fixture extends each fact table with three rows: two whose FK
values exist in no dimension, one with a NULL FK (the NULL-key class is
already pinned table-wide elsewhere; here it rides along to guard the
join entries specifically).
"""

from __future__ import annotations

import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod
from _cross_engine import assert_agree as _assert_agree

SRC = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def orphan_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("orphan_fk")
    for t in TABLES:
        shutil.copy(f"{SRC}/{t}.parquet", str(d / f"{t}.parquet"))

    def extend(table: str, mutate) -> None:
        tb = duckdb.sql(f"SELECT * FROM '{SRC}/{table}.parquet'").arrow()
        rows = tb.slice(0, 3).to_pylist()
        for i, r in enumerate(rows):
            mutate(r, i)
        pq.write_table(
            pa.concat_tables([tb, pa.Table.from_pylist(rows, schema=tb.schema)]),
            str(d / f"{table}.parquet"),
        )

    def mut_orders(r, i):
        r["o_orderkey"] = 9_000_000 + i
        r["o_custkey"] = None if i == 2 else 99_999_999 + i

    def mut_li(r, i):
        r["l_orderkey"] = 9_500_000 + i
        r["l_partkey"] = None if i == 2 else 88_888_888 + i
        r["l_suppkey"] = 77_777_777 + i

    def mut_cust(r, i):
        r["c_custkey"] = 9_700_000 + i
        r["c_nationkey"] = None if i == 2 else 66_666_666 + i

    extend("orders", mut_orders)
    extend("lineitem", mut_li)
    extend("customer", mut_cust)
    return str(d)


@pytest.fixture(scope="module")
def orphan_duck(orphan_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{orphan_dir}/{t}.parquet')"
        )
    yield con
    con.close()


# every oracle entry whose SQL reads MORE THAN ONE base table (the join
# surface orphans can reach) — derived from the live catalog so new join
# entries are swept automatically — plus the single-table entries over
# the three mutated tables.
import re as _re

_TBL_PATS = {t: _re.compile(rf"(?:\bfrom\s+|\bjoin\s+|,\s*){t}\b") for t in TABLES}


def _tables_of(sql: str) -> set[str]:
    sl = sql.lower()
    return {t for t in TABLES if _TBL_PATS[t].search(sl)}


JOIN_ENTRIES = sorted(
    name for name, sql in entrymod.oracle_sql().items()
    if len(_tables_of(sql)) > 1
)
MUTATED_SINGLE = sorted(
    name for name, sql in entrymod.oracle_sql().items()
    if len(_tables_of(sql) & {"orders", "lineitem", "customer"}) == 1
    and len(_tables_of(sql)) == 1
)


def test_join_surface_is_covered():
    # the 6 known join entries must all be in the derived list; a new
    # multi-table entry lands in the sweep automatically
    assert {"anti_join_customers", "grouping_sets_parts", "join_topn_customers",
            "large_orders", "revenue_by_nation", "small_qty_revenue"} <= set(JOIN_ENTRIES)


@pytest.mark.parametrize("name", JOIN_ENTRIES)
def test_engines_agree_on_orphan_join_keys(name, spark, orphan_dir, orphan_duck):
    _assert_agree(name, spark, orphan_dir, orphan_duck, what="orphan foreign keys")


@pytest.mark.parametrize("name", MUTATED_SINGLE)
def test_engines_agree_on_orphan_fact_rows(name, spark, orphan_dir, orphan_duck):
    _assert_agree(name, spark, orphan_dir, orphan_duck, what="orphan fact rows")
