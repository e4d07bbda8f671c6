"""Cross-engine agreement on DEGENERATE inputs: empty/whitespace/
sub-shingle documents and zero-norm/duplicate/negated embeddings —
inputs routine in a 100 TB crawl but absent from the driver testdata,
where the DuckDB NULL-on-empty idioms (array_to_string([]) IS NULL)
and NaN-from-zero-norm divisions silently diverge from Spark's ''/0
guards (and DuckDB sorts NaN ABOVE every real value in DESC order).
The documents sweep found four latent oracle divergences
(source_overlap, dedup_minhash_md5, doc_chunk, dedup_containment) and
the embeddings sweep two more (topk_cosine, topk_cosine_lsh) on the
day it was written; every oracle-backed entry of either family must
agree here forever after.
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "embeddings",
]

DEGENERATE_TEXTS = [
    "", "   ", "\t\n", "one", "two words", "a b", "x", " padded  ",
    "the a and of to in", "three t tokens", "the the the", "ab",
    # unicode gauntlet (r7): NFC + NFD accents, CJK, RTL, emoji with ZWJ
    # sequences, astral plane, combining marks, exotic whitespace,
    # fullwidth forms, ligatures — all 46 doc entries agree on these
    "café résumé naïve",
    "café résumé naïve",  # same text, decomposed
    "日本語のテキストです 漢字 かな カナ",
    "مرحبا بالعالم هذا نص عربي",
    "emoji \U0001F600\U0001F600 test \U0001F389 family \U0001F468‍\U0001F469‍\U0001F467 flag \U0001F1FA\U0001F1F8",
    "math \U0001D54A\U0001D561\U0001D552\U0001D563\U0001D55C astral",
    "mixed ascii και ελληνικά и русский",
    "nbsp and thin em spaces",
    # vertical tab: Java \\s includes \\x0B, RE2's does NOT — the ONE
    # whitespace char the engine defaults disagree on; tokenizers pin
    # the class explicitly (operators/dedup.py JAVA_WS)
    "tab\tand\nnewline\r\nand\x0bvtab",
    "ＦＵＬＬＷＩＤＴＨ ｔｅｘｔ",
    "ligature ﬁﬂ ﬆ œuf æther",
    None, None,  # NULL text (kept even so source s1/s2 alternation holds)
]

# document-family entries: the ones whose oracle reads `documents`
DOC_ENTRIES = sorted(
    name for name, sql in entrymod.oracle_sql().items()
    if "documents" in sql.lower()
)


@pytest.fixture(scope="module")
def degen_sf_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("degen_sf")
    for t in TABLES:
        shutil.copy(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))
    n = len(DEGENERATE_TEXTS)
    # +3 NULL-id-class rows (r7): an id-less crawl row is routine; the
    # NULL-key probe found 4 Spark job-killers (non-nullable mapInPandas
    # schemas) and 4 oracle divergences (NULL-key joins / printf(NULL) /
    # NULL sort position), all fixed — every doc entry must agree with
    # these rows present forever after. The long NULL-id doc passes the
    # quality gates (>= 10 tokens, low punct) AND duplicates an id'd
    # doc's text, so the pick-one-per-fingerprint windows (corpus_clean)
    # actually see a NULL-id candidate instead of filtering it out first.
    long_dup = ("the quiet harbor town woke early and the fishing boats "
                "left before the sun cleared the eastern ridge")
    texts = DEGENERATE_TEXTS + [long_dup] + [long_dup,
                                             "another null id page"]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(list(range(1, n + 1)) + [n + 1] + [None, None],
                               type=pa.int64()),
            "text": pa.array(texts),
            # last two ID'd docs of the base set: NULL lang and NULL
            # source (group-key NULLs)
            "lang": pa.array(["en"] * (n - 2) + [None, "en"]
                             + ["en"] + ["en", "en"]),
            "source": pa.array((["s1", "s2"] * (n // 2))[: n - 1] + [None]
                               + ["s1"] + ["s1", "s2"]),
            "n_chars": pa.array(
                [len(t) if t is not None else 0 for t in texts],
                type=pa.int64(),
            ),
        }),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.fixture(scope="module")
def degen_duck(degen_sf_dir):
    con = duckdb.connect()
    for t in TABLES + ["documents"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{degen_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


# shared comparison protocol (one definition across both sweep suites)
from _cross_engine import assert_agree as _assert_agree  # noqa: E402
from _cross_engine import canon as _canon  # noqa: E402,F401


@pytest.mark.parametrize("name", DOC_ENTRIES)
def test_engines_agree_on_degenerate_docs(name, spark, degen_sf_dir, degen_duck):
    _assert_agree(name, spark, degen_sf_dir, degen_duck)


# ----------------------------------------------------- embeddings family

EMB_ENTRIES = sorted(
    name for name, sql in entrymod.oracle_sql().items()
    if "embedding" in sql.lower()
)


@pytest.fixture(scope="module")
def degen_emb_dir(tmp_path_factory):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("degen_emb")
    for t in TABLES[:-1] + ["documents"]:
        shutil.copy(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))
    rng = np.random.default_rng(7)
    dim = 64
    base = rng.normal(size=dim)
    e0 = np.zeros(dim); e0[0] = 1.0
    e1 = np.zeros(dim); e1[1] = -1.0
    vecs = [
        np.zeros(dim),          # zero norm: cosine guard both sides
        np.full(dim, 1e-30),    # near-denormal
        base, base.copy(),      # exact duplicate pair
        -base,                  # negated (sim -1)
        e0, e1,                 # axis-aligned
    ] + [rng.normal(size=dim) for _ in range(114)]
    n = len(vecs)
    # NULL vector row, then a NULL vec_id row (r7: an id-less embedding
    # is a valid vector for geometry but can't be addressed — the
    # NULL-key probe proved every entry agrees with it present)
    emb_col = [list(map(float, v)) for v in vecs] + [None] \
        + [list(map(float, rng.normal(size=dim)))]
    pq.write_table(
        pa.table({
            "vec_id": pa.array(list(range(n + 1)) + [None], type=pa.int64()),
            "embedding": pa.array(emb_col, type=pa.list_(pa.float32())),
            "label": pa.array(
                [i % 10 for i in range(n)] + [None, 3], type=pa.int32()
            ),
        }),
        str(d / "embeddings.parquet"),
    )
    return str(d)


@pytest.fixture(scope="module")
def degen_emb_duck(degen_emb_dir):
    con = duckdb.connect()
    for t in TABLES[:-1] + ["documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{degen_emb_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", EMB_ENTRIES)
def test_engines_agree_on_degenerate_embeddings(name, spark, degen_emb_dir, degen_emb_duck):
    _assert_agree(name, spark, degen_emb_dir, degen_emb_duck)


def test_rows_only_embedding_entries_survive_null_vector(spark, degen_emb_dir):
    """The Arrow kernels (SRP buckets, centroid assign) must not die on a
    NULL vector row — at 100 TB one malformed row cannot kill the stage.
    (The oracle-backed entries are covered by the sweep above; this pins
    the rows-only IVF path, whose numpy quantizer crashed on None before
    the zero-fill + isNotNull guards.)"""
    rows = entrymod.queries()["topk_cosine_ivf"](spark, degen_emb_dir).collect()
    assert len(rows) > 0
    assert all(r.vec_id != 121 and r.query_id != 121 for r in rows)  # NULL row out
    spark.catalog.clearCache()


# --------------------------------------------------------- events family

EVENT_ENTRIES = sorted(
    name for name, sql in entrymod.oracle_sql().items()
    if "events" in sql.lower()
)


@pytest.fixture(scope="module")
def degen_ev_dir(tmp_path_factory):
    """Ties, boundaries, singletons, NULLs, malformed JSON, and one
    adversarially large value (slice-fan-out overflow class, value
    > _MAX_SLICES * slice_size)."""
    import datetime as dt
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("degen_ev")
    for t in [x for x in TABLES if x != "events"] + ["documents"]:
        shutil.copy(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))

    t0 = dt.datetime(2024, 1, 1)
    rows = []

    def add(ts, user, etype, value, props='{"k": 1}'):
        rows.append((len(rows), ts, user, etype, value, props))

    for i in range(10):  # ten events at ONE timestamp: total window tie
        add(t0 + dt.timedelta(hours=1), 1, ["view", "click", "purchase"][i % 3], float(i))
    add(t0 + dt.timedelta(hours=2), 2, "signup", 0.0)  # single-event user
    for h in range(4):  # exactly on hour / 5-min window boundaries
        add(t0 + dt.timedelta(hours=h), 3, "view", -5.5)
        add(t0 + dt.timedelta(hours=h, minutes=5), 3, "click", 1e12)
    add(t0 + dt.timedelta(hours=3), 4, "view", 2.0, None)          # NULL props
    add(t0 + dt.timedelta(hours=3), 4, "view", 2.0, "not json {")  # malformed
    add(t0 + dt.timedelta(hours=3), 4, "view", 2.0, "")            # empty
    add(t0 + dt.timedelta(hours=4), 5, "error", None)              # NULL value
    add(t0 + dt.timedelta(hours=4), 5, None, 3.0)                  # NULL type
    add(t0 + dt.timedelta(hours=4), None, "view", 4.0)             # NULL user
    add(None, 5, "view", 5.0)                                      # NULL ts
    add(None, 6, "click", 99.0)    # NULL ts on the type-filtered paths
    add(None, 6, "purchase", 98.0)
    # asof worst case: a NULL-ts purchase BEFORE the user's first real
    # purchase — unfiltered, Spark's running-last window would treat it
    # as the earliest value while DuckDB's ASOF never matches it
    add(None, 7, "purchase", 97.0)
    add(t0 + dt.timedelta(hours=1), 7, "view", 1.0)
    add(t0 + dt.timedelta(hours=1, minutes=1), 7, "click", 1.0)
    add(t0 + dt.timedelta(hours=5), 7, "purchase", 2.0)
    add(t0 + dt.timedelta(hours=5), 6, "purchase", 1.0)            # reversed funnel
    add(t0 + dt.timedelta(hours=5, seconds=1), 6, "view", 1.0)
    add(t0 + dt.timedelta(hours=6), 6, "view", 1.0)                # same-ts funnel
    add(t0 + dt.timedelta(hours=6), 6, "click", 1.0)
    add(t0 + dt.timedelta(hours=6), 6, "purchase", 1.0)
    # CONSTANT series (r7): an event_type whose every value is identical —
    # min == max, the scale branch `CASE WHEN mx = mn` (Spark
    # scale_expr's F.when twin) that no driver-testdata series ever hits.
    # Outside EVENT_TYPES, so pivot-shaped entries drop it AFTER the
    # scale/align stages have processed it.
    for i in range(5):
        add(t0 + dt.timedelta(minutes=10 * i), 8, "heartbeat", 7.0)
    # a series whose EVERY timestamp is NULL: no event can be placed on
    # the timeline, so the whole series must vanish from series-shaped
    # ops in both engines (not linger as a zero-length ghost series)
    add(None, 9, "ghost", 1.0)
    add(None, 9, "ghost", 2.0)
    # ADVERSARIAL PROPS (r7): the full cross-engine JSON contract surface
    # from functions/jsonx.py — under Spark 4's default ANSI mode the old
    # get_json_object(..).cast('long') THREW on the 1.5 row, and naive
    # TRY_CAST oracles diverge on decimal-rounding/hex/trailing-comma
    # leniency. Sane ts/user/value so only props semantics are stressed.
    for j, p in enumerate([
        '{"k": 1, "k": 2}',            # duplicate key: FIRST wins, both engines
        '{"k": "3"}', '{"k": 1.5}', '{"k": 1e3}', '{"k": true}',
        '{"k": null}', '{"k": [1,2]}', '{"k": {"a":1}}',
        '{"k": 99999999999999999999}',  # > int64: NULL both
        '{"k": -9223372036854775808}', '{"k": 9223372036854775807}',
        '{"k": " 7 "}', '{"k":1} trailing', '{k: 1}', "{'k': 1}",
        '{"k": 01}', '{"K": 1}', '{"k": "0x10"}',
        '{"k": "\\u0031\\u0032"}',      # escaped "12" (raw backslash-u in the string)
        '[1,2,3]', '"just a string"', '{"k": Infinity}', '{"k": NaN}',
        '{"a": {"k": 5}, "k": 6}', '{"k": 2.0}', '{"k": "1.9"}',
        '{"k": "+5"}', '{"k": ""}', '  {"k": 8}  ', '{"k": "12\n"}',
        'null', '{}', '{"k": 5, "j": }', '{"k": 1,}',
        '﻿{"k": 2}',               # BOM prefix: invalid both
        '{"k": "007"}', '{"k": "\t42\t"}', '{"j": {"k": 9}}',
        '{"x": "' + "y" * 20000 + '", "k": 11}',  # 20 KB value
        '{"a":' * 40 + '1' + '}' * 40,  # depth-40 nesting, no k
    ]):
        add(t0 + dt.timedelta(hours=8, minutes=j), 20, "view", 1.0, p)
    rnd = random.Random(3)
    for _ in range(150):  # filler mass for the stats entries
        add(t0 + dt.timedelta(minutes=rnd.randint(0, 60 * 24 * 6)),
            10 + rnd.randint(0, 9),
            rnd.choice(["view", "click", "purchase", "signup", "error"]),
            round(rnd.uniform(0, 200), 2), '{"k": %d}' % rnd.randint(0, 99))

    pq.write_table(
        pa.table({
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], type=pa.float64()),
            "props": pa.array([r[5] for r in rows]),
        }),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.fixture(scope="module")
def degen_ev_duck(degen_ev_dir):
    con = duckdb.connect()
    for t in [x for x in TABLES if x != "events"] + ["documents", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{degen_ev_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENT_ENTRIES)
def test_engines_agree_on_degenerate_events(name, spark, degen_ev_dir, degen_ev_duck):
    _assert_agree(name, spark, degen_ev_dir, degen_ev_duck)


# ------------------------------------------------ lineitem/orders family

GRAPH_ENTRIES = sorted(
    name for name, sql in entrymod.oracle_sql().items()
    if "lineitem" in sql.lower() or "orders" in sql.lower()
)


@pytest.fixture(scope="module")
def degen_li_dir(tmp_path_factory):
    """Real lineitem/orders PLUS a 120-part hub order (co-purchase /
    PageRank / triangle skew), an order repeating one part 5x (duplicate
    edges), a single-item order (no pairs), and zero/negative
    quantity/price rows."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("degen_li")
    for t in ["region", "nation", "customer", "supplier", "part",
              "events", "documents", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))

    li = duckdb.sql(f"SELECT * FROM '{src}/lineitem.parquet'").df()
    od = duckdb.sql(f"SELECT * FROM '{src}/orders.parquet'").df()
    D = dt.datetime(2024, 3, 1)
    extra_li = [(900001, 2000 + p, 1 + p % 5, p + 1, 1.0, 10.0, 0.0, 0.0, "N", "O", D)
                for p in range(120)]
    extra_li += [(900002, 2000, 1, i + 1, 2.0, 20.0, 0.1, 0.05, "R", "F", D)
                 for i in range(5)]
    extra_li += [
        (900003, 2001, 2, 1, 3.0, 30.0, 0.2, 0.08, "A", "F", D),
        (900004, 2002, 3, 1, 0.0, 0.0, 0.0, 0.0, "N", "O", D),
        (900004, 2003, 3, 2, -4.0, -100.0, 0.5, 0.1, "N", "O", D),
    ]
    # DUPLICATE keys (r7): exact copy + mutated copy of an existing
    # (l_orderkey, l_linenumber) and o_orderkey — re-ingest shape. A
    # dedicated probe showed the whole lineitem/orders family is already
    # duplicate-safe (pure aggregations, no pick-one windows); these rows
    # pin that property so a future pick-one entry can't regress it.
    extra_li += [tuple(li.iloc[0])] * 2
    mut_row = list(li.iloc[1])
    mut_row[4] = float(mut_row[4]) + 1.0  # l_quantity mutated, same key
    extra_li += [tuple(mut_row)]
    extra_od = [
        (900001, 1, "O", 1200.0, D, "1-URGENT"),
        (900002, 1, "F", 100.0, D, "2-HIGH"),
        (900003, 2, "F", 30.0, D, "3-MEDIUM"),
        (900004, 3, "O", -100.0, D, "4-NOT SPECIFIED"),
        (900005, 2, "O", 50.0, None, "5-LOW"),  # NULL order date
    ]
    extra_od += [tuple(od.iloc[0])] * 2  # duplicate o_orderkey rows
    # NON-FINITE monetary values (r7): NaN/±Inf/1e308 in the measure
    # columns — re-ingest corruption. The probe found two decimal-cast
    # aborts (Spark ANSI NUMERIC_VALUE_OUT_OF_RANGE; DuckDB inf→DECIMAL)
    # now degraded to NULL via try_cast in BOTH engines (plus an explicit
    # isnan() guard in the oracles: DuckDB 1.0's TRY_CAST(NaN AS DECIMAL)
    # throws instead of returning NULL). No gate needed — the class
    # degrades symmetrically, pinned by this family. Built via Arrow
    # from_pylist because pandas would fold NaN into NULL.
    OLD = dt.datetime(1995, 6, 1)  # inside agg_pricing's shipdate window
    wild_li = [
        (900010, 2000, 1, 1, float("nan"), float("nan"), 0.0, 0.0, "N", "O", D),
        (900011, 2000, 1, 1, float("inf"), float("inf"), 0.0, 0.0, "N", "O", D),
        (900012, 2000, 1, 1, 1e15, 1e308, 0.0, 0.0, "N", "O", D),
        (900013, 2000, 1, 1, 1.0, float("-inf"), float("nan"), float("inf"), "N", "O", D),
        # pre-1998-09-02 shipdates: agg_pricing_summary filters on
        # l_shipdate BEFORE its decimal guard — without these rows its
        # try_cast/isnan pin would be vacuous (review finding)
        (900014, 2000, 1, 1, float("nan"), float("inf"), 0.0, 0.0, "N", "O", OLD),
        (900015, 2000, 1, 1, 1e308, float("nan"), 0.0, 0.0, "R", "F", OLD),
    ]
    wild_od = [
        (900010, 1, "O", float("nan"), D, "1-URGENT"),
        (900011, 1, "O", float("inf"), D, "2-HIGH"),
        (900012, 1, "O", 1e308, D, "3-MEDIUM"),
    ]
    for name, base, extra, wild in (("lineitem", li, extra_li, wild_li),
                                    ("orders", od, extra_od, wild_od)):
        df = pd.concat([base, pd.DataFrame(extra, columns=list(base.columns))],
                       ignore_index=True)
        t = pa.Table.from_pandas(df, preserve_index=False)
        # match the driver testdata: microsecond timestamps, not pandas ns
        fields = [pa.field(f.name, pa.timestamp("us"))
                  if pa.types.is_timestamp(f.type) else f for f in t.schema]
        schema = pa.schema(fields)
        wild_t = pa.Table.from_pylist(
            [dict(zip(schema.names, row)) for row in wild], schema=schema
        )
        pq.write_table(pa.concat_tables([t.cast(schema), wild_t]),
                       str(d / f"{name}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def degen_li_duck(degen_li_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{degen_li_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", GRAPH_ENTRIES)
def test_engines_agree_on_degenerate_lineitem(name, spark, degen_li_dir, degen_li_duck):
    _assert_agree(name, spark, degen_li_dir, degen_li_duck)


# ------------------------------------------------------- customer family

CUSTOMER_ENTRIES = sorted(
    name for name, sql in entrymod.oracle_sql().items()
    if "customer" in sql.lower()
)


@pytest.fixture(scope="module")
def degen_cu_dir(tmp_path_factory):
    """Real customers PLUS empty/whitespace names, an exact duplicate of
    a real name, unicode and case near-dups, and duplicated 200-char
    names — the entity-resolution (fuzzy_name_pairs) worst case."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("degen_cu")
    for t in ["region", "nation", "supplier", "part", "orders", "lineitem",
              "events", "documents", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))
    cu = duckdb.sql(f"SELECT * FROM '{src}/customer.parquet'").df()
    extra = pd.DataFrame([
        (800001, "", 1, 0.0, "FURNITURE"),
        (800002, "   ", 2, -10.5, "AUTOMOBILE"),
        (800003, "Customer#000000001", 3, 1.0, "BUILDING"),
        (800004, "Custömer#000000001", 4, 2.0, "BUILDING"),
        (800005, "CUSTOMER#000000001", 5, 3.0, "MACHINERY"),
        (800006, "x" * 200, 6, 4.0, "HOUSEHOLD"),
        (800007, "x" * 200, 7, 5.0, "HOUSEHOLD"),
        (800008, None, 1, 6.0, "FURNITURE"),      # NULL name
        (800009, "NoSegment", 2, 7.0, None),      # NULL segment
        # duplicate c_custkey (r7): dimension re-ingest; joins fan out
        # identically in both engines — pinned, not gated
        (800010, "DupKey Customer", 3, 8.0, "BUILDING"),
        (800010, "DupKey Customer", 3, 8.0, "BUILDING"),
    ], columns=list(cu.columns))
    base = pa.Table.from_pandas(pd.concat([cu, extra], ignore_index=True),
                                preserve_index=False)
    # NULL c_custkey (r7): probed green across the family (inner joins
    # drop NULL keys identically in both engines) — pinned via the Arrow
    # path (a pandas int64 column cannot hold None)
    null_rows = base.slice(0, 1).to_pylist()
    null_rows[0]["c_custkey"] = None
    pq.write_table(
        pa.concat_tables([base, pa.Table.from_pylist(null_rows, schema=base.schema)]),
        str(d / "customer.parquet"),
    )
    return str(d)


@pytest.fixture(scope="module")
def degen_cu_duck(degen_cu_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{degen_cu_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", CUSTOMER_ENTRIES)
def test_engines_agree_on_degenerate_customers(name, spark, degen_cu_dir, degen_cu_duck):
    _assert_agree(name, spark, degen_cu_dir, degen_cu_duck)


# ---------------------------------------------- non-finite embeddings (r7)

@pytest.fixture(scope="module")
def nonfinite_emb_dirs(tmp_path_factory):
    """UNGATED embeddings with NaN/±Inf/NULL components (fp overflow and
    ragged encodes happen at crawl scale) alongside null/empty/zero/
    normal vectors, plus the GATED twin holding only the 'ok' rows — the
    ingest contract ``embedding_finite_gate`` enforces. Returns
    (ungated_dir, gated_dir, expected_statuses)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    raw = tmp_path_factory.mktemp("nonfinite_emb")
    gated = tmp_path_factory.mktemp("nonfinite_emb_gated")
    for d in (raw, gated):
        for t in TABLES[:-1] + ["documents"]:
            shutil.copy(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))

    rng = np.random.default_rng(11)
    dim = 64  # the LSH oracle twins are fixed 64-dim plane models
    nan_v = rng.normal(size=dim); nan_v[3] = np.nan
    inf_v = rng.normal(size=dim); inf_v[0] = np.inf
    ninf_v = rng.normal(size=dim); ninf_v[dim - 1] = -np.inf
    all_nan = np.full(dim, np.nan)
    # NULL components: a definite non_finite in BOTH engines — Spark's
    # exists() must not fall into three-valued NULL, and the [NULL,0,..]
    # shape must not reach the zero_norm fold (SQL's NULL-skipping sum
    # would say 0 while Spark's fold says NULL)
    null_comp = [float(x) for x in rng.normal(size=dim)]; null_comp[7] = None
    null_zero = [0.0] * dim; null_zero[0] = None
    ok_vecs = [rng.normal(size=dim) for _ in range(40)]
    rows = (
        [(v, "non_finite") for v in (nan_v, inf_v, ninf_v, all_nan)]
        + [(null_comp, "non_finite"), (null_zero, "non_finite")]
        + [(np.zeros(dim), "zero_norm")]
        + [(None, "null"), (np.array([]), "empty")]
        + [(v, "ok") for v in ok_vecs]
    )
    emb_col = [
        None if v is None else [None if x is None else float(x) for x in v]
        for v, _ in rows
    ]
    statuses = [s for _, s in rows]
    full = pa.table({
        "vec_id": pa.array(range(len(rows)), type=pa.int64()),
        "embedding": pa.array(emb_col, type=pa.list_(pa.float32())),
        "label": pa.array([i % 5 for i in range(len(rows))], type=pa.int32()),
    })
    pq.write_table(full, str(raw / "embeddings.parquet"))
    keep = [i for i, s in enumerate(statuses) if s == "ok"]
    pq.write_table(full.take(keep), str(gated / "embeddings.parquet"))
    return str(raw), str(gated), statuses


def _duck_for(sf_dir):
    con = duckdb.connect()
    for t in TABLES[:-1] + ["documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_finite_gate_classifies_and_agrees(spark, nonfinite_emb_dirs):
    raw, _gated, statuses = nonfinite_emb_dirs
    con = _duck_for(raw)
    try:
        _assert_agree("embedding_finite_gate", spark, raw, con)
        got = {
            r.status: r.n_vectors
            for r in entrymod.queries()["embedding_finite_gate"](spark, raw).collect()
        }
        from collections import Counter
        assert got == dict(Counter(statuses))
    finally:
        con.close()


def test_quantize_survives_and_agrees_on_nonfinite(spark, nonfinite_emb_dirs):
    """The pre-r7 quantizer CRASHED here (round(NaN) cast to int is a
    CAST_OVERFLOW under ANSI mode); non-finite vectors now quantize to
    NULL in both engines."""
    raw, _gated, _statuses = nonfinite_emb_dirs
    con = _duck_for(raw)
    try:
        _assert_agree("embedding_quantize", spark, raw, con)
    finally:
        con.close()


@pytest.mark.parametrize("name", EMB_ENTRIES)
def test_engines_agree_on_gated_nonfinite_corpus(name, spark, nonfinite_emb_dirs):
    """The composition contract: gate first, then ANY embedding operator
    — on the gated twin every oracle-backed embedding entry agrees."""
    _raw, gated, _statuses = nonfinite_emb_dirs
    con = _duck_for(gated)
    try:
        _assert_agree(name, spark, gated, con)
    finally:
        con.close()


# ------------------------------------------------ extreme timestamps (r7)

@pytest.fixture(scope="module")
def extreme_ts_dirs(tmp_path_factory):
    """UNGATED events with wild timestamps — pre-epoch (1969/1900,
    including a pre-epoch FRACTIONAL second, the trunc-vs-floor epoch
    trap), exact epoch, leap day, year 9999 and past the ns-epoch max —
    plus the GATED twin holding only 'ok' rows (the events_time_gate
    ingest contract). Values are multiples of 0.25 so windowed sums and
    averages are exact in binary and round(.,4) can't straddle a
    half-ulp boundary between engines. Returns (ungated_dir, gated_dir,
    expected_statuses)."""
    import datetime as dt
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    raw = tmp_path_factory.mktemp("extreme_ts")
    gated = tmp_path_factory.mktemp("extreme_ts_gated")
    for d in (raw, gated):
        for t in [x for x in TABLES if x != "events"] + ["documents"]:
            shutil.copy(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))

    rows = []

    def add(ts, user, etype, value, status):
        rows.append((len(rows), ts, user, etype, value, '{"k": 1}', status))

    add(dt.datetime(1969, 12, 31, 23, 59, 59), 1, "view", 1.0, "pre_epoch")
    add(dt.datetime(1969, 12, 31, 23, 59, 59, 999999), 1, "click", 2.0, "pre_epoch")
    add(dt.datetime(1969, 6, 15, 12, 30, 30), 1, "purchase", 3.0, "pre_epoch")
    add(dt.datetime(1900, 1, 1, 0, 0, 1), 2, "view", 4.0, "pre_epoch")
    add(dt.datetime(1970, 1, 1, 0, 0, 0), 2, "click", 5.0, "ok")  # exact epoch
    add(dt.datetime(1970, 1, 1, 0, 0, 0, 1), 2, "purchase", 6.0, "ok")
    add(dt.datetime(2024, 2, 29, 0, 0, 0), 3, "view", 7.0, "ok")  # leap day
    add(dt.datetime(9999, 12, 31, 23, 59, 59), 4, "view", 8.0, "far_future")
    add(dt.datetime(2262, 4, 11, 23, 47, 16), 4, "click", 9.0, "far_future")
    add(None, 5, "view", 10.0, "null_ts")
    rnd = random.Random(5)
    t0 = dt.datetime(2024, 1, 1)
    for _ in range(120):
        add(t0 + dt.timedelta(minutes=rnd.randint(0, 60 * 24 * 6)),
            10 + rnd.randint(0, 9),
            rnd.choice(["view", "click", "purchase", "signup", "error"]),
            rnd.randint(0, 800) * 0.25, "ok")

    full = pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([r[4] for r in rows], type=pa.float64()),
        "props": pa.array([r[5] for r in rows]),
    })
    statuses = [r[6] for r in rows]
    pq.write_table(full, str(raw / "events.parquet"))
    keep = [i for i, s in enumerate(statuses) if s == "ok"]
    pq.write_table(full.take(keep), str(gated / "events.parquet"))
    return str(raw), str(gated), statuses


def test_time_gate_classifies_and_agrees(spark, extreme_ts_dirs):
    raw, _gated, statuses = extreme_ts_dirs
    con = _duck_for_events(raw)
    try:
        _assert_agree("events_time_gate", spark, raw, con)
        got = {
            r.status: r.n_events
            for r in entrymod.queries()["events_time_gate"](spark, raw).collect()
        }
        from collections import Counter
        assert got == dict(Counter(statuses))
    finally:
        con.close()


@pytest.mark.parametrize("name", ["hourly_activity_spine", "interpolate_gaps",
                                  "rolling_time_window", "rolling_stats",
                                  "event_gaps", "event_funnel"])
def test_time_ops_survive_wild_timestamps(name, spark, extreme_ts_dirs):
    """UNGATED corpus: the span-capped spine/grid entries must not
    explode (pre-r7 a year-9999 row made sequence() build a ~71M-element
    array and killed the JVM) and must still agree with their oracles
    (the caps are mirrored); the epoch-keyed windows must agree on
    pre-epoch fractional seconds (trunc-vs-floor pin)."""
    raw, _gated, _statuses = extreme_ts_dirs
    con = _duck_for_events(raw)
    try:
        _assert_agree(name, spark, raw, con, what="wild timestamps")
    finally:
        con.close()


# Watermarked STATE-EVICTING streaming entries are excluded below by
# design, not convenience: their contract is "events older than
# max-event-time minus the horizon are late and DROPPED" — exactly what
# a watermark is for — so on any corpus whose event-time spread exceeds
# the horizon (here: valid 1970 rows next to valid 2024 rows, far wider
# than the 14-day horizon) the stream and the horizon-less batch oracle
# diverge BY DESIGN. The ingest gate bounds plausibility ([1970, 2100)),
# not per-pipeline horizons. Their batch equivalence on horizon-
# respecting data is pinned by the driver testdata sweep + streaming
# tests.
_HORIZON_BOUND_STREAMING = {"streaming_dedup", "streaming_join", "streaming_left_join"}


@pytest.mark.parametrize(
    "name", [n for n in EVENT_ENTRIES if n not in _HORIZON_BOUND_STREAMING]
)
def test_engines_agree_on_gated_time_corpus(name, spark, extreme_ts_dirs):
    """The composition contract, events edition: gate first, then ANY
    time-ordered operator (minus the horizon-bound streaming set above —
    a far-future event poisons their watermark even when in-range)
    agrees with its oracle."""
    _raw, gated, _statuses = extreme_ts_dirs
    con = _duck_for_events(gated)
    try:
        _assert_agree(name, spark, gated, con, what="gated time corpus")
    finally:
        con.close()


def _duck_for_events(sf_dir):
    con = duckdb.connect()
    for t in [x for x in TABLES if x != "events"] + ["documents", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# ----------------------------------------------- huge single documents (r7)

@pytest.fixture(scope="module")
def huge_doc_dir(tmp_path_factory):
    """A 100 TB crawl always contains pathological single documents: a
    ~300 KB normal-vocabulary page, a ~200 KB doc that is ONE unbroken
    token (minified JS / base64 blob — the tokenizer's worst case), a
    ~150 KB doc of one word repeated (repetition/dedup extremes), and a
    ~100 KB unicode mix. Each stresses a different axis: shingle fan-out
    (winnowing emits one row per k-gram window), single-token degeneracy
    (zero shingles at k>1), max-repetition ratios, and multi-byte offset
    handling. The sweep asserts cross-engine agreement for every
    documents-family oracle entry — correctness under size, not speed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("huge_doc")
    for t in TABLES:
        shutil.copy(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))

    # Sizes are a runtime compromise: the probe ran 300 KB docs (where the
    # unbound _five_grams hung >8 min and the fix runs in seconds), but the
    # DuckDB minhash oracles cost 2-4 min EACH at that size, so the
    # permanent sweep pins the same classes at ~75 KB — still far beyond
    # anything in the driver testdata and still minutes-vs-seconds on a
    # reintroduced quadratic.
    vocab = [f"w{i:03d}" for i in range(211)]
    normal_90k = " ".join(vocab[(i * 7 + i * i) % 211] for i in range(15000))
    one_token_50k = "a" + "b0" * 25000            # no whitespace at all
    repeated_48k = "the " * 12000                 # one word, max repetition
    unicode_50k = ("日本語テキスト café мир " * 2500)
    # long-lines vs many-lines: same content, different line structure
    many_lines = "\n".join("line %d alpha beta" % i for i in range(1500))

    huge = [
        (1, normal_90k, "en", "s1"),
        (2, one_token_50k, "en", "s2"),
        (3, repeated_48k, "en", "s1"),
        (4, unicode_50k, "ja", "s2"),
        (5, many_lines, "en", "s1"),
    ] + [
        # ordinary mass so group-by/join entries have real work and the
        # near-dup entries have small docs to (not) match the giants
        (100 + i, f"plain document number {i} shared tokens alpha beta gamma", "en",
         f"s{i % 3}")
        for i in range(30)
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r[0] for r in huge], type=pa.int64()),
            "text": pa.array([r[1] for r in huge]),
            "lang": pa.array([r[2] for r in huge]),
            "source": pa.array([r[3] for r in huge]),
            "n_chars": pa.array([len(r[1]) for r in huge], type=pa.int64()),
        }),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.fixture(scope="module")
def huge_doc_duck(huge_doc_dir):
    con = duckdb.connect()
    for t in TABLES + ["documents"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{huge_doc_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", DOC_ENTRIES)
def test_engines_agree_on_huge_docs(name, spark, huge_doc_dir, huge_doc_duck):
    _assert_agree(name, spark, huge_doc_dir, huge_doc_duck, what="huge document")


# ------------------------------------------------- duplicate primary keys (r7)

@pytest.fixture(scope="module")
def dup_key_dirs(tmp_path_factory):
    """Duplicate doc_id / vec_id rows — a certainty under re-ingest at
    crawl scale. A probe showed 8 entries silently diverging cross-engine
    on such input (pick-one windows, pair predicates, per-id joins all
    assume key uniqueness). The contract is gate-first: doc_id_dedup_gate
    classifies and names a deterministic winner (min content md5);
    vec_id_unique_audit detects; downstream operators are specified over
    gated (one row per id) corpora. Returns (raw_dir, gated_dir)."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    raw = tmp_path_factory.mktemp("dup_raw")
    gated = tmp_path_factory.mktemp("dup_gated")
    for d in (raw, gated):
        for t in TABLES[:-1]:  # all but embeddings (built below)
            shutil.copy(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))

    docs = [
        (1, "alpha beta gamma delta epsilon zeta", "en", "s1"),
        (1, "alpha beta gamma delta epsilon zeta", "en", "s1"),  # identical re-crawl
        (2, "first version of this document text here", "en", "s1"),
        (2, "second rather different text for same id", "en", "s2"),  # edited re-crawl
        (3, None, "en", "s1"),
        (3, "", "en", "s1"),          # NULL vs '' share a hash: dup_identical
        (4, "an ordinary document with plain text", "en", "s1"),
    ] + [
        (100 + i, f"plain document number {i} shared tokens alpha beta gamma",
         "en", f"s{i % 3}")
        for i in range(25)
    ]

    def write_docs(d, rows):
        pq.write_table(pa.table({
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array([r[3] for r in rows]),
            "n_chars": pa.array([len(r[1] or "") for r in rows], type=pa.int64()),
        }), str(d / "documents.parquet"))

    write_docs(raw, docs)
    # gate resolution: per id keep the row with the smallest content md5
    best = {}
    for r in docs:
        h = hashlib.md5((r[1] or "").encode()).hexdigest()
        if r[0] not in best or h < best[r[0]][0]:
            best[r[0]] = (h, r)
    write_docs(gated, [v[1] for v in sorted(best.values(), key=lambda v: v[1][0])])

    rng = np.random.default_rng(5)
    vecs = (
        [(0, rng.normal(size=64)), (0, rng.normal(size=64))]   # id dup, diff vec
        + [(1, None), (1, None)]                               # id dup, NULL vecs
        + [(i, rng.normal(size=64)) for i in range(2, 30)]
    )

    def write_vecs(d, rows):
        pq.write_table(pa.table({
            "vec_id": pa.array([v[0] for v in rows], type=pa.int64()),
            "embedding": pa.array(
                [None if v[1] is None else [float(x) for x in v[1]] for v in rows],
                type=pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(len(rows))], type=pa.int32()),
        }), str(d / "embeddings.parquet"))

    write_vecs(raw, vecs)
    seen, uniq = set(), []
    for v in vecs:  # keep the FIRST row per id (any deterministic singling works)
        if v[0] not in seen:
            seen.add(v[0])
            uniq.append(v)
    write_vecs(gated, uniq)
    return str(raw), str(gated)


def _duck_for_docs_embs(sf_dir):
    con = duckdb.connect()
    for t in TABLES[:-1] + ["documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_dup_key_gates_classify_and_agree(spark, dup_key_dirs):
    raw, _gated = dup_key_dirs
    con = _duck_for_docs_embs(raw)
    try:
        _assert_agree("doc_id_dedup_gate", spark, raw, con, what="duplicate doc ids")
        _assert_agree("vec_id_unique_audit", spark, raw, con, what="duplicate vec ids")
        rows = {
            r.doc_id: r.status
            for r in entrymod.queries()["doc_id_dedup_gate"](spark, raw).collect()
        }
        assert rows[1] == "dup_identical"
        assert rows[2] == "dup_conflict"
        assert rows[3] == "dup_identical"   # NULL text ≡ '' per the NULL contract
        assert rows[4] == "unique"
        vrows = {
            r.vec_id: r.status
            for r in entrymod.queries()["vec_id_unique_audit"](spark, raw).collect()
        }
        assert vrows[0] == "dup_conflict"
        assert vrows[1] == "dup_conflict"   # two NULL vectors: no norms at all
        assert vrows[2] == "unique"
    finally:
        con.close()
        spark.catalog.clearCache()


@pytest.mark.parametrize("name", sorted(set(DOC_ENTRIES + EMB_ENTRIES)))
def test_engines_agree_on_gated_dup_corpus(name, spark, dup_key_dirs):
    """Composition contract, primary-key edition: gate first, then every
    documents/embeddings entry agrees cross-engine."""
    _raw, gated = dup_key_dirs
    con = _duck_for_docs_embs(gated)
    try:
        _assert_agree(name, spark, gated, con, what="gated dup-key corpus")
    finally:
        con.close()


# ----------------------------------------------------------- part family (r7)

PART_ENTRIES = sorted(
    name for name, sql in entrymod.oracle_sql().items()
    if " part " in sql.lower().replace("\n", " ")
    or "from part" in sql.lower()
    or "join part" in sql.lower()
)


@pytest.fixture(scope="module")
def degen_pt_dir(tmp_path_factory):
    """Real parts PLUS the entity-resolution worst cases for the
    p_type/p_size blocked pair join (fuzzy_name_pairs): empty/NULL names,
    unicode near-dups, identical long names, and one 30-part block that
    shares a single (p_type, p_size) key — the blocking skew case."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("degen_pt")
    for t in ["region", "nation", "customer", "supplier", "orders", "lineitem",
              "events", "documents", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))
    pt = duckdb.sql(f"SELECT * FROM '{src}/part.parquet'").df()
    extra = pd.DataFrame([
        (700001, "", "Brand#99", "DEGEN TYPE", 1, 1.0),
        (700002, None, "Brand#99", "DEGEN TYPE", 1, 2.0),            # NULL name
        (700003, "widget prö", "Brand#99", "DEGEN TYPE", 1, 3.0),
        (700004, "widget pro", "Brand#99", "DEGEN TYPE", 1, 4.0),    # 1 edit away
        (700005, "x" * 55, "Brand#98", "DEGEN TYPE", 2, 5.0),
        (700006, "x" * 55, "Brand#98", "DEGEN TYPE", 2, 6.0),        # identical
        # r7 review finding: Java's $ matches BEFORE a final line
        # terminator, RE2's doesn't — a trailing-\n name passed the Spark
        # printable-ASCII gate but failed the oracle's. Pinned with \z in
        # both engines; these rows keep the anchor honest.
        (700007, "widget pro\n", "Brand#99", "DEGEN TYPE", 1, 7.0),
        (700008, "widget pro\r", "Brand#99", "DEGEN TYPE", 1, 8.0),
        (700009, "widget pro\x85", "Brand#99", "DEGEN TYPE", 1, 9.0),
    ] + [
        # one blocking key shared by 30 parts: the pair join's skew case
        (700100 + i, f"blocky part name {i % 7}", "Brand#97", "BLOCK TYPE", 3,
         10.0 + i)
        for i in range(30)
    ], columns=list(pt.columns))
    base = pa.Table.from_pandas(pd.concat([pt, extra], ignore_index=True),
                                preserve_index=False)
    # NULL p_partkey (r7): probed green across the family — pinned via
    # the Arrow path (pandas int64 cannot hold None)
    null_rows = base.slice(0, 1).to_pylist()
    null_rows[0]["p_partkey"] = None
    pq.write_table(
        pa.concat_tables([base, pa.Table.from_pylist(null_rows, schema=base.schema)]),
        str(d / "part.parquet"),
    )
    return str(d)


@pytest.fixture(scope="module")
def degen_pt_duck(degen_pt_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{degen_pt_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", PART_ENTRIES)
def test_engines_agree_on_degenerate_parts(name, spark, degen_pt_dir, degen_pt_duck):
    _assert_agree(name, spark, degen_pt_dir, degen_pt_duck, what="degenerate parts")


# ------------------------------------------- sweep-coverage assertion (r7)

def test_every_oracle_entry_is_swept_by_a_degenerate_family():
    """VERDICT r5 ask #4: a catalog entry whose oracle reads a base table
    must belong to at least one degenerate-family sweep — additions can't
    silently escape the gauntlet. Entries that read NO base table
    (pure config-driven generators over a synthesized time grid) are
    exempt BY CONSTRUCTION: the exemption is derived from the oracle SQL,
    not from a hand-kept list."""
    import re

    base_tables = ["region", "nation", "customer", "supplier", "part",
                   "orders", "lineitem", "events", "documents", "embeddings"]
    family_tables = {"documents", "embeddings", "events", "lineitem",
                     "orders", "customer", "part"}
    # FROM/JOIN/comma-anchored word match, not raw substring: 'partition
    # by' and 'p_partkey' must not count as reading the part table (an
    # entry could satisfy the family check vacuously), and comma-joins
    # ('FROM customer, orders') must count their SECOND relation too
    # (both r7 review findings).
    pats = {
        t: re.compile(rf"(?:\bfrom\s+|\bjoin\s+|,\s*){t}\b")
        for t in base_tables
    }
    missing = {}
    for name, sql in entrymod.oracle_sql().items():
        sl = sql.lower()
        mentioned = {t for t in base_tables if pats[t].search(sl)}
        if not mentioned:
            continue  # config-driven generator: no table input to degrade
        if not (mentioned & family_tables):
            missing[name] = mentioned
    assert not missing, (
        f"oracle entries outside every degenerate family sweep: {missing} — "
        "add the table to a family fixture or a new family"
    )


# ------------------------------------------- duplicate event ids (r7)

@pytest.fixture(scope="module")
def dup_ev_dirs(tmp_path_factory):
    """At-least-once delivery: the real events table PLUS exact
    redelivery copies and same-id mutated payloads. Seven series-pipeline
    entries diverged on this shape (slot aggregations tie-break
    differently between engines). Contract: event_id_dedup_gate
    classifies; downstream event operators are specified over gated (one
    row per event_id) corpora. Returns (raw_dir, gated_dir, dup_ids, mut_ids)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    raw = tmp_path_factory.mktemp("dup_ev_raw")
    gated = tmp_path_factory.mktemp("dup_ev_gated")
    for d in (raw, gated):
        for t in [x for x in TABLES if x != "events"] + ["documents"]:
            shutil.copy(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))

    ev = duckdb.sql(f"SELECT * FROM '{src}/events.parquet'").df()
    dups = ev.head(6).copy()              # exact redelivery copies
    mut = ev.iloc[6:10].copy()
    mut["value"] = mut["value"] + 1.0     # same id, mutated payload

    def write_ev(d, frame, null_id_rows=0):
        t = pa.Table.from_pandas(frame, preserve_index=False)
        fields = [pa.field(f.name, pa.timestamp("ns"))
                  if pa.types.is_timestamp(f.type) else f for f in t.schema]
        t = t.cast(pa.schema(fields))
        if null_id_rows:
            # NULL event_id (r7): no key breaks the (ts, event_id) total
            # order every sequence window relies on (the engines also
            # disagree on NULL sort position), and dedup-by-id collides
            # all such rows — the gate flags them, downstream sequence
            # operators are specified over gated corpora. Arrow path:
            # a pandas int64 column cannot hold None.
            rows = t.slice(0, null_id_rows).to_pylist()
            for r in rows:
                r["event_id"] = None
            t = pa.concat_tables([t, pa.Table.from_pylist(rows, schema=t.schema)])
        pq.write_table(t, str(d / "events.parquet"))

    write_ev(raw, pd.concat([ev, dups, mut], ignore_index=True), null_id_rows=2)
    write_ev(gated, ev)  # one row per id: drop copies, keep originals
    return str(raw), str(gated), set(dups["event_id"]), set(mut["event_id"])


def test_event_id_gate_classifies_and_agrees(spark, dup_ev_dirs):
    raw, _gated, dup_ids, mut_ids = dup_ev_dirs
    con = _duck_for_events(raw)
    try:
        _assert_agree("event_id_dedup_gate", spark, raw, con,
                      what="duplicate event ids")
        rows = {
            r.event_id: r.status
            for r in entrymod.queries()["event_id_dedup_gate"](spark, raw).collect()
        }
        for i in dup_ids:
            assert rows[i] == "dup_identical"
        for i in mut_ids:
            assert rows[i] == "dup_conflict"
        # NULL is not a key: all id-less rows collide into one flagged
        # group (two different payloads here -> dup_conflict), so the
        # gate quarantines them before any sequence window relies on the
        # (ts, event_id) total order
        assert rows[None] == "dup_conflict"
        assert sum(1 for s in rows.values() if s != "unique") == len(dup_ids | mut_ids) + 1
    finally:
        con.close()
        spark.catalog.clearCache()


@pytest.mark.parametrize("name", EVENT_ENTRIES)
def test_engines_agree_on_gated_dup_events(name, spark, dup_ev_dirs):
    """Composition contract, event-id edition: gate first, then every
    events entry agrees cross-engine."""
    _raw, gated, _d, _m = dup_ev_dirs
    con = _duck_for_events(gated)
    try:
        _assert_agree(name, spark, gated, con, what="gated dup-event corpus")
    finally:
        con.close()


# ----------------------------------------- non-finite event values (r7)

@pytest.fixture(scope="module")
def nonfinite_ev_dirs(tmp_path_factory):
    """Measurement-column worst cases: NaN/±Inf (fp overflow, bad sensor
    encodes), extreme magnitudes past the int64-exact double range, a
    denormal, negative zero, and NULL. A probe over all 51 events-reading
    entries found one Spark ANSI job-killer (anomaly magnitude cast — now
    try_cast), six oracle-side int-cast aborts, and eleven silent
    cross-engine divergences (NaN window ordering / grouping / percentile
    interpolation) on this shape. Contract: events_value_gate classifies;
    value-arithmetic operators are specified over gated corpora (ok +
    null_value rows — NULL measurements stay in-contract, every aggregate
    skips them symmetrically). Returns (raw_dir, gated_dir, statuses)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    raw = tmp_path_factory.mktemp("nf_ev_raw")
    gated = tmp_path_factory.mktemp("nf_ev_gated")
    for d in (raw, gated):
        for t in [x for x in TABLES if x != "events"] + ["documents"]:
            shutil.copy(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))

    # pure Arrow, NOT pandas: a pandas float64 column cannot hold NaN and
    # NULL as distinct states (from_pandas folds NaN into null), which
    # would silently drop the very class this family exists for
    ev = duckdb.sql(f"SELECT * FROM '{src}/events.parquet'").arrow()
    specials = [
        (10000001, float("nan"), "non_finite"),
        (10000002, float("inf"), "non_finite"),
        (10000003, float("-inf"), "non_finite"),
        (10000004, 1e308, "extreme"),
        (10000005, -1e308, "extreme"),
        (10000006, 1e15, "extreme"),       # past Spark floor()'s int64/1e4 cliff
        (10000007, 1e12, "ok"),            # exactly on the gate bound: kept
        (10000008, 5e-324, "ok"),          # smallest denormal
        (10000009, -0.0, "ok"),            # negative zero
        (10000010, None, "null_value"),
    ]
    head = ev.slice(0, len(specials))
    extra = head.set_column(
        head.schema.get_field_index("event_id"), "event_id",
        pa.array([i for i, _, _ in specials],
                 type=head.schema.field("event_id").type),
    )
    extra = extra.set_column(
        extra.schema.get_field_index("value"), "value",
        pa.array([v for _, v, _ in specials], type=pa.float64(),
                 from_pandas=False),
    )
    keep = [i for i, (_, _, s) in enumerate(specials) if s in ("ok", "null_value")]
    pq.write_table(pa.concat_tables([ev, extra]), str(raw / "events.parquet"))
    pq.write_table(pa.concat_tables([ev, extra.take(keep)]),
                   str(gated / "events.parquet"))
    return str(raw), str(gated), {i: s for i, _, s in specials}


def test_events_value_gate_classifies_and_agrees(spark, nonfinite_ev_dirs):
    raw, _gated, statuses = nonfinite_ev_dirs
    con = _duck_for_events(raw)
    try:
        _assert_agree("events_value_gate", spark, raw, con,
                      what="non-finite event values")
        got = {
            s.status: s.first_event_id
            for s in entrymod.queries()["events_value_gate"](spark, raw).collect()
        }
        assert got["non_finite"] == 10000001
        assert got["extreme"] == 10000004
        assert set(got) == {"ok", "null_value", "non_finite", "extreme"}
    finally:
        con.close()
        spark.catalog.clearCache()


def test_anomaly_magnitude_never_throws_on_wild_max(spark, nonfinite_ev_dirs):
    """The job-killer class the gate exists for: an Inf/NaN series max
    reaching the anomaly magnitude's int cast was a stage-aborting
    CAST_OVERFLOW under ANSI. try_cast degrades the magnitude to NULL on
    exactly the wild slots; the run must complete either way."""
    raw, _gated, _ = nonfinite_ev_dirs
    out = entrymod.queries()["anomaly_inject_stride"](spark, raw)
    assert out.count() > 0


def test_interpolate_fixed_point_guard_at_saturation_cliff(
    spark, nonfinite_ev_dirs, tmp_path
):
    """Spark's floor() is LONG-typed and SATURATES at int64 max, so the
    4-dp fixed-point rounding trick silently corrupted any value past
    ~9.2e14 (1e15 came back as 9.22337e14 while DuckDB's double floor
    kept 1e15). Both engines now skip the rounding past |v| >= 9e14;
    this corpus (finite but saturating values, no NaN/Inf noise) pins
    the guard cross-engine."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    d = tmp_path / "sat_ev"
    d.mkdir()
    for t in [x for x in TABLES if x != "events"] + ["documents"]:
        shutil.copy(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))
    ev = duckdb.sql(f"SELECT * FROM '{src}/events.parquet'").df()
    extra = ev.head(3).copy().reset_index(drop=True)
    extra["event_id"] = [10000011, 10000012, 10000013]
    extra["value"] = [1e15, 9e14, 8.9e14]  # past / on / under the guard
    frame = pd.concat([ev, extra], ignore_index=True)
    t = pa.Table.from_pandas(frame, preserve_index=False)
    fields = [pa.field(f.name, pa.timestamp("ns"))
              if pa.types.is_timestamp(f.type) else f for f in t.schema]
    pq.write_table(t.cast(pa.schema(fields)), str(d / "events.parquet"))
    con = _duck_for_events(str(d))
    try:
        _assert_agree("interpolate_gaps", spark, str(d), con,
                      what="fixed-point saturation cliff")
    finally:
        con.close()
        spark.catalog.clearCache()


@pytest.mark.parametrize("name", EVENT_ENTRIES)
def test_engines_agree_on_gated_value_corpus(name, spark, nonfinite_ev_dirs):
    """Composition contract, measurement edition: gate first, then every
    events entry (denormals, ±0.0, boundary magnitudes, and NULLs still
    present) agrees cross-engine."""
    _raw, gated, _ = nonfinite_ev_dirs
    con = _duck_for_events(gated)
    try:
        _assert_agree(name, spark, gated, con, what="gated value corpus")
    finally:
        con.close()


# ------------------------------------------ ragged embedding dims (r7)

@pytest.fixture(scope="module")
def ragged_emb_dirs(tmp_path_factory):
    """Ragged vector lengths — re-encoded shards landing with a different
    model's dim are routine at crawl scale. A probe over the embeddings
    entries found SIX Spark-side job-killers (inhomogeneous-batch numpy
    errors in every LSH/IVF kernel path, and an out-of-bounds centroid
    update in the k-means fit) plus four silent divergences. Contract:
    embedding_finite_gate classifies (wrong_dim = length <> the corpus's
    modal length); geometry operators are specified over gated corpora;
    the kernels themselves zero-fill rather than crash on raw input.
    Returns (raw_dir, gated_dir)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    raw = tmp_path_factory.mktemp("ragged_raw")
    gated = tmp_path_factory.mktemp("ragged_gated")
    for d in (raw, gated):
        for t in [x for x in TABLES if x != "embeddings"] + ["documents"]:
            shutil.copy(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))

    emb = duckdb.sql(f"SELECT * FROM '{src}/embeddings.parquet'").arrow()
    rng = np.random.default_rng(11)
    ragged = [
        (20000001, list(map(float, rng.normal(size=32)))),   # half dim
        (20000002, list(map(float, rng.normal(size=65)))),   # off by one
        (20000003, [1.0]),                                   # single component
        (20000004, list(map(float, rng.normal(size=128)))),  # double dim
    ]
    head = emb.slice(0, len(ragged))
    extra = head.set_column(
        head.schema.get_field_index("vec_id"), "vec_id",
        pa.array([i for i, _ in ragged], type=head.schema.field("vec_id").type))
    extra = extra.set_column(
        extra.schema.get_field_index("embedding"), "embedding",
        pa.array([v for _, v in ragged], type=head.schema.field("embedding").type))
    pq.write_table(pa.concat_tables([emb, extra]), str(raw / "embeddings.parquet"))
    shutil.copy(f"{src}/embeddings.parquet", str(gated / "embeddings.parquet"))
    return str(raw), str(gated)


def _duck_for_embs(sf_dir):
    con = duckdb.connect()
    for t in [x for x in TABLES if x != "embeddings"] + ["documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_embedding_gate_classifies_ragged_and_agrees(spark, ragged_emb_dirs):
    raw, _gated = ragged_emb_dirs
    con = _duck_for_embs(raw)
    try:
        _assert_agree("embedding_finite_gate", spark, raw, con,
                      what="ragged embedding dims")
        got = {
            r.status: (r.n_vectors, r.first_vec_id)
            for r in entrymod.queries()["embedding_finite_gate"](spark, raw).collect()
        }
        assert got["wrong_dim"] == (4, 20000001)
    finally:
        con.close()
        spark.catalog.clearCache()


@pytest.mark.parametrize("name", ["topk_cosine_ivf", "kmeans_assign",
                                  "topk_cosine_lsh", "knn_classify_lsh",
                                  "hard_negatives_lsh", "embedding_near_dup",
                                  "topk_recall_lsh", "topk_recall_ivf"])
def test_kernel_paths_survive_ragged_vectors(name, spark, ragged_emb_dirs):
    """The job-killer class: before the zero-fill/modal-dim guards, every
    numpy kernel path died on an inhomogeneous batch (and the k-means
    update indexed out of bounds on posexplode positions past the
    centroid dim). Raw ragged corpora must complete — quarantine is the
    gate's job, surviving is the kernel's."""
    raw, _gated = ragged_emb_dirs
    out = entrymod.queries()[name](spark, raw)
    out.collect()
    spark.catalog.clearCache()


@pytest.mark.parametrize("name", EMB_ENTRIES)
def test_engines_agree_on_gated_ragged_corpus(name, spark, ragged_emb_dirs):
    """Composition contract, geometry edition: gate first, then every
    embeddings entry agrees cross-engine."""
    _raw, gated = ragged_emb_dirs
    con = _duck_for_embs(gated)
    try:
        _assert_agree(name, spark, gated, con, what="gated ragged corpus")
    finally:
        con.close()
