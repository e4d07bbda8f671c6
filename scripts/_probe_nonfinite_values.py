"""One-off probe: run every events-reading catalog entry on a corpus with
NaN/Inf/extreme-magnitude values, comparing Spark vs DuckDB (deleted after use)."""
import math
import shutil
import sys
import tempfile
import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as m
from _cross_engine import canon

SRC = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings"]
d = tempfile.mkdtemp(prefix="nonfinite_ev_")
for t in TABLES:
    shutil.copy(f"{SRC}/{t}.parquet", f"{d}/{t}.parquet")

ev = duckdb.sql(f"SELECT * FROM '{SRC}/events.parquet'").arrow()
t0 = dt.datetime(2024, 1, 1)
extra_vals = [float("nan"), float("inf"), float("-inf"),
              1e308, -1e308, 5e-324, -0.0]
n0 = ev.num_rows
extra = pa.table({
    "event_id": pa.array([10_000_000 + i for i in range(len(extra_vals))], pa.int64()),
    "ts": pa.array([t0 + dt.timedelta(minutes=i) for i in range(len(extra_vals))],
                   pa.timestamp("us")),
    "user_id": pa.array([42] * len(extra_vals), pa.int64()),
    "event_type": pa.array(["view", "click", "purchase", "view", "click",
                            "view", "view"][: len(extra_vals)]),
    "value": pa.array(extra_vals, pa.float64()),
    "props": pa.array(['{"k": 1}'] * len(extra_vals)),
})
extra = extra.cast(ev.schema)
pq.write_table(pa.concat_tables([ev, extra]), f"{d}/events.parquet")

con = duckdb.connect()
for t in TABLES + ["events"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")

qs, oracles = m.queries(), m.oracle_sql()
names = sorted(n for n, sql in oracles.items() if "events" in sql.lower())
crash, mismatch, ok = [], [], []
for name in names:
    try:
        sdf = canon(qs[name](spark, d).toPandas())
    except Exception as e:
        crash.append((name, "SPARK", str(e).splitlines()[0][:160]))
        continue
    try:
        ddf = canon(con.sql(oracles[name]).df())
    except Exception as e:
        crash.append((name, "DUCK", str(e).splitlines()[0][:160]))
        continue
    same = sdf.shape == ddf.shape and list(sdf.columns) == list(ddf.columns) and sdf.equals(ddf)
    (ok if same else mismatch).append(name)
    print(name, "OK" if same else "MISMATCH", flush=True)

print("\n=== CRASH ===")
for c in crash:
    print(c)
print("=== MISMATCH ===", mismatch)
print(f"=== ok {len(ok)} / crash {len(crash)} / mismatch {len(mismatch)} of {len(names)}")
