"""One-off: diff the failing entries on the gated non-finite corpus (deleted after use)."""
import sys, shutil, tempfile
import duckdb
import pandas as pd
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
d = tempfile.mkdtemp(prefix="nf_gated_")
for t in TABLES:
    shutil.copy(f"{SRC}/{t}.parquet", f"{d}/{t}.parquet")

ev = duckdb.sql(f"SELECT * FROM '{SRC}/events.parquet'").df()
specials = [(10000007, 1e15), (10000008, 5e-324), (10000009, -0.0), (10000010, None)]
extra = ev.head(len(specials)).copy().reset_index(drop=True)
extra["event_id"] = [i for i, _ in specials]
extra["value"] = [v for _, v in specials]
frame = pd.concat([ev, extra], ignore_index=True)
t = pa.Table.from_pandas(frame, preserve_index=False)
fields = [pa.field(f.name, pa.timestamp("ns")) if pa.types.is_timestamp(f.type) else f
          for f in t.schema]
pq.write_table(t.cast(pa.schema(fields)), f"{d}/events.parquet")

con = duckdb.connect()
for t2 in TABLES + ["events"]:
    con.execute(f"CREATE VIEW {t2} AS SELECT * FROM read_parquet('{d}/{t2}.parquet')")

qs, oracles = m.queries(), m.oracle_sql()
FAILING = ["align_zero_fill", "anomaly_inject_stride", "interpolate_gaps",
           "ntile_bins", "pivot_slot_row", "rolling_stats", "scd2_intervals",
           "unpivot_roundtrip", "value_histogram"]
for name in FAILING:
    s = canon(qs[name](spark, d).toPandas()).astype(str)
    dd = canon(con.sql(oracles[name]).df()).astype(str)
    if s.shape != dd.shape:
        print(f"== {name}: SHAPE {s.shape} vs {dd.shape}")
        merged = s.merge(dd, how="outer", indicator=True)
        print(merged[merged["_merge"] != "both"].head(8).to_string())
        continue
    neq = (s != dd).any(axis=1)
    if not neq.any():
        print(f"== {name}: agrees now?")
        continue
    print(f"== {name}: {neq.sum()} differing rows")
    print("SPARK:\n", s[neq].head(5).to_string())
    print("DUCK:\n", dd[neq].head(5).to_string())
