"""Drive the driver contract the way the ROUND DRIVER does: a vanilla
SparkSession with none of our session.py configs, in a subprocess (one
JVM can hold only one SparkContext, and the suite's fixture session has
our configs baked in). This is the failure class pytest's configured
session can mask — BENCH_r02 died on a vanilla-session-only timestamp
regression that every configured-session test passed through."""

from __future__ import annotations

import subprocess
import sys

DRIVER_SCRIPT = r"""
import sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as m

rows = m.entry(spark).collect()
assert len(rows) >= 1, "entry() returned no rows"

qs = m.queries()
oracles = m.oracle_sql()
# one representative per risk class: timestamp arithmetic, streaming,
# Arrow mapInPandas with real byte parsing, plain batch agg
for name in ["asof_join", "streaming_dedup", "multimodal_decode_real",
             "agg_pricing_summary"]:
    out = qs[name](spark, "/root/testdata/sf0.001").collect()
    assert len(out) >= 1, f"{name} returned no rows under a vanilla session"
assert set(oracles) <= set(qs), "oracle_sql keys must be a subset of queries"
print("DRIVER_CONTRACT_OK")
"""


def test_contract_runs_under_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", DRIVER_SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-2000:]}"
    assert "DRIVER_CONTRACT_OK" in proc.stdout
