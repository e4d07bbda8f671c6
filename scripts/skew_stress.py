"""Skewed-key wall-clock stress (VERDICT r7 ask #3, measurement half).

Builds sf0.1-scale corpora whose KEY DISTRIBUTION is hostile —
- events: hub user owns ~30% of rows, one event_type owns ~90%;
- documents: a 500-copy exact-duplicate cluster appended;
- embeddings: 1,500 bit-identical vectors appended (~23% of the corpus);
- lineitem: one hot part in ~30% of line items (hub co-purchase node) —
and times family-representative catalog entries on the UNIFORM sf0.1
corpus vs the SKEWED one (min over --reps full passes each). A bounded
ratio says no stage degenerates into a few-hot-cores straggler; results
are recorded in SCALE.md.

Usage:
    python scripts/skew_stress.py [--sf-dir /root/testdata/sf0.1]
        [--work-dir /tmp/spark_graft_skew] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# family representative -> the table its skew targets
STRESS_QUERIES = {
    "tumbling_counts": "events",
    "rolling_stats": "events",
    "session_paths": "events",
    "event_gaps": "events",
    "dedup_exact": "documents",
    "dedup_minhash_md5": "documents",
    "dedup_containment": "documents",
    "embedding_near_dup": "embeddings",
    "topk_cosine_lsh": "embeddings",
    "copurchase_pairs": "lineitem",
    "pagerank_copurchase": "lineitem",
    "triangle_count": "lineitem",
}

DUP_TEXT = ("the quiet harbor town woke early and the fishing boats left "
            "before the sun cleared the eastern ridge while gulls followed "
            "the wake looking for scraps of the morning catch")


def build_skewed(sf_dir: str, out_dir: str) -> None:
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        if t not in ("events", "documents", "embeddings", "lineitem"):
            shutil.copy(f"{sf_dir}/{t}.parquet", f"{out_dir}/{t}.parquet")

    ev = duckdb.sql(f"SELECT * FROM '{sf_dir}/events.parquet'").df()
    idx = np.arange(len(ev))
    ev["user_id"] = np.where(idx % 10 < 3, 42, ev["user_id"])
    ev["event_type"] = np.where(idx % 10 < 9, "view", ev["event_type"])
    t = pa.Table.from_pandas(ev, preserve_index=False)
    fields = [pa.field(f.name, pa.timestamp("ns"))
              if pa.types.is_timestamp(f.type) else f for f in t.schema]
    pq.write_table(t.cast(pa.schema(fields)), f"{out_dir}/events.parquet")

    docs = duckdb.sql(f"SELECT * FROM '{sf_dir}/documents.parquet'").df()
    cluster = pd.DataFrame({
        "doc_id": np.arange(1_000_001, 1_000_501, dtype=np.int64),
        "text": DUP_TEXT, "lang": "en", "source": "s1",
        "n_chars": np.int64(len(DUP_TEXT)),
    })
    pq.write_table(
        pa.Table.from_pandas(pd.concat([docs, cluster], ignore_index=True),
                             preserve_index=False),
        f"{out_dir}/documents.parquet")

    emb = duckdb.sql(f"SELECT * FROM '{sf_dir}/embeddings.parquet'").arrow()
    one = emb.slice(0, 1).to_pylist()[0]
    clones = pa.Table.from_pylist(
        [{"vec_id": 2_000_001 + i, "embedding": one["embedding"],
          "label": one["label"]} for i in range(1500)],
        schema=emb.schema)
    pq.write_table(pa.concat_tables([emb, clones]), f"{out_dir}/embeddings.parquet")

    hot = duckdb.sql(
        f"SELECT min(l_partkey) FROM '{sf_dir}/lineitem.parquet'").fetchone()[0]
    duckdb.sql(f"""
        COPY (SELECT * REPLACE (
                CASE WHEN (l_orderkey * 7 + l_linenumber) % 10 < 3
                     THEN {hot} ELSE l_partkey END AS l_partkey)
              FROM '{sf_dir}/lineitem.parquet')
        TO '{out_dir}/lineitem.parquet' (FORMAT PARQUET)
    """)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--work-dir", default="/tmp/spark_graft_skew")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", default=",".join(STRESS_QUERIES))
    args = ap.parse_args()

    skew_dir = os.path.join(args.work_dir, "skewed")
    if not os.path.exists(os.path.join(skew_dir, "embeddings.parquet")):
        build_skewed(args.sf_dir, skew_dir)

    from amazon_macie_activity_generator_spark.queries import QUERIES
    from amazon_macie_activity_generator_spark.session import get_spark

    spark = get_spark("skew-stress")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    names = [q for q in args.queries.split(",") if q in STRESS_QUERIES]
    results = {}
    for name in names:
        fn = QUERIES[name][0]
        row = {}
        for label, d in (("uniform", args.sf_dir), ("skewed", skew_dir)):
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            row[label] = round(best, 3)
        row["ratio"] = round(row["skewed"] / row["uniform"], 2)
        row["table"] = STRESS_QUERIES[name]
        results[name] = row
        print(json.dumps({"query": name, **row}), flush=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
