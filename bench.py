"""Benchmark harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line.

Each query is forced through full materialization with the JVM-side
``noop`` sink (no Python collection overhead, no pruning shortcuts).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from amazon_macie_activity_generator_spark.session import get_spark
    from amazon_macie_activity_generator_spark.queries import QUERIES

    spark = get_spark("amazon-macie-activity-generator-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/executors/noop-sink path so the first query's timing
    # is the query, not session startup
    spark.range(1_000_000).selectExpr("sum(id) AS s").write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, (fn, _sql) in QUERIES.items():
        df = fn(spark, sf_dir)
        start = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 4)
        spark.catalog.clearCache()  # drop per-query persists; keep memory flat

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
