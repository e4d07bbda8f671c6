"""Min-of-N bench for a subset of catalog queries (bench.py methodology:
noop sink, clearCache between, min over reps). Usage:

    python scripts/mini_bench.py [-r REPS] name [name ...]
"""
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-r":
        reps = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from amazon_macie_activity_generator_spark.session import get_spark
    from amazon_macie_activity_generator_spark.queries import QUERIES

    spark = get_spark("mini-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    import pandas as pd
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _w(s: pd.Series) -> pd.Series:
        return s

    spark.range(64 * 1000).repartition(64).select(_w(col("id")).alias("w")) \
        .write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    builds: dict[str, float] = {}
    for _ in range(reps):
        for name in names:
            fn, _sql = QUERIES[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            b = time.perf_counter() - t0
            builds[name] = min(builds.get(name, b), b)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            s = time.perf_counter() - t0
            timings[name] = min(timings.get(name, s), s)
            spark.catalog.clearCache()
            spark.range(1).count()
    for name in names:
        print(f"{timings[name]:8.3f}s build={builds[name]:7.3f}s  {name}")
    print(f"total {sum(timings.values()):.3f}s (min of {reps})")


if __name__ == "__main__":
    main()
