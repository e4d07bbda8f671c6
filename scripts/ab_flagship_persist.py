"""Interleaved A/B: flagship_pipeline WITH the r14 series/aligned persist
barriers vs WITHOUT (scoped_persist monkeypatched to identity), one
session, alternating, noop sink + clearCache per execution.
"""
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

REPS = int(os.environ.get("AB_REPS", "6"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from amazon_macie_activity_generator_spark.session import get_spark
    from amazon_macie_activity_generator_spark import cache as C
    from amazon_macie_activity_generator_spark.queries import QUERIES

    spark = get_spark("ab-flagship-persist")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()

    real_persist = C.scoped_persist
    ident = lambda df, scope, keep=None: df  # noqa: E731

    fn, _sql = QUERIES["flagship_pipeline"]
    results: dict[str, list[float]] = {}
    for rep in range(REPS):
        for variant, impl in (("A_no_persist", ident), ("B_persist", real_persist)):
            C.scoped_persist = impl
            df = fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            secs = time.perf_counter() - t0
            results.setdefault(variant, []).append(secs)
            spark.catalog.clearCache()
            spark.range(1).count()
    C.scoped_persist = real_persist

    print(f"reps={REPS} (interleaved)")
    for variant, xs in results.items():
        print(f"flagship {variant}: min={min(xs):.3f} med={statistics.median(xs):.3f}")


if __name__ == "__main__":
    main()
