"""Interleaved matched-load A/B for the r14 _order_part_pairs_sym change:
pagerank_copurchase and triangle_count built with the OLD
union-of-reversed edge list vs the NEW single-gather symmetric explode,
alternating in ONE session (bench methodology: noop sink, clearCache
between, min/median over reps).
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
    from amazon_macie_activity_generator_spark.queries import QUERIES
    from amazon_macie_activity_generator_spark import queries_ext4 as Q4
    from pyspark.sql import functions as F

    spark = get_spark("ab-sym-edges")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()

    new_sym = Q4._order_part_pairs_sym

    def old_sym(li):
        pairs = Q4._order_part_pairs(li)
        return pairs.select(F.col("p1").alias("src"), F.col("p2").alias("dst")).unionAll(
            pairs.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
        )

    results: dict[tuple[str, str], list[float]] = {}
    for rep in range(REPS):
        for variant, impl in (("A_old_union", old_sym), ("B_new_gather", new_sym)):
            Q4._order_part_pairs_sym = impl
            for name in ("pagerank_copurchase", "triangle_count"):
                fn, _sql = QUERIES[name]
                df = fn(spark, sf_dir)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                secs = time.perf_counter() - t0
                results.setdefault((name, variant), []).append(secs)
                spark.catalog.clearCache()
                spark.range(1).count()
    Q4._order_part_pairs_sym = new_sym

    print(f"\nreps={REPS} (interleaved, one session)")
    for name in ("pagerank_copurchase", "triangle_count"):
        row = []
        for variant in ("A_old_union", "B_new_gather"):
            xs = results[(name, variant)]
            row.append(f"{variant}: min={min(xs):.3f} med={statistics.median(xs):.3f}")
        print(f"{name:22s} " + "   ".join(row))


if __name__ == "__main__":
    main()
