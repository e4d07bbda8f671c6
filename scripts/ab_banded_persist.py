"""Interleaved matched-load A/B for VERDICT r13 item 1: is the
``scoped_persist(grouped)`` barrier in ``_banded_self_pairs`` a net cost
for the xxhash64 dedup variants (dedup_minhash / dedup_simhash /
split_leakage) at sf0.1?

A = HEAD (grouped persisted, 3 consumers read the cache)
B = no-persist (grouped recomputed by each consumer)

Alternating A/B in one session under identical load removes the box
noise that produced the r13 driver numbers (three same-code full-bench
runs spanned 96.7-117.3 s). Reports per-variant min and median.
"""
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

REPS = int(os.environ.get("AB_REPS", "6"))
NAMES = ["dedup_minhash", "dedup_simhash", "split_leakage", "dedup_minhash_md5", "dedup_simhash_md5"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from amazon_macie_activity_generator_spark.session import get_spark
    from amazon_macie_activity_generator_spark.queries import QUERIES
    from amazon_macie_activity_generator_spark.operators import dedup as D
    from pyspark.sql import functions as F

    spark = get_spark("ab-banded-persist")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    import pandas as pd
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _w(s: pd.Series) -> pd.Series:
        return s

    spark.range(64 * 1000).repartition(64).select(_w(col("id")).alias("w")) \
        .write.format("noop").mode("overwrite").save()

    orig = D._banded_self_pairs

    def no_persist(banded, heavy_bucket=512, n_salt=8):
        grouped = banded.groupBy("band", "bh").agg(
            F.sort_array(F.collect_list("id")).alias("ids")
        )
        light_pairs = (
            grouped.filter(F.size("ids") <= heavy_bucket)
            .select(
                F.explode(
                    F.expr(
                        "flatten(transform(ids, (x, i) -> "
                        "transform(slice(ids, i + 2, size(ids)), "
                        "y -> struct(x AS id_a, y AS id_b))))"
                    )
                ).alias("pr")
            )
            .select("pr.id_a", "pr.id_b")
        )
        heavy = grouped.filter(F.size("ids") > heavy_bucket).select(
            "band", "bh", F.explode("ids").alias("id")
        )

        def _salt(c):
            return F.pmod(F.xxhash64(c, F.lit("lsh-bucket-salt")), F.lit(n_salt)).cast("int")

        fan = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
        ha = (
            heavy.select(F.col("id").alias("id_a"), "band", "bh")
            .withColumn("sa", _salt(F.col("id_a")))
            .withColumn("sb", fan)
        )
        hb = (
            heavy.select(F.col("id").alias("id_b"), "band", "bh")
            .withColumn("sb", _salt(F.col("id_b")))
            .withColumn("sa", fan)
        )
        heavy_pairs = (
            ha.join(hb, ["band", "bh", "sa", "sb"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        return light_pairs.unionAll(heavy_pairs).dropDuplicates(["id_a", "id_b"])

    results: dict[tuple[str, str], list[float]] = {}
    for rep in range(REPS):
        for variant, impl in (("A_persist", orig), ("B_nopersist", no_persist)):
            D._banded_self_pairs = impl
            for name in NAMES:
                fn, _sql = QUERIES[name]
                df = fn(spark, sf_dir)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                secs = time.perf_counter() - t0
                results.setdefault((name, variant), []).append(secs)
                spark.catalog.clearCache()
                spark.range(1).count()
    D._banded_self_pairs = orig

    print(f"\nreps={REPS} (interleaved)")
    for name in NAMES:
        row = []
        for variant in ("A_persist", "B_nopersist"):
            xs = results[(name, variant)]
            row.append(f"{variant}: min={min(xs):.3f} med={statistics.median(xs):.3f}")
        print(f"{name:24s} " + "   ".join(row))


if __name__ == "__main__":
    main()
