"""Per-job timeline for one catalog query (guide §1): run <name> through
the noop sink and print every job's duration, gaps between jobs, and the
first stage's name — shows whether wall time is compute or sequential
job-scheduling/broadcast-build latency.

Usage: python scripts/job_profile.py <query_name>
"""
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from amazon_macie_activity_generator_spark.session import get_spark
    from amazon_macie_activity_generator_spark.queries import QUERIES

    spark = get_spark("job-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    import pandas as pd
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _w(s: pd.Series) -> pd.Series:
        return s

    spark.range(64 * 1000).repartition(64).select(_w(col("id")).alias("w")) \
        .write.format("noop").mode("overwrite").save()

    fn, _sql = QUERIES[name]
    sc.setJobGroup(name, name)
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    build = time.perf_counter() - t0
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    secs = time.perf_counter() - t0
    sc.setJobGroup("other", "other")

    store = sc._jsc.sc().statusStore()
    empty = sc._jvm.java.util.ArrayList()
    jit = store.jobsList(empty).iterator()
    jobs = []
    while jit.hasNext():
        j = jit.next()
        grp = j.jobGroup()
        if grp.isDefined() and grp.get() == name:
            sub = j.submissionTime().get().getTime()
            comp = j.completionTime().get().getTime() if j.completionTime().isDefined() else sub
            jobs.append((sub, comp, j.jobId(), j.numTasks(), str(j.name())[:90]))
    jobs.sort()
    print(f"{name}: build={build:.2f}s exec={secs:.2f}s  {len(jobs)} jobs")
    prev_end = None
    for sub, comp, jid, ntasks, jname in jobs:
        gap = (sub - prev_end) / 1000 if prev_end is not None else 0.0
        print(f"  job {jid:4d} dur={(comp-sub)/1000:7.3f}s gap={gap:7.3f}s tasks={ntasks:4d}  {jname}")
        prev_end = comp


if __name__ == "__main__":
    main()
