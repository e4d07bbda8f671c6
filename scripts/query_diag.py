"""Per-query diagnostics for the optimization rounds (guide §1).

For each catalog entry (default: all, or names on argv): build the plan,
materialize through the noop sink (bench methodology), and report wall
seconds plus job/stage/task counts and shuffle bytes from the JVM
AppStatusStore, attributing work via a per-query job group. Also dumps
``explain('formatted')`` to ``plans/r14/<name>_<suffix>.txt`` when
``--plans <suffix>`` is given.

Usage:
    python scripts/query_diag.py [--plans before] [name ...]
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    args = sys.argv[1:]
    plan_suffix = None
    if "--plans" in args:
        i = args.index("--plans")
        plan_suffix = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = args

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from amazon_macie_activity_generator_spark.session import get_spark
    from amazon_macie_activity_generator_spark.queries import QUERIES

    spark = get_spark("query-diag")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warm JVM + python workers (bench.py's warmup, abbreviated)
    spark.range(1_000_000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()
    import pandas as pd
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _w(s: pd.Series) -> pd.Series:
        return s

    spark.range(64 * 1000).repartition(64).select(_w(col("id")).alias("w")) \
        .write.format("noop").mode("overwrite").save()

    store = sc._jsc.sc().statusStore()
    plans_dir = os.path.join(HERE, "plans", "r14")
    if plan_suffix:
        os.makedirs(plans_dir, exist_ok=True)

    todo = {n: QUERIES[n] for n in (names or QUERIES)}
    rows = []
    for name, (fn, _sql) in todo.items():
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        build = time.perf_counter() - t0
        if plan_suffix:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir, f"{name}_{plan_suffix}.txt"), "w") as fh:
                fh.write(plan)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        secs = time.perf_counter() - t0
        sc.setJobGroup("other", "other")
        spark.catalog.clearCache()
        spark.range(1).count()

        njobs = nstages = ntasks = 0
        sread = swrite = 0
        empty_j = sc._jvm.java.util.ArrayList()
        empty_s = sc._jvm.java.util.ArrayList()
        jit = store.jobsList(empty_j).iterator()
        stage_ids = set()
        while jit.hasNext():
            j = jit.next()
            grp = j.jobGroup()
            if grp.isDefined() and grp.get() == name:
                njobs += 1
                ntasks += j.numTasks()
                sit = j.stageIds().iterator()
                while sit.hasNext():
                    stage_ids.add(sit.next())
        nstages = len(stage_ids)
        # Spark 4.1 signature: stageList(statuses, details, withSummaries,
        # unsortedQuantiles, taskStatus)
        stit = store.stageList(
            empty_s, False, False,
            sc._gateway.new_array(sc._jvm.double, 0),
            sc._jvm.java.util.ArrayList(),
        ).iterator()
        while stit.hasNext():
            s = stit.next()
            if s.stageId() in stage_ids:
                sread += s.shuffleReadBytes()
                swrite += s.shuffleWriteBytes()
        rows.append(dict(name=name, secs=round(secs, 3), build=round(build, 3),
                         jobs=njobs, stages=nstages, tasks=ntasks,
                         shuffle_read_mb=round(sread / 1e6, 2),
                         shuffle_write_mb=round(swrite / 1e6, 2)))
        print(json.dumps(rows[-1]), flush=True)

    print("\n=== sorted by secs ===")
    for r in sorted(rows, key=lambda r: -r["secs"]):
        print(f"{r['secs']:8.2f}s build={r['build']:6.2f}s jobs={r['jobs']:3d} "
              f"stages={r['stages']:3d} tasks={r['tasks']:5d} "
              f"shW={r['shuffle_write_mb']:8.2f}MB  {r['name']}")


if __name__ == "__main__":
    main()
