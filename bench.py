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

import pandas as pd

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

    # also warm the Python worker pool: the first pandas-UDF task on each
    # core pays worker spawn + pandas/numpy import (~8 s across 32 cores,
    # measured), which otherwise lands on whichever Arrow-path query runs
    # first (dedup_simhash in catalog order). Workers are reused
    # (spark.python.worker.reuse defaults true), so one warm pass moves
    # that session-infra cost out of every query timing.
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm_worker(s: pd.Series) -> pd.Series:
        return s

    (
        spark.range(64 * 1000)
        .repartition(64)
        .select(_warm_worker(col("id")).alias("w"))
        .write.format("noop").mode("overwrite").save()
    )

    # Two timers per entry. `queries` (the headline metric, comparable
    # across rounds) times materialization of the returned plan; `build`
    # times the builder call itself.  For most entries build is plan
    # construction (~ms), but a few are legitimately eager there and the
    # split keeps that work visible instead of letting it escape timing:
    # streaming replays execute the stream at build (Structured Streaming
    # cannot hand back an unexecuted batch result), connected-components
    # entries run a convergence loop with per-round early-stop counts,
    # and the IVF/auto-planes paths collect KB-sized model state to embed
    # as plan literals.
    # min over REPS independent full passes (default 3; 2 through r13):
    # single-pass timings on a shared box carry ~±15% contention noise
    # (the round-5 +17.5% "regression" was box noise), and min-of-N is
    # the standard de-noise for wall-clock. r14 raised the default 2->3
    # on the r13 verdict's recommendation: the ±20% same-code band at
    # reps=2 produced four phantom regressions in PERF_r13. Same
    # methodology (min over independent cold passes), one more sample.
    # Each pass rebuilds the plan and re-clears the cache, so no pass
    # ever rides a previous pass's persisted intermediates — the min is
    # over like-for-like cold executions.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    builds: dict[str, float] = {}
    for _rep in range(reps):
        for name, (fn, _sql) in QUERIES.items():
            start = time.perf_counter()
            df = fn(spark, sf_dir)
            build = round(time.perf_counter() - start, 4)
            builds[name] = min(builds.get(name, build), build)
            start = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            secs = round(time.perf_counter() - start, 4)
            timings[name] = min(timings.get(name, secs), secs)
            spark.catalog.clearCache()  # drop per-query persists; keep memory flat
            # absorb the (async) cache-eviction work OUTSIDE any timer, so
            # it is not attributed to whichever query happens to run next
            spark.range(1).count()
        # memory-sink tables registered by streaming builders (uuid names)
        # survive clearCache and hold a full result copy in driver memory;
        # drop them between passes so reps never accumulate copies
        for tbl in spark.catalog.listTables():
            if tbl.isTemporary:
                try:
                    spark.catalog.dropTempView(tbl.name)
                except Exception:
                    pass

    total = round(sum(timings.values()), 4)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # The driver captures only the tail of stdout (~1.6 KB in round 1,
    # which truncated the head of a full 105-query JSON line and left
    # BENCH_r01.json unparseable). Write the complete per-query detail
    # to a sidecar the driver commits with the round, and keep the
    # printed line itself under a conservative budget by including the
    # slowest queries first until the budget is spent.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump({
            "metric": "total_query_wall_clock",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "build_secs": builds,
            "build_total": round(sum(builds.values()), 4),
            "n_queries": len(timings),
            "reps": reps,
            "sf": sf_val,
        }, fh, sort_keys=True)
        fh.write("\n")
    # ledger-of-record consistency (SURVEY §8): the printed line (what the
    # driver records as BENCH_r{N}.json) and the sidecar are the same run —
    # assert the totals agree at write time so they can only diverge if a
    # later local run overwrites the sidecar
    with open(detail_path) as fh:
        assert json.load(fh)["value"] == total, "BENCH_DETAIL.json write mismatch"

    line_budget = int(os.environ.get("SPARK_GRAFT_BENCH_LINE_BUDGET", "1400"))
    base = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": {},
        "n_queries": len(timings),
        "build_total": round(sum(builds.values()), 4),
        "reps": reps,
        "detail": "BENCH_DETAIL.json",
        # how many of n_queries made the printed line (slowest-first under
        # the byte budget) — sized at the worst case during the budget
        # loop, overwritten with the real count before printing
        "top_n": len(timings),
        "sf": sf_val,
    }
    for name, secs in sorted(timings.items(), key=lambda kv: -kv[1]):
        candidate = dict(base["queries"], **{name: secs})
        if len(json.dumps(dict(base, queries=candidate), separators=(",", ":"))) > line_budget:
            break
        base["queries"] = candidate
    base["top_n"] = len(base["queries"])
    print(json.dumps(base, separators=(",", ":")))


if __name__ == "__main__":
    main()
