"""End-to-end blueprint pipeline: generate -> queue -> dispatch -> sinks.

The reference's full lifecycle (SURVEY.md §3): produce_timeseries
(main.py:667-709) fills the queue; each tick consumes one slot and
dispatches it to every target (dispatch_datapoints_to_targets,
main.py:738-755) — grouped (R2) or single-with-slicing (R3/T7) — then
executes the payload's datapoints on the target sink (EP3,
main.py:871-1057).

Spark shape: the fact table is the queue (one generation cycle = one
batch write); dispatch is a per-target transform of the SAME fact table
— series filter (T10) -> group/slice reshape -> payload rows (R4) ->
activity rows -> sink writes. The reference's lambda_self_invoke fan-out
(K7, main.py:1102-1115) dissolves into partition parallelism: every
payload/activity row is independent, so Spark schedules the width.

Batch mode processes all slots in one job; streaming/replay.py drives
the same dispatch functions one slot-batch at a time for cadence parity.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_macie_activity_generator_spark.config import Blueprint, TargetSpec
from amazon_macie_activity_generator_spark.operators.reshape import (
    payload_envelope,
    slot_row_json,
)
from amazon_macie_activity_generator_spark.operators.slicing import slice_explode
from amazon_macie_activity_generator_spark.plans.generate import generate
from amazon_macie_activity_generator_spark.sinks.local import (
    metrics_rows,
    s3_get_activity_rows,
    s3_put_activity_rows,
    write_objects_local,
    write_payload_lines,
    write_queue,
)


def select_target_series(fact: DataFrame, target: TargetSpec) -> DataFrame:
    """T10 — a target consumes only its configured generators
    (main.py:766, 795); isin filter -> partition-pruning-friendly."""
    gens = target.generators
    return fact if not gens else fact.filter(F.col("series_id").isin(gens))


def dispatch_group(fact: DataFrame, target: TargetSpec, ts_format: str = "yyyy-MM-dd'T'HH:mm:ss'Z'") -> DataFrame:
    """R2 path (group_datapoints=true targets, main.py:784-802): all of a
    slot's selected series in ONE payload. The slot timestamp rides along
    through the groupBy (first() of a per-slot-constant column — no join)."""
    sel = select_target_series(fact, target).withColumn(
        "tss", F.date_format("ts", ts_format)
    )
    dp = F.struct(F.col("series_id").alias("generator_id"), F.col("value").alias("value"))
    grouped = sel.groupBy("t").agg(
        F.first("tss").alias("tss"),
        F.sort_array(F.collect_list(dp)).alias("datapoints"),
    )
    return payload_envelope(grouped, target.config, timestamp=F.col("tss"))


def dispatch_single(fact: DataFrame, target: TargetSpec) -> DataFrame:
    """R3 path (main.py:757-782): per slot x series, slice the value (T7)
    and emit one single-datapoint payload per slice. slice_size defaults
    to the value itself = no slicing (main.py:777)."""
    sel = select_target_series(fact, target)
    s = target.slice_size
    sliced = slice_explode(
        sel, F.lit(s) if s is not None else F.col("value"), value_col="value"
    )
    one = sliced.select(
        "t",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("tss"),
        F.array(
            F.struct(
                F.col("series_id").alias("generator_id"),
                F.col("slice_value").alias("value"),
            )
        ).alias("datapoints"),
    )
    return payload_envelope(one, target.config, timestamp=F.col("tss"))


def dispatch(fact: DataFrame, target: TargetSpec) -> DataFrame:
    """Route by group_datapoints (main.py:752-755). Returns payload rows."""
    if target.config.get("group_datapoints"):
        return dispatch_group(fact, target)
    return dispatch_single(fact, target)


def execute_target(
    fact: DataFrame,
    target: TargetSpec,
    out_dir: str,
    idx: int,
) -> dict[str, Any]:
    """EP3 — execute a target's datapoints on its sink, local mode.

    s3/put -> fake-document files + object manifest parquet;
    s3/get -> touched-key manifest parquet;
    cloudwatch -> metrics parquet; lambda -> payload JSON-lines."""
    sel = select_target_series(fact, target)
    tdir = os.path.join(out_dir, f"target_{idx}_{target.type}")
    result: dict[str, Any] = {"type": target.type, "dir": tdir}
    if target.type == "cloudwatch":
        metrics_rows(sel, namespace=target.config.get("namespace", "amazon-macie-activity-generator")) \
            .write.mode("append").parquet(os.path.join(tdir, "metrics"))
        result["metrics"] = os.path.join(tdir, "metrics")
    elif target.type == "lambda":
        write_payload_lines(dispatch(fact, target), os.path.join(tdir, "payloads"))
        result["payloads"] = os.path.join(tdir, "payloads")
    elif target.type == "s3":
        action = target.config.get("action", "get")  # main.py:1047
        if action == "put":
            # persist: the fake-document projection (multi-KB content per
            # row, the heaviest expressions in the job) feeds TWO actions
            # — manifest write + object files — and must compute once
            rows = s3_put_activity_rows(sel, target.config).persist()
            try:
                rows.write.mode("append").parquet(os.path.join(tdir, "manifest"))
                write_objects_local(
                    rows, os.path.join(tdir, "objects")
                )
            finally:
                rows.unpersist()
            result["manifest"] = os.path.join(tdir, "manifest")
            result["objects"] = os.path.join(tdir, "objects")
        else:
            rows = s3_get_activity_rows(sel, real_keys=target.config.get("real_keys"))
            rows.write.mode("append").parquet(os.path.join(tdir, "manifest"))
            result["manifest"] = os.path.join(tdir, "manifest")
    return result


def run_cycles(
    spark: SparkSession,
    blueprint: Blueprint,
    out_dir: str,
    n_cycles: int = 2,
    anomaly_mode: str = "hash",
) -> list[dict[str, Any]]:
    """Cycle restart (main.py:1128-1133): when a cycle's queue drains the
    reference regenerates and refills. Batch shape: each cycle is one
    ``run_blueprint`` with a fresh run_id; the queue table accumulates
    cycles as partitions (run_id partition pruning gives per-cycle reads),
    and random generators draw fresh values because run_id participates
    in every hash draw."""
    return [
        run_blueprint(spark, blueprint, out_dir, anomaly_mode=anomaly_mode)
        for _ in range(n_cycles)
    ]


def run_blueprint(
    spark: SparkSession,
    blueprint: Blueprint,
    out_dir: str,
    run_id: str | None = None,
    anomaly_mode: str = "hash",
) -> dict[str, Any]:
    """One full cycle: generate the fact table, persist the queue table,
    execute every target. Returns output locations.

    The fact table is computed once and shared by the queue write and all
    targets (the reference regenerates per cycle too, main.py:1128-1133)."""
    import uuid as _uuid

    run_id = run_id or _uuid.uuid4().hex
    fact = generate(spark, blueprint, run_id=run_id, anomaly_mode=anomaly_mode).persist()
    try:
        queue_path = os.path.join(out_dir, "queue")
        write_queue(
            slot_row_json(fact).withColumn("run_id", F.lit(run_id)), queue_path
        )
        targets = [
            execute_target(fact, t, out_dir, i) for i, t in enumerate(blueprint.targets)
        ]
        return {"run_id": run_id, "queue": queue_path, "targets": targets,
                "n_rows": fact.count()}
    finally:
        fact.unpersist()
