"""Streaming replay at scale (round 9, VERDICT r8 ask #7).

The replay path (`streaming/replay.py`) has correctness evidence
(batch-equivalence, at-most-once crash injection) but had no scale
measurement. This drives the K1 -> K2 round-trip over a queue built from
the sf0.1 EVENTS table (100k slot rows, written twice so the
watermarked dedup state absorbs a full duplicate pass -> 200k queued
rows), drained with availableNow across multiple micro-batches, and
reports rows/s plus the checkpoint/state overhead vs the equivalent
one-shot batch job. The correctness gate: the delivered table contains
EXACTLY the distinct (run_id, t) set — no duplicate survives, nothing
is lost.

Round 10 adds the ``maxFilesPerTrigger`` amortization sweep (VERDICT r9
ask #5): the same queue is drained at several trigger sizes, showing the
per-micro-batch checkpoint/state commit amortizing across more rows —
the knob a bulk drain (downtime catch-up, backfill) turns while the
production default stays 1 for slot-per-tick pacing.

Run: ``python scripts/streaming_scale.py [--sf-dir /root/testdata/sf0.1]
[--runs 4] [--shuffle-parts 8] [--mft 1,4,16]``
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=4,
                    help="distinct run_ids (queue partitions)")
    ap.add_argument("--shuffle-parts", type=int, default=8,
                    help="shuffle partitions during the queue write — "
                    "bounds queue file count, hence micro-batch count")
    ap.add_argument("--mft", default="1,4,16",
                    help="comma-separated maxFilesPerTrigger values to "
                    "sweep (1 = the production slot-per-tick default)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", str(args.shuffle_parts))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from amazon_macie_activity_generator_spark.sinks.local import write_queue
    from amazon_macie_activity_generator_spark.sources.tables import load_table
    from amazon_macie_activity_generator_spark.streaming.replay import replay_to_table

    work = tempfile.mkdtemp(prefix="amag_stream_scale_")
    qpath = os.path.join(work, "queue")

    ev = load_table(spark, args.sf_dir, "events")
    slot_rows = ev.select(
        F.concat(F.lit("run"), (F.col("user_id") % args.runs).cast("string")).alias("run_id"),
        F.col("event_id").alias("t"),
        F.to_json(F.struct("ts", "event_type", "value")).alias("body"),
    ).filter(F.col("t").isNotNull())

    # enqueue TWICE: the second pass is a full duplicate delivery the
    # watermarked dedup state must absorb (the SQS redelivery shape)
    write_queue(slot_rows, qpath)
    write_queue(slot_rows, qpath)
    queued = spark.read.parquet(qpath)
    n_queued = queued.count()
    n_files = sum(
        len([f for f in files if f.endswith(".parquet")])
        for _, _, files in os.walk(qpath)
    )
    n_distinct = slot_rows.select("run_id", "t").distinct().count()

    schema = queued.schema

    # batch equivalent: same dedup + partitioned write, one shot — the
    # difference is the per-micro-batch checkpoint/state-store overhead.
    # Run it twice and keep the WARM timing: the first execution pays
    # JVM/codegen warm-up that the later streaming drains don't, which
    # would overstate batch_wall and could even drive the derived
    # overhead/ms-per-batch columns negative for fast high-mft drains.
    batch_wall = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        (
            queued.dropDuplicates(["run_id", "t"])
            .write.mode("overwrite").partitionBy("run_id")
            .parquet(os.path.join(work, "batch_equiv"))
        )
        batch_wall = min(batch_wall, time.perf_counter() - t0)

    for mft in (int(v) for v in args.mft.split(",")):
        delivered_path = os.path.join(work, f"delivered_{mft}")
        ckpt = os.path.join(work, f"ckpt_{mft}")
        t0 = time.perf_counter()
        sq = replay_to_table(
            spark, qpath, schema, delivered_path, ckpt,
            available_now=True, max_files_per_trigger=mft,
        )
        if not sq.awaitTermination(1800):
            sq.stop()
            raise SystemExit("stream did not drain within 1800 s — timeout, "
                             "not a dedup failure; rerun on an idle box")
        stream_wall = time.perf_counter() - t0
        n_batches = sq.lastProgress["batchId"] + 1 if sq.lastProgress else None

        delivered = spark.read.parquet(delivered_path)
        n_delivered = delivered.count()
        n_delivered_distinct = delivered.select("run_id", "t").distinct().count()

        result = {
            "max_files_per_trigger": mft,
            "queued_rows": n_queued,
            "queue_files": n_files,
            "distinct_slots": n_distinct,
            "delivered_rows": n_delivered,
            "delivered_distinct": n_delivered_distinct,
            "duplicates_survived": n_delivered - n_delivered_distinct,
            "lost": n_distinct - n_delivered_distinct,
            "micro_batches": n_batches,
            "stream_wall_s": round(stream_wall, 1),
            "rows_per_s": round(n_queued / stream_wall),
            "batch_equiv_wall_s": round(batch_wall, 1),
            "checkpoint_overhead_x": round(stream_wall / batch_wall, 1),
            "ms_per_batch": (round(1000 * (stream_wall - batch_wall) / n_batches)
                             if n_batches else None),
        }
        print(json.dumps(result), flush=True)
        assert n_delivered == n_delivered_distinct == n_distinct, result
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
