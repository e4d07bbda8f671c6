"""VERDICT r7 ask #5 — at-most-once failure injection for the replay path.

The one streaming claim previously tested only by construction: a
``foreachBatch`` delivery that CRASHES after its write but before the
checkpoint commits (streaming/replay.py:103-115 documents exactly this
window) must, on restart from the same checkpoint, replay idempotently —
the delivered table ends with no duplicate (run_id, t), committed
batches are never re-executed, and only the failed batch is re-delivered.
This is the observable contract of the reference's delete-before-process
at-most-once semantics (/root/reference/src/main.py:726-731) without its
data-loss-on-crash defect."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_macie_activity_generator_spark.streaming.replay import (
    queue_stream,
    replay,
)


def _enqueue(spark, qpath: str, ts) -> None:
    # one file per write -> one micro-batch per slot at maxFilesPerTrigger=1
    for t in ts:
        (
            spark.createDataFrame(
                [("failrun", t, float(t))], "run_id string, t long, value double"
            )
            .coalesce(1).write.mode("append").parquet(qpath)
        )


def test_mid_batch_crash_replays_idempotently(spark, tmp_path):
    qpath, out, ck = (str(tmp_path / p) for p in ("queue", "delivered", "ckpt"))
    _enqueue(spark, qpath, range(6))
    schema = spark.read.parquet(qpath).schema

    attempts: list[tuple[int, tuple[int, ...]]] = []  # (batch_id, ts delivered)
    crash = {"armed": True}

    def _deliver(batch, batch_id):
        rows = tuple(sorted(r.t for r in batch.select("t").collect()))
        attempts.append((batch_id, rows))
        # the delivery WRITE lands (same recipe as replay_to_table)...
        (
            batch.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("run_id", "batch_id")
            .parquet(out)
        )
        # ...then the driver dies before Spark commits the batch: the
        # write-landed/commit-lost window the docstring promises is safe
        if crash["armed"] and len({b for b, _ in attempts}) == 3:
            crash["armed"] = False
            raise RuntimeError("injected mid-batch crash after delivery write")

    q1 = replay(queue_stream(spark, qpath, schema), _deliver, ck, available_now=True)
    with pytest.raises(Exception, match="injected mid-batch crash"):
        q1.awaitTermination(120)

    # the crashed batch's output is already on disk — the dangerous state
    delivered_mid = spark.read.parquet(out)
    assert delivered_mid.count() >= 3

    # restart from the SAME checkpoint: Spark replays the uncommitted
    # batch (at-least-once) and the idempotent overwrite absorbs it
    q2 = replay(queue_stream(spark, qpath, schema), _deliver, ck, available_now=True)
    assert q2.awaitTermination(120)

    delivered = spark.read.parquet(out)
    assert delivered.count() == 6
    assert delivered.select("run_id", "t").distinct().count() == 6  # no dup key
    assert delivered.agg(F.sum("value")).first()[0] == sum(range(6))

    by_batch = {}
    for b, rows in attempts:
        by_batch.setdefault(b, []).append(rows)
    crashed = [b for b, r in by_batch.items() if len(r) == 2]
    # exactly one batch was delivered twice — the crashed one, replayed
    # with the SAME rows (same batch => same dynamic partition overwritten)
    assert len(crashed) == 1
    assert by_batch[crashed[0]][0] == by_batch[crashed[0]][1]
    # committed batches were NEVER re-executed after the restart
    assert all(len(r) == 1 for b, r in by_batch.items() if b != crashed[0])


def test_crash_before_any_write_loses_nothing(spark, tmp_path):
    """Crash at the TOP of the delivery (before the write): restart must
    deliver every slot exactly once — nothing dropped, nothing doubled."""
    qpath, out, ck = (str(tmp_path / p) for p in ("queue", "delivered", "ckpt"))
    _enqueue(spark, qpath, range(4))
    schema = spark.read.parquet(qpath).schema
    crash = {"armed": True}

    def _deliver(batch, batch_id):
        if crash["armed"]:
            crash["armed"] = False
            raise RuntimeError("injected crash before delivery write")
        (
            batch.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("run_id", "batch_id")
            .parquet(out)
        )

    q1 = replay(queue_stream(spark, qpath, schema), _deliver, ck, available_now=True)
    with pytest.raises(Exception, match="injected crash"):
        q1.awaitTermination(120)

    q2 = replay(queue_stream(spark, qpath, schema), _deliver, ck, available_now=True)
    assert q2.awaitTermination(120)
    delivered = spark.read.parquet(out)
    assert delivered.count() == 4
    assert delivered.select("run_id", "t").distinct().count() == 4
