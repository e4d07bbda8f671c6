"""X6 — event-time windowing: tumbling buckets and sessionization.

The reference's only temporal structure is the fixed 1-minute tick
(CloudFormationTemplate.yml:137); these operators generalize it to real
event-time analytics over the ``events`` table.

- ``tumbling_counts``: date_trunc bucket + agg. One shuffle, map-side
  combine; identical semantics to Structured Streaming's
  ``window(ts, '1 hour')`` (streaming/replay.py uses that form).
- ``sessionize``: gaps-and-islands — new session when the gap from the
  previous event exceeds ``gap``; session id = running sum of breaks.
  Window partitioned per user (bounded state); equivalent to
  ``session_window(ts, gap)`` but fully batch/SQL-expressible, so it
  oracle-checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame, bucket: str = "hour", by: list[str] | None = None
) -> DataFrame:
    by = by if by is not None else ["event_type"]
    return (
        events.groupBy(F.date_trunc(bucket, "ts").alias("bucket"), *by)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
) -> DataFrame:
    """Per-user sessions: (user_id, session_id, n_events, start_us, end_us).

    Timestamps surface as epoch-microsecond longs (cross-engine-stable;
    timestamp-to-string formatting differs between engines)."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gap_break = F.when(
        us - F.lag(us).over(w) > gap_us, F.lit(1)
    ).otherwise(F.lit(0))
    with_breaks = events.withColumn("__brk", F.coalesce(gap_break, F.lit(0)))
    session_id = F.sum("__brk").over(
        Window.partitionBy(user_col).orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = with_breaks.withColumn("session_id", session_id)
    return sess.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.unix_micros("ts")).alias("start_us"),
        F.max(F.unix_micros("ts")).alias("end_us"),
    )
