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

from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState


def tumbling_counts(
    events: DataFrame, bucket: str = "hour", by: list[str] | None = None
) -> DataFrame:
    by = by if by is not None else ["event_type"]
    # an event without a timestamp has no bucket (rule shared by every
    # time-ordered operator; oracles mirror WHERE ts IS NOT NULL)
    events = events.filter(F.col("ts").isNotNull())
    return (
        events.groupBy(F.date_trunc(bucket, "ts").alias("bucket"), *by)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def sliding_counts(
    events: DataFrame,
    window_hours: int = 2,
    slide_hours: int = 1,
    by: list[str] | None = None,
) -> DataFrame:
    """Overlapping (sliding/hopping) event-time windows: each event lands
    in window_hours/slide_hours consecutive windows. Uses Spark's native
    ``F.window(ts, window, slide)`` — the built-in expands the per-event
    window list and explodes JVM-side; the only shuffle is the aggregation
    (fan-out factor = window/slide, so a 2h/1h hop doubles rows pre-agg —
    map-side combine absorbs it)."""
    by = by if by is not None else ["event_type"]
    events = events.filter(F.col("ts").isNotNull())  # no time, no window
    w = F.window("ts", f"{window_hours} hours", f"{slide_hours} hours")
    return (
        events.groupBy(w.alias("win"), *by)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").cast("string").alias("win_start"),
            *by, "n_events", "sum_value",
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
    events = events.filter(F.col("ts").isNotNull())  # no time, no timeline
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


SESSION_STATE_SCHEMA = "last_us long, session_id long, n_events long, start_us long"
SESSION_OUT_SCHEMA = (
    "user_id long, session_id long, n_events long, start_us long, end_us long"
)


def sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState`` —
    the escape hatch for session semantics ``session_window`` can't
    express (per-user counters, custom close conditions). State per user:
    (last event time, running session counter, open-session aggregates);
    each micro-batch closes sessions whose gap exceeded ``gap_minutes``
    and emits them, keeping the open session in state.

    Batch-mode equivalence: driven over a static DataFrame (or
    availableNow with all data in one batch), emitted closed sessions +
    the final open session per user match ``sessionize`` exactly — the
    test asserts that.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: "GroupState",
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            last_us, session_id, n_events, start_us = state.get
        else:
            last_us, session_id, n_events, start_us = None, 0, 0, None
        out: list[tuple] = []
        # a group arrives as MULTIPLE Arrow chunks in arbitrary order
        # (maxRecordsPerBatch default 10k); sorting per chunk would walk
        # a >10k-event user out of event-time order, merging sessions
        # that should split and moving last_us backwards. Drain all
        # chunks, sort once — memory is one user's batch, the same bound
        # the session walk itself needs.
        all_us = sorted(int(v) for pdf in pdfs for v in pdf["us"])
        for us in all_us:
            if last_us is not None and us - last_us > gap_us:
                out.append((user, session_id, n_events, start_us, last_us))
                session_id += 1
                n_events, start_us = 0, us
            if start_us is None:
                start_us = us
            n_events += 1
            last_us = us
        state.update((last_us, session_id, n_events, start_us))
        yield pd.DataFrame(
            out, columns=["user_id", "session_id", "n_events", "start_us", "end_us"]
        )

    # NULL event time would reach the state decoder as a None key slot
    # and kill the stream (observed: EXPRESSION_DECODING_FAILED) — the
    # shared no-time-no-timeline rule drops it before grouping
    prepared = events.filter(F.col("ts").isNotNull()).select(
        F.col(user_col).cast("long").alias("user_id"),
        F.unix_micros("ts").alias("us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
