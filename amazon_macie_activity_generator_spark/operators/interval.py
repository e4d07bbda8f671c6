"""Interval (range-containment) join via time bucketing.

Joining points to the intervals that contain them is a range predicate —
Spark's only native plan for ``ts BETWEEN start AND end`` with no equality
key is BroadcastNestedLoopJoin, which is quadratic and only survives while
one side fits in memory. The scale path: discretize time into fixed-width
buckets, explode each interval into every bucket it overlaps, and
equi-join points on the bucket id (plus any group key), then apply the
exact range filter. The nested loop becomes a keyed shuffle; bucket width
trades interval fan-out against bucket row-skew. (Same construction as
spatial grid joins; cf. Spark's range-join hints in Databricks runtime —
absent in OSS.)

A point lives in exactly one bucket, so a (point, interval) pair can only
meet in that bucket: no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US_PER_MIN = 60 * 1_000_000


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    by: list[str] | None = None,
    bucket_minutes: int = 60,
) -> DataFrame:
    """Inner-join each point row to every interval row containing it
    (``start <= ts <= end``, plus equality on ``by`` if given). Interval
    columns are carried through; both inputs' other columns survive.
    """
    by = by or []
    width = bucket_minutes * _US_PER_MIN
    p_bucket = F.floor(F.unix_micros(F.col(ts_col)) / width)
    iv_buckets = F.sequence(
        F.floor(F.unix_micros(F.col(start_col)) / width),
        F.floor(F.unix_micros(F.col(end_col)) / width),
    )
    p = points.withColumn("__bucket", p_bucket)
    iv = intervals.withColumn("__bucket", F.explode(iv_buckets))
    joined = p.join(iv, on=[*by, "__bucket"], how="inner").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.drop("__bucket")
