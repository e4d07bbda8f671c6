"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` — operator catalog; see
``amazon_macie_activity_generator_spark/queries.py`` for the implementations and the
DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amazon_macie_activity_generator_spark.queries import QUERIES  # noqa: E402

# --------------------------------------------------------------------------
# Driver-verification rotation.
#
# The correctness harness checks the first ~50 entries of queries() in
# insertion order each round; the catalog is larger than the window, so
# the order is ranked by how badly each entry needs a driver row:
#
#   0. failed in the latest round's artifact (a fix needs a green row)
#   1. never driver-checked in any round (includes newly added entries)
#   2. checked only in rounds before the latest (stale evidence — the
#      testdata changed between r2 and r3)
#   3. passed in the latest round (freshest evidence, safe to rotate out)
#
# Within a rank, oracle-backed entries go before rows-only ones (hash
# match is the strong signal), preserving catalog insertion order.
# --------------------------------------------------------------------------
_HERE = os.path.dirname(os.path.abspath(__file__))


def _load_correctness(fname: str) -> dict:
    try:
        import json

        with open(os.path.join(_HERE, fname)) as f:
            return json.load(f)
    except Exception:
        return {}


def _rotation_order() -> list[str]:
    latest = _load_correctness("CORRECTNESS_r02.json")
    earlier: set[str] = set(_load_correctness("CORRECTNESS_r01.json"))

    def rank(name: str) -> tuple[int, int]:
        if name in latest:
            row = latest[name] or {}
            failed = bool(row.get("err")) or any(
                row.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match")
            )
            r = 0 if failed else 3
        elif name in earlier:
            r = 2
        else:
            r = 1
        return (r, 0 if QUERIES[name][1] is not None else 1)

    names = list(QUERIES)
    return sorted(names, key=lambda n: (rank(n), names.index(n)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: replay the sf0.001 events table as 5 series through
    the full reference pipeline — align (zero-fill) -> signal-scale ->
    stride anomaly injection -> wide slot rows (the queue-entry shape,
    main.py:667-709)."""
    from pyspark.sql import functions as F

    from amazon_macie_activity_generator_spark.operators.align import zero_fill
    from amazon_macie_activity_generator_spark.operators.anomalies import apply_anomalies
    from amazon_macie_activity_generator_spark.operators.reshape import pivot_slot_rows
    from amazon_macie_activity_generator_spark.operators.scaling import scale_minmax
    from amazon_macie_activity_generator_spark.queries import EVENT_TYPES
    from amazon_macie_activity_generator_spark.sources.real_series import events_as_series
    from amazon_macie_activity_generator_spark.sources.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    series = events_as_series(events).select("series_id", "t", "value")
    aligned = zero_fill(spark, series)
    scaled = scale_minmax(aligned, value_col="value", lo=1, hi=20, by=["series_id"])
    with_anomalies = apply_anomalies(
        scaled.withColumn("value", F.col("value").cast("double")),
        [{"start": 10, "end": 100, "counts": 5}],
        n_points=101,
        mode="stride",
    )
    final = with_anomalies.withColumn("value", F.col("value").cast("long"))
    return pivot_slot_rows(final, series_ids=EVENT_TYPES, agg="max").orderBy("t")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name][0] for name in _rotation_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: QUERIES[name][1]
        for name in _rotation_order()
        if QUERIES[name][1] is not None
    }
