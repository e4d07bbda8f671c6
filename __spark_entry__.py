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
# the order is ranked by how badly each entry needs a driver row.  All
# CORRECTNESS_r*.json artifacts are globbed; each entry's evidence is the
# row from the highest round in which it appears:
#
#   0. latest evidence is a genuine failure (a fix needs a green row)
#   1. never driver-checked in any round, OR latest evidence is a
#      `no_oracle` row but the entry now carries an oracle (the oracle
#      was added/upgraded after that check — it has never been
#      hash-verified)
#   2. latest evidence predates the newest round (stale — the testdata
#      can change between rounds)
#   3. checked in the newest round and passed (safe to rotate out)
#
# Within a rank, oracle-backed entries go before rows-only ones (hash
# match is the strong signal), preserving catalog insertion order.
# --------------------------------------------------------------------------
_HERE = os.path.dirname(os.path.abspath(__file__))

# Entries whose query/oracle SEMANTICS changed after their latest driver
# row landed: evidence at or before the listed round predates the change
# and proves nothing about the current definition, so they rank with
# never-checked entries until a fresh row lands. Keep this tiny and
# prune entries once a newer round's artifact covers them.
_CHANGED_AFTER_ROUND: dict[str, int] = {
    # r14: the four r13-changed multimodal grammars (audio, pixels,
    # pixels_jpeg, frames) were pruned — CORRECTNESS_r13 carries green
    # hash-verified rows for all four, so the window's 50 slots go to
    # the oldest evidence again. r14's own changes are plan-shape-only
    # (result-identical, oracle-verified locally at 3 SFs), so nothing
    # new belongs here.
}


def _correctness_rounds() -> list[tuple[int, dict]]:
    """All (round_number, artifact) pairs on disk, ascending by round."""
    import glob
    import json
    import re

    rounds: list[tuple[int, dict]] = []
    for path in glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                rounds.append((int(m.group(1)), json.load(f)))
        except Exception:
            continue
    # key on the round number only: two artifacts parsing to the same
    # round (r3 vs r03) must not fall through to dict comparison
    return sorted(rounds, key=lambda t: t[0])


def _rotation_order() -> list[str]:
    rounds = _correctness_rounds()
    max_round = rounds[-1][0] if rounds else 0
    # Per-entry latest evidence: the row from the highest round naming it.
    latest_row: dict[str, tuple[int, dict]] = {}
    for rno, artifact in rounds:  # ascending — later rounds overwrite
        for name, row in artifact.items():
            latest_row[name] = (rno, row or {})

    def rank(name: str) -> int:
        if name not in latest_row:
            return 1  # never checked
        rno, row = latest_row[name]
        no_oracle = row.get("err") == "no_oracle"
        failed = (bool(row.get("err")) and not no_oracle) or any(
            row.get(k) is False
            for k in ("rows_match", "schema_match", "hash_match")
        )
        if failed:
            return 0
        if no_oracle and QUERIES[name][1] is not None:
            return 1  # oracle added after the last check — never hash-verified
        if rno <= _CHANGED_AFTER_ROUND.get(name, -1):
            return 1  # semantics changed since that row — never verified
        if rno < max_round:
            return 2
        return 3

    names = list(QUERIES)
    return sorted(
        names,
        key=lambda n: (
            rank(n),
            # within a rank: oldest evidence first (an r01-era rows-only
            # row is staler than an r07 oracle row — refresh it first),
            # then oracle-backed before rows-only as the tiebreak when
            # evidence age is equal (hash match is the stronger signal)
            latest_row.get(n, (-1, {}))[0],
            0 if QUERIES[n][1] is not None else 1,
            names.index(n),
        ),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: replay the sf0.001 events table as 5 series through
    the full reference pipeline — align (zero-fill) -> signal-scale ->
    stride anomaly injection -> wide slot rows (the queue-entry shape,
    main.py:667-709). The SAME builder is the ``flagship_pipeline``
    catalog entry, so the flagship is value-hash-verified against its
    composed DuckDB oracle at sf0.01 every time the rotation covers it."""
    from amazon_macie_activity_generator_spark.queries import flagship_pipeline

    return flagship_pipeline(spark, "/root/testdata/sf0.001").orderBy("t")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name][0] for name in _rotation_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: QUERIES[name][1]
        for name in _rotation_order()
        if QUERIES[name][1] is not None
    }
