"""Skew-handling toolbox: salted joins and salted aggregation.

AQE's skew-join splitting (on in `session.py`) handles most sort-merge
skew at runtime; salting is the explicit tool for the cases AQE can't
touch — skewed GROUPed aggregations and broadcast-ineligible joins with a
handful of hot keys (the 'boilerplate document' / 'bot user' shape of
training-data pipelines).

- ``salted_join``: replicate the small side ``salt`` times; spread the
  big side's hot keys across ``salt`` partitions via a deterministic
  hash-derived salt column. Exactly equivalent rows to the plain join.
- ``salted_agg``: two-stage aggregation — partial agg on (key, salt),
  final agg on key. For algebraic aggregates (sum/count/min/max) the
  result is identical; the first stage caps any single reducer's input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(cols: list[str], salt: int) -> Column:
    # hash-derived, partition-stable (same RNG discipline as functions/rng.py)
    return F.pmod(F.xxhash64(*cols, F.lit("salt")), F.lit(salt)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's key distribution flattened: big rows
    get ``salt_id = hash(row) % salt``; the small side is exploded into
    ``salt`` copies so every (key, salt_id) bucket finds its match. Row
    set identical to ``big.join(small, on, how)`` — PROVIDED every small
    row can match at most via its own salt copy, which holds only for
    joins that preserve the big side: with ``right``/``full``/``semi``/
    ``anti`` an unmatched small key would surface all ``salt`` copies
    (or none), so those hows are rejected."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "the exploded small side emits one row per salt copy for "
            "small-side-preserving join types"
        )
    big_salted = big.withColumn(
        "__salt", _salt_col([c for c in big.columns], salt)
    )
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    out = big_salted.join(small_salted, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    key: str,
    value_col: str,
    salt: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation: sum/count per (key, salt) then
    per key. Identical result to ``groupBy(key).agg(sum, count)``; the
    hot key's rows split across ``salt`` reducers in stage one."""
    stage1 = (
        df.withColumn("__salt", _salt_col([key, value_col], salt))
        .groupBy(key, "__salt")
        .agg(
            F.sum(value_col).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    return stage1.groupBy(key).agg(
        F.sum("__s").alias(f"sum_{value_col}"),
        F.sum("__n").alias("n_rows"),
    )
