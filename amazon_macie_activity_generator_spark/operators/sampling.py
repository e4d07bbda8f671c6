"""Deterministic sampling / dataset splitting for training pipelines.

A training pipeline needs splits that are STABLE: the same document must
land in the same split on every run, every engine, every cluster size —
otherwise held-out data leaks into training across reruns. Spark's
``df.sample``/``TABLESAMPLE`` are seed+partitioning dependent, so we
derive split membership from a content hash instead (same discipline as
the engine's RNG rules, SURVEY.md §4.2).

Cross-engine design: the bucket is the first 6 hex chars of
``md5(salt || key)`` compared lexicographically against a hex threshold —
lowercase-hex string order equals numeric order, and md5 is byte-identical
everywhere, so the split oracle-checks in DuckDB with the same two
expressions. No engine-local hash, no float rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 1 << 24  # first 6 hex chars


def split_threshold_hex(fraction: float) -> str:
    """Hex threshold t such that P(md5_prefix < t) == round(fraction * 2^24) / 2^24.

    fraction == 1.0 (or within 2^-25 of it) must keep EVERY row: the
    naive format(2^24, '06x') is the 7-char '1000000', which sorts
    BELOW 'ffffff' lexicographically and would keep only buckets
    starting '0'. The sentinel 'g' sorts above every [0-9a-f] bucket,
    so `bucket < 'g'` is always true — in Spark and DuckDB alike."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    n = int(round(fraction * _HEX_SPACE))
    if n >= _HEX_SPACE:
        return "g"
    return format(n, "06x")


def hash_bucket_hex(key: Column, salt: str = "split") -> Column:
    """First 6 hex chars of md5(salt || ':' || key) — the split bucket."""
    return F.substring(F.md5(F.concat(F.lit(salt), F.lit(":"), key.cast("string"))), 1, 6)


def hash_split(
    df: DataFrame,
    key_col: str,
    train_fraction: float = 0.9,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Tag every row 'train' or 'holdout' by hashed key. Pure map-side
    projection — zero shuffles, stable under repartition/retry/engine."""
    thr = split_threshold_hex(train_fraction)
    bucket = hash_bucket_hex(F.col(key_col), salt)
    return df.withColumn(
        out_col, F.when(bucket < F.lit(thr), F.lit("train")).otherwise(F.lit("holdout"))
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic downsampling — rebalance a skewed corpus
    (cap dominant languages/sources) in one map-only filter: keep a row
    iff its md5 bucket clears the stratum's threshold. Strata absent from
    ``fractions`` keep everything. Zero shuffles; membership is stable
    across engines/partitioning like hash_split."""
    thr = None
    for stratum, frac in sorted(fractions.items()):
        hexthr = F.lit(split_threshold_hex(frac))
        thr = (
            F.when(F.col(stratum_col) == stratum, hexthr) if thr is None
            else thr.when(F.col(stratum_col) == stratum, hexthr)
        )
    # 'g' sentinel, not 'ffffff': `bucket < 'ffffff'` would silently drop
    # the 1-in-16M rows whose bucket IS 'ffffff' from keep-all strata
    thr = thr.otherwise(F.lit("g")) if thr is not None else F.lit("g")
    return df.filter(hash_bucket_hex(F.col(key_col), salt) < thr)
