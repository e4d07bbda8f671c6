"""T3 — bounded noise addition (main.py:588-604, scale_noise :359-371).

Reference: draw N(0,1) per point, min-max rescale the *noise vector*
into [noise_min, noise_max], add, clamp at 0. Note the noise is therefore
bounded (a rescaled normal), not raw gaussian.

Bug B5 fixed (SURVEY.md §2.2): the reference gates on truthiness
(``if (noise_min and noise_max)``) so ``noise_min=0, noise_max=5``
silently disables noise. Documented intent (README.md:43): noise is
active when a nonzero range is configured -> we gate on
``(noise_min, noise_max) != (0, 0)``.

Scale design: noise draws come from the hash-counter RNG (pure column
expression); the rescale reuses the two-pass agg + broadcast-join of
``scaling.scale_minmax`` — no unpartitioned window, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amazon_macie_activity_generator_spark.operators.scaling import scale_minmax
from amazon_macie_activity_generator_spark.functions.rng import hash_gauss

DEFAULT_NOISE_MIN = 0  # main.py:66
DEFAULT_NOISE_MAX = 0  # main.py:67


def noise_enabled(cfg: dict) -> bool:
    lo = float(cfg.get("noise_min", DEFAULT_NOISE_MIN))
    hi = float(cfg.get("noise_max", DEFAULT_NOISE_MAX))
    return (lo, hi) != (0.0, 0.0)


def apply_noise(
    df: DataFrame,
    cfg: dict,
    value_col: str = "value",
    by: list[str] | None = None,
    identity: tuple[str, ...] = ("run_id", "series_id", "t"),
    salt: str = "noise",
) -> DataFrame:
    """Add bounded noise to ``value_col``; clamp result at 0.

    ``identity`` names the columns whose values seed each row's draw.
    """
    if not noise_enabled(cfg):
        return df
    lo = float(cfg.get("noise_min", DEFAULT_NOISE_MIN))
    hi = float(cfg.get("noise_max", DEFAULT_NOISE_MAX))
    by = by if by is not None else ["series_id"]

    noised = df.withColumn("__noise_raw", hash_gauss(*identity, salt=salt))
    noised = scale_minmax(noised, value_col="__noise_raw", lo=lo, hi=hi, by=by, out_col="__noise")
    return (
        noised.withColumn(value_col, F.greatest(F.lit(0.0), F.col(value_col) + F.col("__noise")))
        .drop("__noise_raw", "__noise")
    )
