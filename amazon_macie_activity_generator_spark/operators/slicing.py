"""T7/T8 — value slicing and batch chunking.

T7 (main.py:95-113, README.md:225): split datapoint ``v`` into
``floor(v/s)`` slices of size ``s`` plus a remainder slice; ``v == 0`` or
``s <= 0`` -> ``[v]`` unchanged. This is the reference's fan-out control:
350 with slice_size 100 -> [100, 100, 50] -> 3 parallel deliveries.

T8 (main.py:71-82): break a list into <=k-element chunks (SQS batch 10,
CloudWatch batch 10). As a relation: chunk id = floor(rank/k) over a
deterministic order. Inside sinks we instead chunk per partition in the
writer (no global ordering needed at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# fan-out bound: a slice count beyond this emits the value UN-sliced as a
# single slice instead of materializing the array — one adversarial row
# (e.g. value 1e12, slice 3) must not overflow the int repeat count or
# OOM a task; the reference's Python loop would hang on it the same way
_MAX_SLICES = 1_000_000


def slice_array_expr(value: Column, slice_size: Column) -> Column:
    """Array of slices for one value (pure expression, exact T7 semantics
    up to the documented ``_MAX_SLICES`` fan-out cap)."""
    v = value.cast("long")
    s = slice_size.cast("long")
    full = F.floor(v / s)
    rem = v % s
    sliced = F.when(
        rem > 0, F.concat(F.array_repeat(s, full.cast("int")), F.array(rem))
    ).otherwise(F.array_repeat(s, full.cast("int")))
    # v <= 0, not v == 0: a negative value would hit array_repeat with a
    # negative count (empty array) and posexplode would silently DROP the
    # datapoint row; degenerate values pass through as one slice [v]
    return F.when(
        (v <= 0) | (s <= 0) | (full >= _MAX_SLICES), F.array(v)
    ).otherwise(sliced)


def slice_explode(
    df: DataFrame, slice_size: int | Column, value_col: str = "value", out_col: str = "slice_value"
) -> DataFrame:
    """T7 as an operator: one output row per slice (posexplode keeps the
    slice index for deterministic downstream ordering)."""
    s = F.lit(slice_size) if isinstance(slice_size, int) else slice_size
    arr = slice_array_expr(F.col(value_col), s)
    return df.select(
        "*", F.posexplode(arr).alias("slice_idx", out_col)
    )


def chunk_rows(
    df: DataFrame, chunk_size: int, order_by: list[str], by: list[str] | None = None, out_col: str = "chunk_id"
) -> DataFrame:
    """T8 as a relation: assign floor(row_number/k) chunk ids.

    ``by`` partitions the numbering (per-series / per-target chunking) so
    the window is keyed — no single-reducer global sort at scale. A truly
    global chunking should happen sink-side per partition instead.
    """
    w = Window.orderBy(*order_by) if not by else Window.partitionBy(*by).orderBy(*order_by)
    rn = F.row_number().over(w) - 1
    return df.withColumn(out_col, F.floor(rn / chunk_size).cast("long"))
