"""T1-T8 / R1-R4 transform semantics."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from amazon_macie_activity_generator_spark.operators.align import zero_fill
from amazon_macie_activity_generator_spark.operators.anomalies import apply_anomalies
from amazon_macie_activity_generator_spark.operators.noise import apply_noise
from amazon_macie_activity_generator_spark.operators.reshape import (
    group_datapoints,
    payload_envelope,
    pivot_slot_rows,
    slot_row_json,
)
from amazon_macie_activity_generator_spark.operators.scaling import scale_minmax
from amazon_macie_activity_generator_spark.operators.slicing import chunk_rows, slice_explode


def _series(spark, sid, vals):
    return spark.createDataFrame(
        [(sid, "run", t, float(v)) for t, v in enumerate(vals)],
        "series_id string, run_id string, t long, value double",
    )


# ---------------------------------------------------------------- T1 scaling

def test_scale_minmax_basic(spark):
    df = _series(spark, "a", [0, 5, 10])
    out = scale_minmax(df, lo=1, hi=20)
    vals = [r.value for r in out.orderBy("t").collect()]
    # ceil((x-0)/10*19+1): 1, ceil(10.5)=11, 20
    assert vals == [1, 11, 20]


def test_scale_minmax_constant_clamps_to_lo(spark):
    # B4 fix: constant series -> lo, not NaN
    df = _series(spark, "a", [7, 7, 7])
    out = scale_minmax(df, lo=2, hi=9)
    assert [r.value for r in out.collect()] == [2, 2, 2]


def test_scale_minmax_per_group(spark):
    df = _series(spark, "a", [0, 10]).union(_series(spark, "b", [100, 200]))
    out = scale_minmax(df, lo=0, hi=1)
    got = {(r.series_id, r.t): r.value for r in out.collect()}
    assert got[("a", 0)] == 0 and got[("a", 1)] == 1
    assert got[("b", 0)] == 0 and got[("b", 1)] == 1


# ---------------------------------------------------------------- T3 noise

def test_noise_disabled_by_default(spark):
    df = _series(spark, "a", [1, 2, 3])
    out = apply_noise(df, {})
    assert [r.value for r in out.orderBy("t").collect()] == [1, 2, 3]


def test_noise_zero_min_nonzero_max_is_active(spark):
    # B5 fix: noise_min=0, noise_max=5 must NOT disable noise
    df = _series(spark, "a", [10.0] * 50)
    out = apply_noise(df, {"noise_min": 0, "noise_max": 5})
    vals = [r.value for r in out.collect()]
    assert any(v != 10.0 for v in vals)
    assert all(10 <= v <= 15.5 for v in vals)  # bounded noise, ceil'd into [0,5]


def test_noise_clamps_at_zero(spark):
    df = _series(spark, "a", [0.0] * 50)
    out = apply_noise(df, {"noise_min": -10, "noise_max": -1})
    assert all(r.value == 0.0 for r in out.collect())


# ---------------------------------------------------------------- T4 anomalies

def test_anomaly_default_formula_stride(spark):
    df = _series(spark, "a", [1, 2, 3, 4, 5, 6])
    out = apply_anomalies(df, [{"start": 1, "end": 4, "counts": 2}], 6, mode="stride")
    vals = [r.value for r in out.orderBy("t").collect()]
    # stride = 4//2 = 2 -> slots 1 and 3; default (max+1)^2 = 49
    assert vals == [1, 49, 3, 49, 5, 6]


def test_anomaly_custom_formula(spark):
    df = _series(spark, "a", [1, 2, 3, 4])
    out = apply_anomalies(df, [{"start": 0, "end": 3, "counts": 4, "formula": "t * 100"}], 4, mode="stride")
    assert [r.value for r in out.orderBy("t").collect()] == [0, 100, 200, 300]


def test_anomaly_hash_mode_hits_within_range(spark):
    df = _series(spark, "a", list(range(100)))
    out = apply_anomalies(df, [{"start": 10, "end": 20, "counts": 5}], 100, mode="hash")
    changed = [r.t for r in out.collect() if r.value != r.t]
    assert 1 <= len(changed) <= 5  # with replacement -> may collide
    assert all(10 <= t <= 20 for t in changed)


def test_anomaly_hash_mode_deterministic(spark):
    df = _series(spark, "a", list(range(50)))
    spec = [{"start": 0, "end": 49, "counts": 3}]
    a = [(r.t, r.value) for r in apply_anomalies(df, spec, 50).orderBy("t").collect()]
    b = [(r.t, r.value) for r in apply_anomalies(df, spec, 50).orderBy("t").collect()]
    assert a == b


def test_anomaly_range_clamped(spark):
    df = _series(spark, "a", [1, 2, 3])
    out = apply_anomalies(df, [{"start": 0, "end": 999, "counts": 3}], 3, mode="stride")
    assert out.count() == 3  # no explosion, range clamped to series


def test_anomaly_negative_start_clamped_to_zero(spark):
    # unclamped start=-10 would anchor the stride off-grid and waste
    # hash draws on impossible negative slots
    df = _series(spark, "a", [1, 2, 3, 4])
    out = apply_anomalies(df, [{"start": -10, "end": 3, "counts": 4, "formula": "t * 100"}],
                          4, mode="stride")
    assert [r.value for r in out.orderBy("t").collect()] == [0, 100, 200, 300]


def test_anomaly_multi_spec_stats_compound(spark):
    # main.py:628 recomputes datapoint_max = int(np.max(datapoints))
    # INSIDE the per-spec loop, after earlier specs' in-place writes —
    # so spec 1's max sees spec 0's (6+1)^2 = 49 and injects (49+1)^2
    df = _series(spark, "a", [1, 2, 3, 4, 5, 6])
    out = apply_anomalies(
        df,
        [{"start": 1, "end": 1, "counts": 1}, {"start": 3, "end": 3, "counts": 1}],
        6,
        mode="stride",
    )
    vals = [r.value for r in out.orderBy("t").collect()]
    assert vals == [1, 49, 3, 2500, 5, 6]


def test_anomaly_three_spec_chain_compounds_twice(spark):
    # the compounding must CHAIN: spec 2's max sees spec 1's (49+1)^2
    # = 2500, so it injects (2500+1)^2 — main.py:628's in-loop recompute
    # applied transitively
    df = _series(spark, "a", [1, 2, 3, 4, 5, 6])
    out = apply_anomalies(
        df,
        [
            {"start": 1, "end": 1, "counts": 1},
            {"start": 3, "end": 3, "counts": 1},
            {"start": 5, "end": 5, "counts": 1},
        ],
        6,
        mode="stride",
    )
    vals = [r.value for r in out.orderBy("t").collect()]
    assert vals == [1, 49, 3, 2500, 5, 2501 ** 2]


def test_anomaly_datapoint_max_int_cast(spark):
    # main.py:628 int()-casts the max (truncation toward zero): a series
    # topping out at 2.9 injects (2+1)^2 = 9, not (2.9+1)^2 = 15.21
    df = _series(spark, "a", [0.5, 2.9, 1.0])
    out = apply_anomalies(df, [{"start": 0, "end": 0, "counts": 1}], 3, mode="stride")
    assert [r.value for r in out.orderBy("t").collect()] == [9.0, 2.9, 1.0]


# ---------------------------------------------------------------- T6 zero-fill

def test_zero_fill(spark):
    df = _series(spark, "a", [5, 6, 7]).union(_series(spark, "b", [9]))
    out = zero_fill(spark, df, carry_cols=("run_id",))
    got = {(r.series_id, r.t): r.value for r in out.collect()}
    assert len(got) == 6  # 2 series x 3 slots
    assert got[("b", 1)] == 0.0 and got[("b", 2)] == 0.0
    assert got[("a", 2)] == 7.0


# ---------------------------------------------------------------- T7 slicing

def test_slice_readme_example(spark):
    # main.py:95-113: 350 size 100 -> [100, 100, 100, 50]. (README.md:225
    # says "100, 100 and 50" — a doc bug: that sums to 250, violating the
    # code's slice-sum invariant. We match the code.)
    df = spark.createDataFrame([(350,)], "value long")
    out = slice_explode(df, 100)
    assert [r.slice_value for r in out.orderBy("slice_idx").collect()] == [100, 100, 100, 50]


def test_slice_zero_and_bad_size(spark):
    df = spark.createDataFrame([(0,)], "value long")
    assert [r.slice_value for r in slice_explode(df, 100).collect()] == [0]
    df2 = spark.createDataFrame([(7,)], "value long")
    assert [r.slice_value for r in slice_explode(df2, 0).collect()] == [7]


def test_slice_exact_division(spark):
    df = spark.createDataFrame([(30,)], "value long")
    assert [r.slice_value for r in slice_explode(df, 10).orderBy("slice_idx").collect()] == [10, 10, 10]


def test_slice_sum_invariant(spark):
    df = spark.createDataFrame([(v,) for v in [1, 2, 4, 3, 2, 2, 3, 1, 350, 999]], "value long")
    out = slice_explode(df, 100).groupBy().agg(F.sum("slice_value").alias("s")).first()
    assert out.s == sum([1, 2, 4, 3, 2, 2, 3, 1, 350, 999])


# ---------------------------------------------------------------- T8 chunking

def test_chunk_rows(spark):
    df = spark.createDataFrame([(i,) for i in range(25)], "i long")
    out = chunk_rows(df, 10, order_by=["i"])
    sizes = sorted(r["count"] for r in out.groupBy("chunk_id").count().collect())
    assert sizes == [5, 10, 10]


# ---------------------------------------------------------------- R1-R4

def test_pivot_slot_rows(spark):
    df = _series(spark, "a", [1, 2]).union(_series(spark, "b", [5, 6]))
    out = pivot_slot_rows(df, series_ids=["a", "b"])
    rows = {r.t: (r.a, r.b) for r in out.collect()}
    assert rows == {0: (1.0, 5.0), 1: (2.0, 6.0)}


def test_slot_row_json(spark):
    df = _series(spark, "b", [5]).union(_series(spark, "a", [1]))
    out = slot_row_json(df)
    body = json.loads(out.first().body)
    assert body == {"a": 1.0, "b": 5.0}


def test_group_datapoints_sorted(spark):
    df = _series(spark, "b", [5, 6]).union(_series(spark, "a", [1, 2]))
    out = group_datapoints(df)
    row = {r.t: r.datapoints for r in out.collect()}
    assert [d.generator_id for d in row[0]] == ["a", "b"]
    assert [d.value for d in row[1]] == [2.0, 6.0]


def test_payload_envelope_wire_format(spark):
    # README.md:292-313 wire shape
    df = group_datapoints(_series(spark, "a", [3]))
    out = payload_envelope(df, {"type": "lambda", "function": "f", "generators": ["a"]},
                           timestamp=F.lit("2024-01-01T00:00:00Z"))
    payload = json.loads(out.first().payload)
    assert payload["source"] == "amazon-macie-activity-generator"
    assert payload["action"] == "execute-datapoints"
    assert payload["datapoints"] == [{"generator_id": "a", "value": 3.0}]
    assert payload["target"] == {"type": "lambda", "function": "f"}  # generators stripped


def test_zero_fill_chunked_grid_boundaries(spark, monkeypatch):
    """The default grid is a two-level chunked explode (one sequence()
    per _GRID_CHUNK slots) so no single task materializes the whole
    grid — the wild-timestamp round's sequence()-explosion class. Pin
    the chunk arithmetic exactly: with a tiny chunk size, a grid that
    is not a multiple of the chunk must still be 0..max(t) with no
    gaps, duplicates, or overhang."""
    from amazon_macie_activity_generator_spark.operators import align

    monkeypatch.setattr(align, "_GRID_CHUNK", 7)
    df = spark.createDataFrame(
        [("a", t, float(t)) for t in range(23)]        # 23 slots = 3 chunks + 2
        + [("b", 0, 9.0)],                             # short series: filled
        "series_id string, t long, value double",
    )
    out = align.zero_fill(spark, df).collect()
    got = {(r.series_id, r.t): r.value for r in out}
    assert len(out) == len(got) == 2 * 23
    assert got[("b", 22)] == 0.0 and got[("b", 0)] == 9.0
    assert got[("a", 22)] == 22.0
