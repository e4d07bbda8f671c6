"""Driver-contract query catalog: name -> (spark_builder, duckdb_oracle_sql).

Every deterministic operator from SURVEY.md §2 gets an entry here; the
driver runs the Spark side at sf=0.01 and hash-compares against the
DuckDB SQL (columns sorted by name; floats rounded in BOTH engines by
the queries themselves). Non-SQL-expressible / nondeterministic ops have
``sql=None`` -> rows-only check.

Cross-engine FP discipline (SURVEY.md §7 hard parts):
- identical IEEE op order in both engines wherever floats matter;
- libm-sensitive funcs (sin) round to 6dp *before* any ceil;
- float outputs round to 4dp; casts avoid engine-specific behavior
  (DuckDB CAST(double AS BIGINT) rounds, Spark truncates -> always
  ``floor`` first).
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_macie_activity_generator_spark.operators.reshape import _JSON_OPTS

from amazon_macie_activity_generator_spark.config import GeneratorSpec
from amazon_macie_activity_generator_spark.formula import translate_formula
from amazon_macie_activity_generator_spark.operators import generators as G
from amazon_macie_activity_generator_spark.operators.align import zero_fill
from amazon_macie_activity_generator_spark.operators.anomalies import apply_anomalies
from amazon_macie_activity_generator_spark.operators.reshape import (
    group_datapoints,
    payload_envelope,
    pivot_slot_rows,
)
from amazon_macie_activity_generator_spark.operators.scaling import scale_minmax
from amazon_macie_activity_generator_spark.operators.slicing import chunk_rows, slice_explode
from amazon_macie_activity_generator_spark.plans.generate import generate_series
from amazon_macie_activity_generator_spark.sources.real_series import (
    events_as_series,
    pad_truncate,
)

from amazon_macie_activity_generator_spark.sources.tables import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------- generators

def q_gen_constant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 (main.py:500-508)."""
    g = GeneratorSpec("const1", "constant", {"constant": 7, "num_points": 100})
    df = generate_series(spark, g, run_id="oracle")
    return df.select("t", F.col("value").cast("long").alias("value"))


SQL_GEN_CONSTANT = "SELECT t, CAST(7 AS BIGINT) AS value FROM range(0, 100) tbl(t)"


def q_gen_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 (main.py:447-462): README.md:135 worked example, 100 points."""
    g = GeneratorSpec(
        "sq1", "square",
        {"low_value": 10, "low_width": 2, "high_value": 40, "high_width": 3, "num_points": 100},
    )
    df = generate_series(spark, g, run_id="oracle")
    return df.select("t", F.col("value").cast("long").alias("value"))


SQL_GEN_SQUARE = (
    "SELECT t, CAST(CASE WHEN t % 5 < 2 THEN 10 ELSE 40 END AS BIGINT) AS value "
    "FROM range(0, 100) tbl(t)"
)

_SIN_N = 100
_SIN_STEP = float(_SIN_N) / float(_SIN_N - 1)
_SIN_W = 2.0 * math.pi * 0.037  # angular frequency for f=0.037


def q_gen_sinusoidal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 (main.py:479-498): sin on the TimeSynth grid, signal-scaled to
    [1,20]. Pre-ceil round(6) in both engines dodges libm ULP drift."""
    df = G.time_grid(spark, _SIN_N).withColumn(
        "raw", F.sin(F.lit(_SIN_W) * F.col("t").cast("double") * F.lit(_SIN_STEP))
    )
    df = scale_minmax(df, value_col="raw", lo=1, hi=20, by=[], round_before_ceil=6)
    return df.select("t", F.col("raw").cast("long").alias("value"))


SQL_GEN_SINUSOIDAL = f"""
WITH raw AS (
  SELECT t, sin({_SIN_W!r} * CAST(t AS DOUBLE) * {_SIN_STEP!r}) AS v
  FROM range(0, {_SIN_N}) tbl(t)
), stats AS (SELECT min(v) AS mn, max(v) AS mx FROM raw)
SELECT t, CAST(CASE WHEN mx = mn THEN ceil(1.0)
                ELSE ceil(round((v - mn) / (mx - mn) * 19.0 + 1.0, 6)) END AS BIGINT) AS value
FROM raw, stats
"""

def q_gen_custom_recurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 recurrence semantics (eval with the prefix in scope,
    main.py:473-475): ``sum(datapoints) + 1`` doubles each slot -> raw
    2^(t-1) (1 at t=0), then signal-scaled [1,20]. Closed form in the
    oracle; round(6) pre-ceil in both engines."""
    g = GeneratorSpec(
        "rec1", "custom",
        {"formula": "sum(datapoints) + 1", "num_points": 20,
         "signal_min": 1, "signal_max": 20},
    )
    df = generate_series(spark, g, run_id="oracle")
    return df.select("t", F.col("value").cast("long").alias("value"))


# raw values are exact powers of two and both engines run the identical
# IEEE scaling expression, so no pre-ceil rounding is needed (or wanted:
# one-sided rounding could flip a ceil the other engine doesn't).
SQL_GEN_RECURRENCE = """
WITH raw AS (
  SELECT t, power(2.0, t) AS v FROM range(0, 20) tbl(t)
), stats AS (SELECT min(v) AS mn, max(v) AS mx FROM raw)
SELECT t, CAST(CASE WHEN mx = mn THEN ceil(1.0)
                ELSE ceil((v - mn) / (mx - mn) * 19.0 + 1.0) END AS BIGINT) AS value
FROM raw, stats
"""

_CUSTOM_FORMULA = "(t * t) % 97 + 3"


def q_gen_custom_formula(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 (main.py:464-477): whitelist-translated formula, scaled [0,90]."""
    sql, needed = translate_formula(_CUSTOM_FORMULA)
    assert not needed
    df = G.time_grid(spark, 200).withColumn("raw", F.expr(sql))
    df = scale_minmax(df, value_col="raw", lo=0, hi=90, by=[], round_before_ceil=6)
    return df.select("t", F.col("raw").cast("long").alias("value"))


SQL_GEN_CUSTOM = """
WITH raw AS (
  SELECT t, (CAST(t AS DOUBLE) * CAST(t AS DOUBLE)) % 97 + 3 AS v
  FROM range(0, 200) tbl(t)
), stats AS (SELECT min(v) AS mn, max(v) AS mx FROM raw)
SELECT t, CAST(CASE WHEN mx = mn THEN ceil(0.0)
                ELSE ceil(round((v - mn) / (mx - mn) * 90.0 + 0.0, 6)) END AS BIGINT) AS value
FROM raw, stats
"""

# ------------------------------------------------------------------ sources

_REPLAY_N = 2500


def q_real_replay_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 (main.py:510-529): replay 'click' events as a series; zero-pad
    to N slots / truncate beyond."""
    s = events_as_series(_events(spark, sf_dir)).filter(F.col("series_id") == "click")
    out = pad_truncate(spark, s.select("t", "value"), _REPLAY_N)
    return out.select("t", F.round("value", 4).alias("value"))


SQL_REAL_REPLAY = f"""
WITH s AS (
  SELECT row_number() OVER (ORDER BY ts, event_id) - 1 AS t, value
  FROM events WHERE event_type = 'click' AND ts IS NOT NULL
)
SELECT g.t, round(COALESCE(s.value, 0.0), 4) AS value
FROM range(0, {_REPLAY_N}) g(t) LEFT JOIN s ON g.t = s.t
"""

# --------------------------------------------------------------- transforms

def q_scale_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/T2 (main.py:340-357): rescale events.value per event_type into
    [1,100] — two-pass agg + broadcast join, no unpartitioned window."""
    df = _events(spark, sf_dir).select("event_id", "event_type", "value")
    out = scale_minmax(df, value_col="value", lo=1, hi=100, by=["event_type"], out_col="scaled")
    return out.select("event_id", "event_type", F.col("scaled").cast("long").alias("scaled"))


SQL_SCALE_MINMAX = """
SELECT event_id, event_type,
       CAST(CASE WHEN mx = mn THEN ceil(1.0)
             ELSE ceil((value - mn) / (mx - mn) * 99.0 + 1.0) END AS BIGINT) AS scaled
FROM (
  SELECT event_id, event_type, value,
         min(value) OVER (PARTITION BY event_type) AS mn,
         max(value) OVER (PARTITION BY event_type) AS mx
  FROM events
)
"""

_ANOM_SPEC = {"start": 10, "end": 500, "counts": 7}
_ANOM_STRIDE = (500 - 10 + 1) // 7  # 70


def q_anomaly_inject_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 (main.py:606-641), deterministic stride mode: 7 slots in
    [10,500], overwrite with default (max+1)^2."""
    s = events_as_series(_events(spark, sf_dir)).select("series_id", "t", "value")
    out = apply_anomalies(s, [_ANOM_SPEC], n_points=501, mode="stride")
    return out.select("series_id", "t", F.round("value", 4).alias("value"))


SQL_ANOMALY_STRIDE = f"""
WITH s AS (
  SELECT event_type AS series_id,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS t,
         value
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
), st AS (SELECT series_id, max(value) AS mx FROM s GROUP BY series_id)
SELECT s.series_id, s.t,
       round(CASE WHEN s.t BETWEEN 10 AND 500
                   AND (s.t - 10) % {_ANOM_STRIDE} = 0
                   AND (s.t - 10) // {_ANOM_STRIDE} < 7
              THEN power(TRY_CAST(trunc(st.mx) AS BIGINT) + 1, 2) ELSE s.value END, 4) AS value
FROM s JOIN st USING (series_id)
"""


def q_align_zero_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 (main.py:686-696): full grid x series, missing slots -> 0."""
    s = events_as_series(_events(spark, sf_dir)).select("series_id", "t", "value")
    out = zero_fill(spark, s)
    return out.select("series_id", "t", F.round("value", 4).alias("value"))


SQL_ALIGN_ZERO_FILL = """
WITH s AS (
  SELECT event_type AS series_id,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS t,
         value
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
),
grid AS (
  SELECT unnest(range(0, (SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM s GROUP BY series_id)))) AS t
)
SELECT d.series_id, grid.t, round(COALESCE(s.value, 0.0), 4) AS value
FROM grid CROSS JOIN (SELECT DISTINCT series_id FROM s) d
LEFT JOIN s ON s.series_id = d.series_id AND s.t = grid.t
"""


def q_slice_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 (main.py:95-113): fan-out slicing, slice_size=3."""
    df = (
        _events(spark, sf_dir)
        .filter(F.col("event_id") < 1000)
        .select("event_id", F.floor("value").cast("long").alias("value"))
    )
    out = slice_explode(df, 3)
    return out.select(
        "event_id",
        F.col("slice_idx").cast("long").alias("slice_idx"),
        F.col("slice_value").cast("long").alias("slice_value"),
    )


SQL_SLICE_EXPLODE = """
WITH v AS (
  SELECT event_id, CAST(floor(value) AS BIGINT) AS v
  FROM events WHERE event_id < 1000
),
n AS (
  -- v <= 0 and the v // 3 >= 1000000 cap mirror slicing.slice_array_expr:
  -- degenerate values pass through as ONE slice [v] (never a dropped row
  -- or a million-element fan-out)
  SELECT event_id, v,
         CASE WHEN v <= 0 OR v // 3 >= 1000000 THEN 1
              ELSE v // 3 + CASE WHEN v % 3 > 0 THEN 1 ELSE 0 END END AS cnt
  FROM v
)
SELECT event_id, i AS slice_idx,
       CASE WHEN v <= 0 OR v // 3 >= 1000000 THEN v
            WHEN i < v // 3 THEN 3 ELSE v % 3 END AS slice_value
FROM (SELECT event_id, v, unnest(range(cnt)) AS i FROM n)
"""


def q_chunk_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8 (main.py:71-82): <=10-row chunks per event_type."""
    df = _events(spark, sf_dir).select("event_type", "event_id")
    out = chunk_rows(df, 10, order_by=["event_id"], by=["event_type"])
    return out.groupBy("event_type", "chunk_id").agg(F.count("*").alias("n_rows"))


SQL_CHUNK_ROWS = """
SELECT event_type, chunk_id, count(*) AS n_rows
FROM (
  SELECT event_type,
         (row_number() OVER (PARTITION BY event_type ORDER BY event_id) - 1) // 10 AS chunk_id
  FROM events
)
GROUP BY event_type, chunk_id
"""

# ---------------------------------------------------------------- reshaping

def q_pivot_slot_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 (main.py:686-707): wide slot rows over the 5 event series."""
    s = events_as_series(_events(spark, sf_dir)).filter(F.col("t") < 1500)
    wide = pivot_slot_rows(s, series_ids=EVENT_TYPES, agg="max")
    return wide.select("t", *[F.round(c, 4).alias(c) for c in EVENT_TYPES])


SQL_PIVOT_SLOT_ROW = """
WITH s AS (
  SELECT event_type AS series_id,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS t,
         value
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
)
SELECT t,
       round(COALESCE(max(CASE WHEN series_id = 'click' THEN value END), 0), 4) AS click,
       round(COALESCE(max(CASE WHEN series_id = 'error' THEN value END), 0), 4) AS error,
       round(COALESCE(max(CASE WHEN series_id = 'purchase' THEN value END), 0), 4) AS purchase,
       round(COALESCE(max(CASE WHEN series_id = 'signup' THEN value END), 0), 4) AS signup,
       round(COALESCE(max(CASE WHEN series_id = 'view' THEN value END), 0), 4) AS view
FROM s WHERE t < 1500 GROUP BY t
"""


def q_group_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 (main.py:784-802): per-slot sorted datapoint groups, as JSON for
    cross-engine comparison."""
    s = (
        events_as_series(_events(spark, sf_dir))
        .filter(F.col("t") < 100)
        .withColumn("value", F.floor("value").cast("long"))
    )
    out = group_datapoints(s)
    return out.select("t", F.to_json("datapoints", _JSON_OPTS).alias("datapoints_json"))


SQL_GROUP_COLLECT = """
WITH s AS (
  SELECT event_type AS series_id,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS t,
         CAST(floor(value) AS BIGINT) AS value
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
)
SELECT t, to_json(list(struct_pack(generator_id := series_id, value := value)
                       ORDER BY series_id)) AS datapoints_json
FROM s WHERE t < 100 GROUP BY t
"""

_PAYLOAD_TARGET = {"type": "lambda", "function": "net_fuzz", "generators": ["click"]}


def q_payload_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 (main.py:804-828): wire-format envelope (README.md:292-313),
    fixed timestamp for determinism."""
    s = (
        events_as_series(_events(spark, sf_dir))
        .filter(F.col("t") < 5)
        .withColumn("value", F.floor("value").cast("long"))
    )
    grouped = group_datapoints(s)
    return payload_envelope(
        grouped, _PAYLOAD_TARGET, timestamp=F.lit("2024-01-01T00:00:00Z")
    )


SQL_PAYLOAD_JSON = """
WITH s AS (
  SELECT event_type AS series_id,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS t,
         CAST(floor(value) AS BIGINT) AS value
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
)
SELECT to_json(struct_pack(
         source := 'amazon-macie-activity-generator',
         action := 'execute-datapoints',
         "timestamp" := '2024-01-01T00:00:00Z',
         datapoints := list(struct_pack(generator_id := series_id, value := value)
                            ORDER BY series_id),
         target := struct_pack(function := 'net_fuzz', type := 'lambda')
       )) AS payload
FROM s WHERE t < 5 GROUP BY t
"""

# ------------------------------------------------------------- flagship

_FLAGSHIP_ANOM = {"start": 10, "end": 100, "counts": 5}
_FLAGSHIP_N = 101  # anomaly-clamp window (n_points)


def flagship_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver flagship (``__spark_entry__.entry`` runs this at
    sf0.001): the full reference delivery pipeline, replay -> align
    (zero-fill, T6) -> signal-scale into [1,20] (T2) -> stride anomaly
    injection (T4) -> int cast (T5) -> wide slot rows (R1, the queue
    entry shape, main.py:667-709). Composed here as a catalog entry so
    the flagship itself carries a DuckDB value-hash oracle — each stage's
    oracle CTE is the same SQL that hash-matches the stage entry."""
    from amazon_macie_activity_generator_spark.cache import begin_scope, scoped_persist

    events = _events(spark, sf_dir)
    series = events_as_series(events).select("series_id", "t", "value")
    # r14 (guide §5 reuse): each composed stage consumes its input more
    # than once (zero_fill reads `series` for the grid max, the distinct
    # series dimension AND the join; scale_minmax reads `aligned` for
    # the stats aggregate AND the join), so the unbarriered composition
    # re-derived the events->window subtree ~12x per plan (24 scan nodes
    # in plans/r14/flagship_pipeline_before.txt). Persist the two fan-out
    # points; every downstream branch reads the cache. Lazy persists —
    # plan barriers + per-partition cache locking, no eager action, so
    # the bench timer still sees the full cost.
    begin_scope("flagship_pipeline", spark)
    series = scoped_persist(series, "flagship_pipeline", keep=2)
    aligned = scoped_persist(zero_fill(spark, series), "flagship_pipeline", keep=2)
    scaled = scale_minmax(aligned, value_col="value", lo=1, hi=20, by=["series_id"])
    with_anomalies = apply_anomalies(
        scaled.withColumn("value", F.col("value").cast("double")),
        [_FLAGSHIP_ANOM],
        n_points=_FLAGSHIP_N,
        mode="stride",
    )
    final = with_anomalies.withColumn("value", F.col("value").cast("long"))
    return pivot_slot_rows(final, series_ids=EVENT_TYPES, agg="max")


def _sql_flagship() -> str:
    """The composed oracle, generated from the SAME spec constants the
    Spark side uses (one source of truth), with apply_anomalies'
    clamp/stride rules mirrored: both ends clamped into [0, n_points-1],
    stride = max(width // counts, 1)."""
    start = max(0, min(int(_FLAGSHIP_ANOM["start"]), _FLAGSHIP_N - 1))
    end = max(0, min(int(_FLAGSHIP_ANOM["end"]), _FLAGSHIP_N - 1))
    counts = int(_FLAGSHIP_ANOM["counts"])
    stride = max((end - start + 1) // counts, 1)
    pivot_cols = ",\n".join(
        f"       CAST(COALESCE(max(CASE WHEN series_id = '{sid}' THEN value END), 0) AS DOUBLE) AS {sid}"
        for sid in EVENT_TYPES
    )
    return f"""
WITH s AS (
  SELECT event_type AS series_id,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS t,
         value
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
),
grid AS (
  SELECT unnest(range(0, (SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM s GROUP BY series_id)))) AS t
),
aligned AS (
  SELECT d.series_id, grid.t, COALESCE(s.value, 0.0) AS value
  FROM grid CROSS JOIN (SELECT DISTINCT series_id FROM s) d
  LEFT JOIN s ON s.series_id = d.series_id AND s.t = grid.t
),
st AS (SELECT series_id, min(value) AS mn, max(value) AS mx FROM aligned GROUP BY series_id),
scaled AS (
  SELECT a.series_id, a.t,
         CASE WHEN st.mx = st.mn THEN ceil(1.0)
              ELSE ceil((a.value - st.mn) / (st.mx - st.mn) * 19.0 + 1.0) END AS value
  FROM aligned a JOIN st USING (series_id)
),
am AS (SELECT series_id, max(value) AS mx FROM scaled GROUP BY series_id),
anom AS (
  -- stride hits then the T5 int cast: Spark CAST(double AS long)
  -- truncates, DuckDB's rounds -> trunc() first
  SELECT sc.series_id, sc.t,
         CAST(trunc(CASE WHEN sc.t BETWEEN {start} AND {end}
                          AND (sc.t - {start}) % {stride} = 0
                          AND (sc.t - {start}) // {stride} < {counts}
                     THEN power(TRY_CAST(trunc(am.mx) AS BIGINT) + 1, 2)
                     ELSE sc.value END) AS BIGINT) AS value
  FROM scaled sc JOIN am USING (series_id)
)
SELECT t,
{pivot_cols}
FROM anom GROUP BY t
"""


SQL_FLAGSHIP = _sql_flagship()

from amazon_macie_activity_generator_spark.functions.rng import (  # noqa: E402
    counter_offset,
    counter_unit,
)

_CTR_M = 2147483647
_CTR_OFF_UNI = counter_offset("oracle", "rndc1", "uni")
_CTR_OFF_EXP = counter_offset("oracle", "rndx1", "exp")


def _ctr_chain_sql(off: int, n: int) -> str:
    """DuckDB twin of functions/rng.py:counter_int31 — same rounds, same
    constants, all intermediates < 2^48."""
    return f"""
  x1 AS (SELECT t, ((({off} + t) % {_CTR_M - 1} + 1) * 48271) % {_CTR_M} AS x
         FROM range(0, {n}) tbl(t)),
  x2 AS (SELECT t, (xor(x, x >> 15) * 69621) % {_CTR_M} AS x FROM x1),
  x3 AS (SELECT t, (xor(x, x >> 13) * 48271) % {_CTR_M} AS x FROM x2),
  u  AS (SELECT t, CAST(x AS DOUBLE) / {_CTR_M}.0 AS v FROM x3)"""


def q_gen_random_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 uniform draws via the cross-engine counter RNG (rng='counter',
    functions/rng.py): the oracle-checkable path for random generation —
    Lehmer rounds + xorshift are pure shared arithmetic, so unlike
    xxhash64 draws the full pipeline (draw -> signal scale -> int cast,
    main.py:531-573) value-hash-matches DuckDB exactly."""
    g = GeneratorSpec(
        "rndc1", "random",
        {"type": "uniform", "rng": "counter", "num_points": 1000,
         "signal_min": 1, "signal_max": 20},
    )
    df = generate_series(spark, g, run_id="oracle")
    return df.select("t", F.col("value").cast("long").alias("value"))


SQL_GEN_RANDOM_COUNTER = f"""
WITH {_ctr_chain_sql(_CTR_OFF_UNI, 1000)},
  stats AS (SELECT min(v) AS mn, max(v) AS mx FROM u)
SELECT t, CAST(CASE WHEN mx = mn THEN ceil(1.0)
               ELSE ceil((v - mn) / (mx - mn) * 19.0 + 1.0) END AS BIGINT) AS value
FROM u, stats
"""


def q_gen_random_expo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 expovariate (main.py:553: -ln(1-u)/lambda) on the counter RNG,
    signal-scaled [1,20]. ln is libm -> round(6) pre-ceil in both engines
    (same discipline as gen_sinusoidal)."""
    df = G.time_grid(spark, 1000).withColumn(
        "raw",
        -F.log(F.lit(1.0) - counter_unit(F.lit(_CTR_OFF_EXP) + F.col("t"))) / F.lit(0.5),
    )
    df = scale_minmax(df, value_col="raw", lo=1, hi=20, by=[], round_before_ceil=6)
    return df.select("t", F.col("raw").cast("long").alias("value"))


SQL_GEN_RANDOM_EXPO = f"""
WITH {_ctr_chain_sql(_CTR_OFF_EXP, 1000)},
  raw AS (SELECT t, -ln(1.0 - v) / 0.5 AS v FROM u),
  stats AS (SELECT min(v) AS mn, max(v) AS mx FROM raw)
SELECT t, CAST(CASE WHEN mx = mn THEN ceil(1.0)
               ELSE ceil(round((v - mn) / (mx - mn) * 19.0 + 1.0, 6)) END AS BIGINT) AS value
FROM raw, stats
"""


def q_noise_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 oracle bridge — the full bounded-noise semantics (main.py:588-604:
    draw N(0,1) per point, min-max rescale the noise VECTOR into
    [noise_min, noise_max], add, clamp at 0) on counter-RNG gauss draws.
    Box-Muller uses libm sqrt/log/cos -> round(6) pre-ceil in both engines
    (same discipline as gen_sinusoidal). Constant-10 base series, noise
    [0, 5]."""
    from amazon_macie_activity_generator_spark.functions.rng import counter_gauss

    df = G.time_grid(spark, 1000).withColumn("value", F.lit(10.0))
    df = df.withColumn("__raw", counter_gauss(F.lit(_CTR_OFF_NZ) + F.col("t")))
    df = scale_minmax(
        df, value_col="__raw", lo=0, hi=5, by=[], out_col="__noise", round_before_ceil=6
    )
    return df.select(
        "t",
        F.greatest(F.lit(0.0), F.col("value") + F.col("__noise")).cast("long").alias("value"),
    )


_CTR_OFF_NZ = counter_offset("oracle", "noisec", "nz")
_CTR_GAUSS_SPREAD = 1 << 20
_TWO_PI = 2.0 * math.pi

SQL_NOISE_COUNTER = f"""
WITH {_ctr_chain_sql(_CTR_OFF_NZ, 1000)},
  u2c AS (SELECT t, ((({_CTR_OFF_NZ + _CTR_GAUSS_SPREAD} + t) % {_CTR_M - 1} + 1) * 48271) % {_CTR_M} AS x
          FROM range(0, 1000) tbl(t)),
  u2b AS (SELECT t, (xor(x, x >> 15) * 69621) % {_CTR_M} AS x FROM u2c),
  u2a AS (SELECT t, (xor(x, x >> 13) * 48271) % {_CTR_M} AS x FROM u2b),
  z AS (
    SELECT u.t,
           sqrt(-2.0 * ln(greatest(u.v, 1e-16)))
             * cos({_TWO_PI!r} * (CAST(u2a.x AS DOUBLE) / {_CTR_M}.0)) AS v
    FROM u JOIN u2a ON u.t = u2a.t
  ),
  stats AS (SELECT min(v) AS mn, max(v) AS mx FROM z)
SELECT t, CAST(greatest(0.0, 10.0 + (CASE WHEN mx = mn THEN ceil(0.0)
               ELSE ceil(round((v - mn) / (mx - mn) * 5.0 + 0.0, 6)) END)) AS BIGINT) AS value
FROM z, stats
"""


def q_fake_formats_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F3 format-parity bridge: ITIN ('9%02d-7%d-%04d', main.py:117-124)
    and CVE ('CVE-%d-%04d', main.py:141-149) strings assembled from
    counter-RNG digit streams — exact string equality with the DuckDB twin
    proves the format assembly (printf semantics, modular digit derivation)
    cross-engine. The production providers (functions/fake.py) draw from
    xxhash64 streams and are format/regex-tested rows-only."""
    from amazon_macie_activity_generator_spark.functions.rng import counter_int31

    def d(off: int, mod: int):
        return F.pmod(counter_int31(F.lit(off) + F.col("t")), F.lit(mod))

    itin = F.format_string(
        "9%02d-7%d-%04d",
        d(_CTR_OFF_F[0], 100), d(_CTR_OFF_F[1], 10), d(_CTR_OFF_F[2], 10000),
    )
    cve = F.format_string(
        "CVE-%d-%04d",
        F.lit(1999) + d(_CTR_OFF_F[3], 27), d(_CTR_OFF_F[4], 9999) + 1,
    )
    return G.time_grid(spark, 2000).select("t", itin.alias("itin"), cve.alias("cve"))


_CTR_OFF_F = [counter_offset("oracle", "fake", s)
              for s in ("itin1", "itin2", "itin3", "cve1", "cve2")]

_SQL_FAKE_STREAMS = ",\n   ".join(
    f"((({off} + t) % {_CTR_M - 1} + 1) * 48271) % {_CTR_M} AS {c}"
    for off, c in zip(_CTR_OFF_F, "abcde")
)

SQL_FAKE_FORMATS_COUNTER = f"""
WITH x1 AS (SELECT t, {_SQL_FAKE_STREAMS}
  FROM range(0, 2000) tbl(t)),
x2 AS (SELECT t, {", ".join(f"(xor({c}, {c} >> 15) * 69621) % {_CTR_M} AS {c}" for c in "abcde")} FROM x1),
x3 AS (SELECT t, {", ".join(f"(xor({c}, {c} >> 13) * 48271) % {_CTR_M} AS {c}" for c in "abcde")} FROM x2)
SELECT t,
  printf('9%02d-7%d-%04d', a % 100, b % 10, c % 10000) AS itin,
  printf('CVE-%d-%04d', 1999 + d % 27, e % 9999 + 1) AS cve
FROM x3
"""


_CTR_OFF_PAR = counter_offset("oracle", "rndp1", "par")
_CTR_OFF_WEI = counter_offset("oracle", "rndw1", "wei")
_CTR_OFF_TRI = counter_offset("oracle", "rndt1", "tri")


def q_gen_random_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 paretovariate (main.py:555-557: (1-u)^(-1/alpha), alpha=2.5) on
    the counter RNG, signal-scaled [1,20], round(6) pre-ceil (pow is libm)."""
    df = G.time_grid(spark, 1000).withColumn(
        "raw",
        F.pow(F.lit(1.0) - counter_unit(F.lit(_CTR_OFF_PAR) + F.col("t")), F.lit(-1.0 / 2.5)),
    )
    df = scale_minmax(df, value_col="raw", lo=1, hi=20, by=[], round_before_ceil=6)
    return df.select("t", F.col("raw").cast("long").alias("value"))


SQL_GEN_RANDOM_PARETO = f"""
WITH {_ctr_chain_sql(_CTR_OFF_PAR, 1000)},
  raw AS (SELECT t, pow(1.0 - v, {-1.0 / 2.5!r}) AS v FROM u),
  stats AS (SELECT min(v) AS mn, max(v) AS mx FROM raw)
SELECT t, CAST(CASE WHEN mx = mn THEN ceil(1.0)
               ELSE ceil(round((v - mn) / (mx - mn) * 19.0 + 1.0, 6)) END AS BIGINT) AS value
FROM raw, stats
"""


def q_gen_random_weibull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 weibullvariate (main.py:559-561: alpha*(-ln(1-u))^(1/beta),
    alpha=1, beta=1.5) on the counter RNG, signal-scaled [1,20]."""
    df = G.time_grid(spark, 1000).withColumn(
        "raw",
        F.pow(-F.log(F.lit(1.0) - counter_unit(F.lit(_CTR_OFF_WEI) + F.col("t"))),
              F.lit(1.0 / 1.5)),
    )
    df = scale_minmax(df, value_col="raw", lo=1, hi=20, by=[], round_before_ceil=6)
    return df.select("t", F.col("raw").cast("long").alias("value"))


SQL_GEN_RANDOM_WEIBULL = f"""
WITH {_ctr_chain_sql(_CTR_OFF_WEI, 1000)},
  raw AS (SELECT t, pow(-ln(1.0 - v), {1.0 / 1.5!r}) AS v FROM u),
  stats AS (SELECT min(v) AS mn, max(v) AS mx FROM raw)
SELECT t, CAST(CASE WHEN mx = mn THEN ceil(1.0)
               ELSE ceil(round((v - mn) / (mx - mn) * 19.0 + 1.0, 6)) END AS BIGINT) AS value
FROM raw, stats
"""


def q_gen_random_triangular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 triangular (main.py:541-545) through the FULL pipeline with
    rng='counter': drawn directly in [5,10] (not rescaled), int-cast (T5).
    sqrt is IEEE correctly-rounded, so no rounding shim is needed — the
    whole path is bit-exact cross-engine."""
    g = GeneratorSpec(
        "rndt1", "random",
        {"type": "triangular", "rng": "counter", "num_points": 1000,
         "signal_min": 5, "signal_max": 10},
    )
    df = generate_series(spark, g, run_id="oracle")
    return df.select("t", F.col("value").cast("long").alias("value"))


SQL_GEN_RANDOM_TRIANGULAR = f"""
WITH {_ctr_chain_sql(_CTR_OFF_TRI, 1000)}
SELECT t, CAST(floor(
  CASE WHEN v < 0.5
       THEN 5.0 + sqrt(v * 12.5)
       ELSE 10.0 - sqrt((1.0 - v) * 12.5) END) AS BIGINT) AS value
FROM u
"""


# ----------------------------------------------------- rows-only (no oracle)

def q_gen_random_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 (main.py:531-573): uniform draws, signal-scaled. Cross-engine RNG
    never hash-matches -> rows-only (count + range asserted by tests)."""
    g = GeneratorSpec(
        "rnd1", "random",
        {"type": "uniform", "num_points": 1000, "signal_min": 1, "signal_max": 20},
    )
    df = generate_series(spark, g, run_id="oracle")
    return df.select("t", F.col("value").cast("long").alias("value"))


def q_noise_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 (main.py:588-604): bounded noise, clamped at 0. Rows-only."""
    from amazon_macie_activity_generator_spark.operators.noise import apply_noise

    g = GeneratorSpec("c", "constant", {"constant": 10, "num_points": 1000})
    df = generate_series(spark, g, run_id="oracle")
    out = apply_noise(df, {"noise_min": 0, "noise_max": 5}, identity=("run_id", "series_id", "t"))
    return out.select("t", F.col("value").alias("value"))


from amazon_macie_activity_generator_spark.queries_ext import EXT_QUERIES  # noqa: E402
from amazon_macie_activity_generator_spark.queries_ext2 import EXT2_QUERIES  # noqa: E402
from amazon_macie_activity_generator_spark.queries_ext3 import EXT3_QUERIES  # noqa: E402
from amazon_macie_activity_generator_spark.queries_ext4 import EXT4_QUERIES  # noqa: E402
from amazon_macie_activity_generator_spark.queries_ext5 import EXT5_QUERIES  # noqa: E402

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "gen_constant": (q_gen_constant, SQL_GEN_CONSTANT),
    "gen_square": (q_gen_square, SQL_GEN_SQUARE),
    "gen_sinusoidal": (q_gen_sinusoidal, SQL_GEN_SINUSOIDAL),
    "gen_custom_formula": (q_gen_custom_formula, SQL_GEN_CUSTOM),
    "gen_custom_recurrence": (q_gen_custom_recurrence, SQL_GEN_RECURRENCE),
    "gen_random_uniform": (q_gen_random_uniform, None),
    "gen_random_counter": (q_gen_random_counter, SQL_GEN_RANDOM_COUNTER),
    "gen_random_expo": (q_gen_random_expo, SQL_GEN_RANDOM_EXPO),
    "gen_random_pareto": (q_gen_random_pareto, SQL_GEN_RANDOM_PARETO),
    "gen_random_weibull": (q_gen_random_weibull, SQL_GEN_RANDOM_WEIBULL),
    "gen_random_triangular": (q_gen_random_triangular, SQL_GEN_RANDOM_TRIANGULAR),
    "noise_counter": (q_noise_counter, SQL_NOISE_COUNTER),
    "fake_formats_counter": (q_fake_formats_counter, SQL_FAKE_FORMATS_COUNTER),
    "real_replay_pad": (q_real_replay_pad, SQL_REAL_REPLAY),
    "scale_minmax": (q_scale_minmax, SQL_SCALE_MINMAX),
    "noise_bounded": (q_noise_bounded, None),
    "anomaly_inject_stride": (q_anomaly_inject_stride, SQL_ANOMALY_STRIDE),
    "align_zero_fill": (q_align_zero_fill, SQL_ALIGN_ZERO_FILL),
    "slice_explode": (q_slice_explode, SQL_SLICE_EXPLODE),
    "chunk_rows": (q_chunk_rows, SQL_CHUNK_ROWS),
    "pivot_slot_row": (q_pivot_slot_row, SQL_PIVOT_SLOT_ROW),
    "group_collect": (q_group_collect, SQL_GROUP_COLLECT),
    "payload_json": (q_payload_json, SQL_PAYLOAD_JSON),
    **EXT_QUERIES,
    **EXT2_QUERIES,
    **EXT3_QUERIES,
    **EXT4_QUERIES,
    **EXT5_QUERIES,
    # appended LAST so existing entries keep their insertion order (the
    # rotation's final tiebreak)
    "flagship_pipeline": (flagship_pipeline, SQL_FLAGSHIP),
}
