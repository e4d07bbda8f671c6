"""Third extension catalog: sequence analytics + classic warehouse shapes
the earlier catalogs didn't cover.

The reference (a time-series activity generator, /root/reference/src/main.py)
has none of this; these extend SURVEY.md §2.8's north-star set:

- ``event_gaps``         per-entity inter-arrival gaps via lag() — the
  sequence-delta window shape (the precursor to sessionization and
  rate-anomaly detection; complements ``sessionize``'s gap *thresholding*
  with the raw gap *measurement*).
- ``char_entropy``       per-document Shannon character entropy — the
  classic cheap gibberish/boilerplate filter in LLM data pipelines
  (low-entropy = repeated chars/markup, high-entropy = random noise);
  complements ``repetition_ratio`` (token-level) at the character level.
- ``small_qty_revenue``  TPC-H Q17-shaped correlated scalar aggregate:
  lineitems below 0.2x their part's average quantity, revenue per brand.
  The "compare each row to its group's aggregate" join shape.
- ``large_orders``       TPC-H Q18-shaped HAVING-then-join: orders whose
  total quantity exceeds a threshold, joined back to the order header.
- ``rolling_time_window`` time-based RANGE window frame (preceding-1h
  per-user aggregates on an integer epoch-seconds ordering key).
- ``hourly_activity_spine`` calendar-grain zero-fill: dense hour x type
  grid via sequence() spine, silent hours as literal 0 (T6's twin).
- ``mom_revenue_change``  aggregate-then-window composition (monthly
  revenue + lag() percent deltas).
- ``fuzzy_name_pairs``    blocked Levenshtein similarity join — the
  entity-resolution pattern: quadratic comparison confined to small
  (p_type, p_size) blocks.
- ``event_funnel``        ordered view->click->purchase conversion: the
  chained conditional-min funnel (exact integer counts, no window
  cascade, user-keyed shuffles only).
- ``retention_cohorts``   first-seen cohort x day-offset distinct-user
  matrix (the warehouse retention triangle).
- ``bpe_pair_counts``     the BPE-training inner loop: corpus-wide
  adjacent-token-pair counts, top-20 merge candidates. One pair-keyed
  map-side-combinable shuffle per merge iteration.
- ``mix_sampling_weights`` domain-mixture reweighting: per-source
  upsample factor balancing every domain to the largest (exact-integer
  token counts; the single FP op is one division per group).
- ``winnowing_fingerprint`` MOSS winnowing (k-gram md5 + w-window min):
  robust fingerprints at ~1/w the all-grams storage; any shared
  substring >= w+k-1 tokens shares a fingerprint.
- ``streaming_left_join`` watermarked LEFT OUTER stream-stream join —
  null-padded rows emitted on state eviction; the oracle states the
  min-of-both-sides watermark closure rule in SQL.

Same contract as queries.py: name -> (spark_builder, duckdb_sql | None).

Scale notes (local[32] tests, 1000-executor design):
- ``event_gaps`` is one shuffle (hash by user_id) + an in-partition sort;
  no global sort, no driver round-trip.
- ``char_entropy`` explodes to one row per character but immediately
  partial-aggregates to (doc_id, ch) counts map-side — the shuffle carries
  at most |alphabet| rows per doc, not n_chars. Two doc_id-keyed shuffles.
- ``small_qty_revenue`` self-joins lineitem with its per-part averages:
  both sides shuffle on l_partkey once (co-partitioned hash join); the
  part dimension is broadcast. No boundary FP risk: l_quantity is
  integral so per-part sums (and hence 0.2*avg) are bit-exact in both
  engines.
- ``large_orders`` partial-aggregates lineitem map-side, filters to the
  few qualifying orderkeys, and AQE converts the join back to orders
  into a broadcast join at runtime.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from amazon_macie_activity_generator_spark.sources.tables import load_table, spread_small_scan


# --------------------------------------------------------------------------
# event_gaps — per-user inter-arrival deltas (lag window)
# --------------------------------------------------------------------------

def q_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seconds between consecutive events per user, ordered by (ts,
    event_id) for a deterministic tiebreak. First event per user has no
    predecessor and is dropped. Both engines count epoch-second boundary
    crossings (unix_timestamp floor == date_diff('second', ...)), so
    sub-second timestamps compare identically. NULL-ts events are
    excluded (no time, no gap; NULL order keys are unstable in DuckDB's
    parallel window sort)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "event_id", "ts")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "user_id",
            "event_id",
            (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")).alias("gap_s"),
        )
    )


SQL_EVENT_GAPS = """
SELECT user_id, event_id, gap_s FROM (
  SELECT user_id, event_id,
         date_diff('second',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap_s
  FROM events WHERE ts IS NOT NULL
) WHERE gap_s IS NOT NULL
"""


# --------------------------------------------------------------------------
# char_entropy — per-doc Shannon character entropy (quality filter)
# --------------------------------------------------------------------------

def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H = log2(n) - sum(c*log2 c)/n over per-doc character counts — the
    single-division form avoids a per-row p=c/n divide. The explode is
    tamed by map-side partial aggregation: the shuffle carries (doc_id,
    ch) pairs (bounded by the alphabet), never one row per character.
    Empty fragments from the empty-pattern split are filtered on both
    engines (Spark keeps a trailing '', DuckDB doesn't)."""
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    ch = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), "")).alias("ch"))
        .filter(F.col("ch") != "")
    )
    freq = ch.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c").cast("double")
    return freq.groupBy("doc_id").agg(
        F.sum("c").alias("n_chars_seen"),
        F.round(
            F.log2(n) - F.sum(F.col("c") * F.log2(F.col("c"))) / n, 4
        ).alias("entropy_bits"),
    )


SQL_CHAR_ENTROPY = """
WITH ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
), freq AS (
  SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS c
  FROM ch WHERE ch <> '' GROUP BY doc_id, ch
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_chars_seen,
       round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS entropy_bits
FROM freq GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# small_qty_revenue — TPC-H Q17 shape (row vs its group's aggregate)
# --------------------------------------------------------------------------

def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lineitems whose quantity is below 20% of their part's
    average, rolled up per brand (TPC-H Q17 generalized from one brand to
    all). The correlated scalar subquery becomes an aggregate + equi-join
    on l_partkey; the part dimension is broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    th = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_th")
    )
    small = li.join(th, "l_partkey").filter(F.col("l_quantity") < F.col("qty_th"))
    return (
        small.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            small["l_partkey"] == part["p_partkey"],
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
        )
    )


SQL_SMALL_QTY_REVENUE = """
WITH th AS (
  SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_th
  FROM lineitem GROUP BY l_partkey
)
SELECT p_brand,
       count(*) AS n_lines,
       round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN th USING (l_partkey)
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_quantity < th.qty_th
GROUP BY p_brand
"""


# --------------------------------------------------------------------------
# large_orders — TPC-H Q18 shape (HAVING filter, join back to header)
# --------------------------------------------------------------------------

def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total lineitem quantity exceeds 250 (TPC-H Q18's
    large-volume-customer shape). The aggregate side shrinks to a handful
    of keys after the HAVING filter, so AQE turns the join back to the
    order header into a broadcast. sum_qty is a sum of integral doubles —
    bit-exact cross-engine, so the > 250 boundary is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return orders.join(big, orders["o_orderkey"] == big["l_orderkey"]).select(
        "o_orderkey", "o_custkey", "o_totalprice", "sum_qty"
    )


SQL_LARGE_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice, sum_qty
FROM orders
JOIN (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
) big ON o_orderkey = big.l_orderkey
"""


# --------------------------------------------------------------------------
# hourly_activity_spine — calendar-grain zero-fill (T6's wall-clock twin)
# --------------------------------------------------------------------------

# ~11.4 years of hourly slots; driver data spans ~6 days. See the
# builder docstring — a guard rail against corrupt timestamps, mirrored
# verbatim in the oracle.
_MAX_SPINE_HOURS = 100_000


def q_hourly_activity_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hour x event_type grid with zero-filled counts — the
    calendar-grain twin of the reference's slot-index zero-fill
    (operators/align.py, main.py:686-696): reporting spines must show
    silent hours as 0, not as missing rows. The spine is sequence() over
    the min..max hour (one tiny single-row aggregate), cross-joined with
    the distinct types (both broadcast); the only data-sized work is the
    hourly pre-aggregate the spine left-joins against.

    The span is capped to the TRAILING _MAX_SPINE_HOURS hours: one
    corrupt timestamp (year 9999 / 1900) would otherwise make sequence()
    build a ~71M-element array in one task and kill the job. Guard
    semantics, not a feature — quarantine wild timestamps upstream
    (events_time_gate) for a full-fidelity spine."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    lo = F.greatest(
        F.col("lo"), F.col("hi") - F.expr(f"INTERVAL {_MAX_SPINE_HOURS} HOURS")
    )
    spine = bounds.select(
        F.explode(F.sequence(lo, F.col("hi"), F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = ev.select("event_type").distinct()
    daily = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        spine.crossJoin(F.broadcast(types))
        .join(F.broadcast(daily), ["hour", "event_type"], "left")
        .select(
            F.date_format("hour", "yyyy-MM-dd HH:00").alias("hour"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
    )


SQL_HOURLY_SPINE = f"""
WITH b AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events
), spine AS (
  -- trailing-window span cap mirrors the builder's _MAX_SPINE_HOURS guard
  SELECT unnest(generate_series(
    greatest(lo, hi - INTERVAL {_MAX_SPINE_HOURS} HOURS), hi,
    INTERVAL 1 HOUR)) AS hour
  FROM b
), types AS (
  SELECT DISTINCT event_type FROM events
), hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT strftime(hour, '%Y-%m-%d %H:00') AS hour, event_type,
       coalesce(n, 0) AS n_events
FROM spine CROSS JOIN types
LEFT JOIN hourly USING (hour, event_type)
"""


# --------------------------------------------------------------------------
# mom_revenue_change — aggregate-then-window composition
# --------------------------------------------------------------------------

def q_mom_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue deltas: aggregate orders to months, then
    lag() over the (tiny) aggregate — the standard two-stage analytic
    composition. The window runs over ~80 month rows, so the
    SinglePartition sort is a non-issue at any scale (the data-sized work
    is the partial-aggregated month rollup).

    NULL order dates are excluded (no date, no month — the corpus-wide
    time rule): a NULL month key in the lag window is ordered NULLS
    FIRST by Spark and — observed — UNSTABLY by DuckDB's parallel
    window sort (NULLS LAST on most runs, FIRST on others within one
    connection), so keeping it makes the oracle comparison flaky."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    monthly = (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = Window.orderBy("month")
    return (
        monthly.withColumn("prev_rev", F.lag("rev").over(w))
        .filter(F.col("prev_rev").isNotNull())
        .select(
            F.date_format("month", "yyyy-MM").alias("month"),
            F.round("rev", 2).alias("revenue"),
            F.round((F.col("rev") - F.col("prev_rev")) / F.col("prev_rev") * 100, 4)
            .alias("pct_change"),
        )
    )


SQL_MOM_REVENUE = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month, sum(o_totalprice) AS rev
  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
), lagged AS (
  SELECT month, rev, lag(rev) OVER (ORDER BY month) AS prev_rev FROM monthly
)
SELECT strftime(month, '%Y-%m') AS month,
       round(rev, 2) AS revenue,
       round((rev - prev_rev) / prev_rev * 100, 4) AS pct_change
FROM lagged WHERE prev_rev IS NOT NULL
"""


# --------------------------------------------------------------------------
# fuzzy_name_pairs — blocked Levenshtein similarity join (entity resolution)
# --------------------------------------------------------------------------

def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names via edit distance, blocked on
    (p_type, p_size) so the quadratic comparison runs inside small blocks
    (max ~16 members per block at sf0.01) instead of all 2000^2 pairs —
    the classic entity-resolution blocking strategy; at 100 TB the block
    key is the unit of shuffle and no block is bigger than a task.
    levenshtein() is JVM-side; the p_partkey < ordering dedups mirror
    pairs.

    Scale audit (r13, measured at sf1): 300 blocks of ~667 members,
    66M candidate pairs, 9.9M qualifying (15%%) — the entry is
    OUTPUT-bound, not comparison-bound. A/B at sf1: threshold
    levenshtein (banded O(k*n)) and a length-band second blocking key
    (|len diff| > 4 implies distance > 4, so banding at width 9 with
    adjacent-band emission is semantics-free) both measured within
    noise of the plain form because the synthetic names are
    near-uniform length — kept plain. On real corpora with varied
    name lengths the length-band key is the first lever when block
    membership grows past task size.

    ASCII gate (r7): the cross-checked surface is printable-ASCII names
    only — Spark's levenshtein counts CODEPOINTS while DuckDB's counts
    BYTES ('prö' vs 'pro' is 1 vs 2), so unicode edit distance cannot be
    pinned across engines. Non-ASCII names must be transliterated
    upstream (the engine itself handles them fine; this is the oracle
    contract boundary, found by the degenerate-parts sweep). NULL names
    drop out of the <= 4 filter in both engines already. Anchored with
    \\z, not $: Java's $ matches BEFORE a final line terminator while
    RE2's matches only at end of text, so 'name\\n' would pass the Spark
    gate but fail the oracle's."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_type", "p_size"
    ).filter(F.col("p_name").rlike(r"^[\x20-\x7E]*\z"))
    # r13 (guide §2.5 input skew): the part table is ONE input split
    # locally, and with the block side broadcast the whole quadratic
    # levenshtein loop ran on that single scan task. Spread the stream
    # side only (spread_small_scan is a no-op at real scale, where the
    # scan itself provides the splits); the broadcast side stays the raw
    # scan — no spread shuffle on a table that is about to be collected
    # anyway. Measured min-of-3 at sf0.1: 1.02 -> 0.22 s.
    a = spread_small_scan(part, "p_partkey").select(
        F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"),
        "p_type", "p_size",
    )
    b = part.select(
        F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"),
        "p_type", "p_size",
    )
    return (
        a.join(F.broadcast(b), ["p_type", "p_size"])
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("edit_dist") <= 4)
        .select("key_a", "key_b", "edit_dist")
    )


SQL_FUZZY_NAME_PAIRS = """
-- printable-ASCII gate mirrors the Spark side: DuckDB levenshtein is
-- byte-based, Spark's is codepoint-based — unicode names are out of the
-- pinned contract (transliterate upstream)
WITH pt AS (
  SELECT p_partkey, p_name, p_type, p_size FROM part
  WHERE regexp_matches(p_name, '^[\\x20-\\x7E]*\\z')
)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       levenshtein(a.p_name, b.p_name) AS edit_dist
FROM pt a JOIN pt b
  ON a.p_type = b.p_type AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 4
"""


# --------------------------------------------------------------------------
# rolling_time_window — RANGE-frame window over event time
# --------------------------------------------------------------------------

def q_rolling_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity in the preceding hour, per event: a time-based
    RANGE frame (complements rolling_stats' ROWS frames). Both engines
    order the frame by integer epoch seconds (unix_timestamp floor ==
    floor(epoch(ts))), so the 3600-second boundary and peer-row grouping
    are bit-identical despite microsecond timestamps. One hash shuffle on
    user_id; the frame is a running window, never re-aggregated per row.
    NULL-ts events are excluded (no time, no frame position — and a NULL
    window order key is placed UNSTABLY by DuckDB's parallel sort)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 4).alias("sum_1h"),
    )


SQL_ROLLING_TIME_WINDOW = """
SELECT event_id, user_id,
       count(*) OVER w AS n_1h,
       round(sum(value) OVER w, 4) AS sum_1h
FROM events
WHERE ts IS NOT NULL
WINDOW w AS (
  PARTITION BY user_id
  -- trunc, not floor: Spark's unix_timestamp truncates toward zero, so
  -- a PRE-EPOCH fractional second (-0.000001) is key 0 in Spark but
  -- floor would say -1 — the engines diverge on any pre-1970 timestamp
  ORDER BY CAST(trunc(epoch(ts)) AS BIGINT)
  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
)
"""


# --------------------------------------------------------------------------
# event_funnel — ordered-step conversion counts
# --------------------------------------------------------------------------

def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: per user, the first view,
    the first click strictly after it, the first purchase strictly after
    that; emit per-stage converted-user counts. One user-keyed shuffle:
    the three stage timestamps come from conditional aggregation over a
    single grouped pass (min(ts) FILTER per type, then the ordered
    chaining is two scalar comparisons on the one-row-per-user frame) —
    no self-joins, no window cascade. Counts are exact integers, so the
    oracle matches bit-for-bit. NULL-ts events cannot take part in an
    ordered funnel and are excluded (oracle mirrors)."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("v_ts")
    )
    # the first click AFTER the first view needs the conditional min keyed
    # on the view time — a second grouped pass joined back would shuffle
    # twice; instead re-aggregate with the view time broadcast via a join
    # on user_id (both sides already hash-partitioned on user_id -> the
    # second exchange is elided by Catalyst's output-partitioning reuse)
    v = per_user.select("user_id", "v_ts")
    c = (
        events.join(v, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("v_ts")))
        .groupBy("user_id").agg(F.min("ts").alias("c_ts"))
    )
    p = (
        events.join(c, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("c_ts")))
        .groupBy("user_id").agg(F.min("ts").alias("p_ts"))
    )
    stages = per_user.join(c, "user_id", "left").join(p, "user_id", "left")
    # coalesce(.., 0): on an EMPTY relation the global agg emits one row
    # with NULL sums, while the oracle's count(..) emits 0 — the only
    # input where the two differ
    zsum = lambda col, name: F.coalesce(  # noqa: E731
        F.sum(F.col(col).isNotNull().cast("long")), F.lit(0)
    ).alias(name)
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        zsum("v_ts", "viewed"),
        zsum("c_ts", "clicked_after_view"),
        zsum("p_ts", "purchased_after_click"),
    )


SQL_EVENT_FUNNEL = """
WITH ev AS (
  -- no time, no timeline: NULL-ts events take no part in the funnel
  SELECT * FROM events WHERE ts IS NOT NULL
), v AS (
  SELECT user_id, min(ts) AS v_ts FROM ev WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS c_ts
  FROM ev e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.v_ts
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM ev e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
  GROUP BY e.user_id
), u AS (SELECT DISTINCT user_id FROM ev)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST((SELECT count(*) FROM v) AS BIGINT) AS viewed,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS clicked_after_view,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS purchased_after_click
FROM u
"""


# --------------------------------------------------------------------------
# retention_cohorts — first-seen cohort x day-offset matrix
# --------------------------------------------------------------------------

def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity date, counted by
    how many distinct users of each cohort return k days later. Two
    shuffles — the per-user min (user-keyed) and the cohort x offset
    distinct count (cohort-keyed); day offsets capped at 7 to keep the
    matrix narrow."""
    events = load_table(spark, sf_dir, "events")
    first = events.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort")
    )
    acts = events.select("user_id", F.date_trunc("day", "ts").alias("day"))
    j = acts.join(first, "user_id").withColumn(
        "day_offset",
        F.datediff(F.col("day"), F.col("cohort")).cast("long"),
    ).filter(F.col("day_offset") <= 7)
    return (
        j.groupBy(F.date_format("cohort", "yyyy-MM-dd").alias("cohort"), "day_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


SQL_RETENTION = """
WITH first AS (
  SELECT user_id, date_trunc('day', min(ts)) AS cohort FROM events GROUP BY user_id
), acts AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
)
SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort,
       CAST(date_diff('day', f.cohort, a.day) AS BIGINT) AS day_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM acts a JOIN first f USING (user_id)
WHERE date_diff('day', f.cohort, a.day) <= 7
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# bpe_pair_counts — the core BPE-training statistic
# --------------------------------------------------------------------------

from amazon_macie_activity_generator_spark.operators.dedup import (  # noqa: E402
    DUCK_TOKS_SQL as _DUCK_TOKS3,
)


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inner loop of BPE tokenizer training: count every adjacent
    token pair across the corpus and emit the top 20 merge candidates
    (count desc, pair asc tiebreak). Pairs form inside each document's
    token array with arrays_zip(toks, toks[1:]) — no self-join, no
    window: the explode feeds straight into a map-side-combinable count,
    so the shuffle carries (pair, partial_count), and the top-20 is a
    TakeOrdered, not a global sort. At 100 TB this is exactly one
    pair-keyed shuffle per merge iteration."""
    from amazon_macie_activity_generator_spark.operators.dedup import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tokens_expr(F.col("text")).alias("tk"))
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("tk", 1, F.greatest(F.size("tk") - 1, F.lit(0))),
                F.slice("tk", 2, F.greatest(F.size("tk") - 1, F.lit(0))),
            )
        ).alias("p")
    ).select(F.concat_ws(" ", F.col("p")["0"], F.col("p")["1"]).alias("pair"))
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    return (
        counted.orderBy(F.desc("n"), F.asc("pair")).limit(20)
        .withColumn("rank", F.row_number().over(
            Window.orderBy(F.desc("n"), F.asc("pair"))
        ).cast("int"))
    )


SQL_BPE_PAIR_COUNTS = f"""
WITH toks AS (
  SELECT {_DUCK_TOKS3} AS tk FROM documents
), pairs AS (
  SELECT unnest(list_transform(range(1, greatest(len(tk), 1)),
                i -> tk[i] || ' ' || tk[i + 1])) AS pair
  FROM toks
), counted AS (
  SELECT pair, count(*) AS n FROM pairs GROUP BY pair
)
SELECT pair, n, CAST(row_number() OVER (ORDER BY n DESC, pair) AS INT) AS rank
FROM counted
ORDER BY n DESC, pair
LIMIT 20
"""


# --------------------------------------------------------------------------
# mix_sampling_weights — domain reweighting for training mixtures
# --------------------------------------------------------------------------

def q_mix_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per source, the upsample factor that
    balances every domain to the largest one (epochs_per_source =
    max_domain_tokens / domain_tokens — the standard oversampling rule
    when a mixture spec wants under-represented domains repeated).
    Deterministic cross-engine: token counts are exact integers, the max
    is exact, and the only FP op is one int/int division per group —
    no order-dependent double summation anywhere."""
    from amazon_macie_activity_generator_spark.operators.text import token_count_ws

    docs = load_table(spark, sf_dir, "documents")
    per_src = (
        docs.select("source", token_count_ws(F.col("text")).alias("n_tok"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )
    mx = per_src.agg(F.max("n_tokens").alias("mx"))
    return (
        per_src.crossJoin(F.broadcast(mx))
        .select(
            "source", "n_docs", "n_tokens",
            F.round(F.col("mx") / F.col("n_tokens"), 6).alias("upsample_factor"),
        )
    )


SQL_MIX_SAMPLING_WEIGHTS = f"""
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len({_DUCK_TOKS3})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
)
SELECT source, n_docs, n_tokens,
       round((SELECT max(n_tokens) FROM per_src) / CAST(n_tokens AS DOUBLE), 6)
         AS upsample_factor
FROM per_src
"""


# --------------------------------------------------------------------------
# winnowing_fingerprint — MOSS-style robust document fingerprints
# --------------------------------------------------------------------------

_WIN_K = 5   # k-gram length
_WIN_W = 4   # winnowing window


def q_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (Schleimer/Wilkerson/Aiken '03): hash every token
    k-gram, slide a w-hash window, keep each window's minimum — the
    guarantee is any shared substring of length >= w+k-1 yields at least
    one shared fingerprint, at ~1/w the storage of all-grams. Hash is
    md5 (deterministic cross-engine, like doc_fingerprint); the window
    min is a bounded ROWS frame over the in-document gram order — one
    doc-keyed shuffle, no self-join. Output: distinct (doc_id,
    fingerprint) pairs, the near-dup index a plagiarism/contamination
    checker would build at corpus scale."""
    from amazon_macie_activity_generator_spark.operators.dedup import tokens_expr

    # r13 (guide §2.5 input skew): the md5-per-gram transform runs in the
    # scan stage, which is ONE task locally (single-split parquet) — the
    # spread is a no-op at real scale and unlocks all cores here.
    # Measured min-of-3 at sf0.1: 1.14 -> 0.32 s.
    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    toks = docs.select("doc_id", tokens_expr(F.col("text")).alias("tk"))
    n_grams = F.size("tk") - (_WIN_K - 1)
    # sequence(1, 0) yields the DESCENDING [1, 0] and slice(tk, 0, k) is an
    # illegal start index — a doc with < k tokens must produce an empty
    # gram array, not crash the job (the oracle's range() already does)
    gram_hashes = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.md5(F.concat_ws(" ", F.slice("tk", i, _WIN_K))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = toks.select("doc_id", F.posexplode(gram_hashes).alias("pos", "h"))
    w = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(0, _WIN_W - 1)
    )
    return (
        grams.withColumn("fp", F.min("h").over(w))
        .select("doc_id", F.col("fp").alias("fingerprint"))
        .distinct()
    )


SQL_WINNOWING = f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS3} AS tk FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(tk) - {_WIN_K - 2}, 1)),
                i -> md5(coalesce(array_to_string(list_slice(tk, i, i + {_WIN_K - 1}), ' '), '')))) AS h,
         unnest(range(1, greatest(len(tk) - {_WIN_K - 2}, 1))) AS pos
  FROM toks
)
SELECT DISTINCT doc_id,
       min(h) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING) AS fingerprint
FROM grams
"""


# --------------------------------------------------------------------------
# streaming_left_join — watermarked LEFT OUTER stream-stream join
# --------------------------------------------------------------------------

def q_streaming_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer stream-stream funnel join: every click, matched to the
    purchases that follow within 1 hour for the same user; clicks with no
    purchase emit a null-padded row once the watermark proves no match
    can still arrive. The subtlety the oracle must state: the global
    watermark is the MINIMUM over both sides' watermark nodes, and each
    side computes it from its own post-filter max event time — so a
    click's outer row emits iff click_ts + 1h <= least(max click ts, max
    purchase ts) - 2h, not max(ts) overall. availableNow's final no-data
    microbatch advances the watermark and flushes the evicted state.
    Nulls are coalesced to -1 (with a `matched` flag) so both engines
    hash identically. Inner twin: queries_ext2.q_streaming_join."""
    import os
    import shutil
    import tempfile
    import uuid

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="amag_lojoin_")
    try:
        src = os.path.join(work, "src")
        events.write.parquet(src)

        def side(event_type: str, prefix: str) -> DataFrame:
            return (
                spark.readStream.schema(events.schema).parquet(src)
                .filter(F.col("event_type") == event_type)
                .select(
                    F.col("user_id").alias(f"{prefix}_user"),
                    F.col("event_id").alias(f"{prefix}_id"),
                    F.col("ts").alias(f"{prefix}_ts"),
                )
                .withWatermark(f"{prefix}_ts", "2 hours")
            )

        clicks, buys = side("click", "c"), side("purchase", "p")
        joined = clicks.join(
            buys,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
            "left_outer",
        )
        name = "lojoin_" + uuid.uuid4().hex[:8]
        q = (
            joined.select(
                F.col("c_user").alias("user_id"),
                F.col("c_id").alias("click_id"),
                F.coalesce(F.col("p_id"), F.lit(-1)).alias("purchase_id"),
                F.col("p_id").isNotNull().alias("matched"),
            )
            .writeStream.format("memory").queryName(name).outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(300)
        if q.isActive:
            q.stop()
    finally:
        # the memory sink holds the drained rows; the parquet copy and
        # checkpoint are dead weight once the query terminates
        shutil.rmtree(work, ignore_errors=True)
    return spark.table(name)


SQL_STREAMING_LEFT_JOIN = """
WITH c AS (
  SELECT user_id, event_id AS cid, ts AS cts FROM events WHERE event_type = 'click'
), p AS (
  SELECT user_id, event_id AS pid, ts AS pts FROM events WHERE event_type = 'purchase'
), wm AS (
  -- Spark's watermark tracker advances at millisecond precision, so the
  -- oracle truncates each side's max event time to ms before taking the
  -- min-across-sides global watermark.
  SELECT least((SELECT date_trunc('milliseconds', max(cts)) FROM c),
               (SELECT date_trunc('milliseconds', max(pts)) FROM p))
         - INTERVAL 2 HOUR AS w
)
SELECT c.user_id, c.cid AS click_id, p.pid AS purchase_id, TRUE AS matched
FROM c JOIN p
  ON c.user_id = p.user_id AND p.pts >= c.cts AND p.pts < c.cts + INTERVAL 1 HOUR
UNION ALL
SELECT c.user_id, c.cid, -1, FALSE
FROM c, wm
WHERE c.cts + INTERVAL 1 HOUR <= wm.w
  AND NOT EXISTS (
    SELECT 1 FROM p
    WHERE p.user_id = c.user_id AND p.pts >= c.cts AND p.pts < c.cts + INTERVAL 1 HOUR
  )
"""


# --------------------------------------------------------------------------
# dedup_incremental — new batch vs existing corpus (no self-join)
# --------------------------------------------------------------------------

def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash dedup (operators/dedup.py:dedup_incremental_md5):
    documents = the indexed corpus; the batch mixes true near-dups (every
    doc_id % 100 == 0 reappears at +1000000 with two extra tokens) with
    genuinely new docs (every doc_id % 100 == 50 at +2000000 with the
    token order reversed — same vocabulary, different shingles). The full
    md5-LSH path (signature -> bands -> asymmetric bucket join -> exact
    Jaccard verify -> per-doc argmax) value-hash-checks cross-engine."""
    from amazon_macie_activity_generator_spark.operators.dedup import (
        dedup_incremental_md5,
        tokens_expr,
    )

    docs = load_table(spark, sf_dir, "documents")
    # spread the corpus across cores (r13, the _docs/_emb rule): the
    # 16-hash md5 signature projection is the CPU cost and the table
    # arrives as one input split locally; the (small) batch side stays
    # on the raw scan — it is broadcast everywhere downstream
    corpus = docs.select("doc_id", "text").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    near = docs.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" near duplicate")).alias("text"),
    )
    fresh = docs.filter(F.col("doc_id") % 100 == 50).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat_ws(" ", F.reverse(tokens_expr(F.col("text")))).alias("text"),
    )
    return dedup_incremental_md5(corpus, near.unionByName(fresh), jaccard_threshold=0.7)


def _sql_dedup_incremental() -> str:
    from amazon_macie_activity_generator_spark.queries_ext import (
        _DUCK_3GRAMS,
        _DUCK_JAC,
        _DUCK_TOKS,
    )

    sig = (
        "list_transform(generate_series(0, 15), "
        "j -> list_aggregate(list_transform(g, s -> md5(CAST(j AS VARCHAR) || ':' || s)), 'min'))"
    )
    bnd = "md5(array_to_string(sig[b.b * 4 + 1 : b.b * 4 + 4], '|'))"
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
batch AS (
  SELECT doc_id + 1000000 AS doc_id, text || ' near duplicate' AS text
  FROM documents WHERE doc_id % 100 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         coalesce(array_to_string(list_reverse({_DUCK_TOKS}), ' '), '') AS text
  FROM documents WHERE doc_id % 100 = 50
),
ctok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM corpus),
cg AS (SELECT doc_id, {_DUCK_3GRAMS} AS g FROM ctok),
csig AS (SELECT doc_id, g, {sig} AS sig FROM cg),
cbands AS (SELECT doc_id, b.b AS band, {bnd} AS bh FROM csig, range(0, 4) AS b(b)),
btok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM batch),
bg AS (SELECT doc_id, {_DUCK_3GRAMS} AS g FROM btok),
bsig AS (SELECT doc_id, g, {sig} AS sig FROM bg),
bbands AS (SELECT doc_id, b.b AS band, {bnd} AS bh FROM bsig, range(0, 4) AS b(b)),
cand AS (
  SELECT DISTINCT bb.doc_id AS bid, cb.doc_id AS cid
  FROM bbands bb JOIN cbands cb ON bb.band = cb.band AND bb.bh = cb.bh
),
ver AS (
  SELECT cand.bid, cand.cid, {_DUCK_JAC} AS jaccard
  FROM cand JOIN bg a ON a.doc_id = cand.bid JOIN cg b2 ON b2.doc_id = cand.cid
),
best AS (
  SELECT bid, cid, jaccard,
         row_number() OVER (PARTITION BY bid ORDER BY jaccard DESC, cid) AS rk
  FROM ver WHERE jaccard >= 0.7
)
SELECT b.doc_id,
       coalesce(best.cid, -1) AS dup_of,
       coalesce(best.jaccard, 0.0) AS jaccard,
       best.cid IS NULL AS is_new
FROM batch b LEFT JOIN best ON best.bid = b.doc_id AND best.rk = 1
"""


# --------------------------------------------------------------------------
# dedup_keep_best — representative selection per near-dup group
# --------------------------------------------------------------------------

def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative selection — the step AFTER group resolution in a
    real dedup pipeline (C4/RefinedWeb-style: keep one member per
    duplicate cluster): for every near-dup group keep exactly one
    document (longest text, doc_id tie-break); ungrouped documents pass
    through as keep=true singletons.

    Scale shape: the argmax aggregate and the keep-decision join run
    ONLY on the grouped subset — a few percent of the corpus at real
    near-dup rates — and the group table joins back onto the corpus as
    a broadcast; the full corpus is never windowed or shuffled on a
    group key. Output: (doc_id, group_id, keep) for the whole augmented
    corpus."""
    from amazon_macie_activity_generator_spark.queries_ext import _docs_aug, q_dedup_groups

    corpus = _docs_aug(spark, sf_dir).select("doc_id", "n_chars")
    groups = q_dedup_groups(spark, sf_dir)  # (doc_id, group_id), grouped docs only
    members = groups.join(corpus, "doc_id")
    # argmax by (n_chars DESC, doc_id ASC) via lexicographic struct min —
    # one map-side-combinable agg over the tiny grouped subset
    best = (
        members.groupBy("group_id")
        .agg(F.min(F.struct((-F.col("n_chars")).alias("neg"), F.col("doc_id").alias("d"))).alias("b"))
        .select("group_id", F.col("b.d").alias("kept_doc"))
    )
    decided = groups.join(best, "group_id").select(
        "doc_id", "group_id", (F.col("doc_id") == F.col("kept_doc")).alias("keep")
    )
    singles = corpus.join(groups.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id", F.col("doc_id").alias("group_id"), F.lit(True).alias("keep")
    )
    return decided.unionByName(singles)


SQL_DEDUP_KEEP_BEST = """
WITH groups AS ({groups_sql}),
aug AS ({aug_sql}),
members AS (
  SELECT g.doc_id, g.group_id, a.n_chars FROM groups g JOIN aug a USING (doc_id)
),
best AS (
  SELECT group_id, doc_id AS kept_doc FROM (
    SELECT group_id, doc_id,
           row_number() OVER (PARTITION BY group_id ORDER BY n_chars DESC, doc_id) AS rk
    FROM members
  ) WHERE rk = 1
)
SELECT m.doc_id, m.group_id, m.doc_id = b.kept_doc AS keep
FROM members m JOIN best b USING (group_id)
UNION ALL
SELECT a.doc_id, a.doc_id AS group_id, TRUE AS keep
FROM aug a ANTI JOIN groups g ON a.doc_id = g.doc_id
"""


def _sql_dedup_keep_best() -> str:
    from amazon_macie_activity_generator_spark.queries_ext import (
        _DUCK_DOCS_AUG,
        SQL_DEDUP_GROUPS,
    )

    return SQL_DEDUP_KEEP_BEST.format(groups_sql=SQL_DEDUP_GROUPS, aug_sql=_DUCK_DOCS_AUG)


EXT3_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "event_gaps": (q_event_gaps, SQL_EVENT_GAPS),
    "char_entropy": (q_char_entropy, SQL_CHAR_ENTROPY),
    "small_qty_revenue": (q_small_qty_revenue, SQL_SMALL_QTY_REVENUE),
    "large_orders": (q_large_orders, SQL_LARGE_ORDERS),
    "hourly_activity_spine": (q_hourly_activity_spine, SQL_HOURLY_SPINE),
    "mom_revenue_change": (q_mom_revenue_change, SQL_MOM_REVENUE),
    "fuzzy_name_pairs": (q_fuzzy_name_pairs, SQL_FUZZY_NAME_PAIRS),
    "rolling_time_window": (q_rolling_time_window, SQL_ROLLING_TIME_WINDOW),
    "event_funnel": (q_event_funnel, SQL_EVENT_FUNNEL),
    "retention_cohorts": (q_retention_cohorts, SQL_RETENTION),
    "bpe_pair_counts": (q_bpe_pair_counts, SQL_BPE_PAIR_COUNTS),
    "mix_sampling_weights": (q_mix_sampling_weights, SQL_MIX_SAMPLING_WEIGHTS),
    "winnowing_fingerprint": (q_winnowing_fingerprint, SQL_WINNOWING),
    "streaming_left_join": (q_streaming_left_join, SQL_STREAMING_LEFT_JOIN),
    "dedup_keep_best": (q_dedup_keep_best, _sql_dedup_keep_best()),
    "dedup_incremental": (q_dedup_incremental, _sql_dedup_incremental()),
}
