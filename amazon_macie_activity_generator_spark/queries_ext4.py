"""Fourth extension catalog: sequence modeling, language-model statistics,
asymmetric dedup, and categorical-association shapes.

The reference (/root/reference/src/main.py) is a time-series activity
generator with none of this surface; these extend SURVEY.md §2.8's
north-star set with the remaining operations a large-scale training-data
pipeline runs:

- ``markov_transitions``  per-user event-type transition matrix (counts +
  conditional probabilities) — the next-event model behind clickstream
  prediction and synthetic-sequence generation.
- ``session_paths``       top entry paths (first three event types per
  user, in time order) — the classic clickstream path-analysis rollup.
- ``ntile_bins``          equi-DEPTH value histogram per event type via
  ntile(4) (complements ``value_histogram``'s equi-WIDTH binning).
- ``pmi_collocations``    corpus-wide adjacent-pair PMI — the standard
  collocation / multiword-expression extractor over token streams.
- ``bigram_logprob``      per-document mean bigram log-likelihood under an
  add-one-smoothed corpus bigram LM — the fluency/quality score that
  upgrades ``unigram_logprob`` with sequence context.
- ``dedup_containment``   asymmetric near-dup: shingle CONTAINMENT
  |A∩B|/|A| (Broder '97's other resemblance measure) — catches quotes /
  subset documents that symmetric Jaccard misses.
- ``chi2_source_lang``    per-source chi-squared association against the
  corpus language distribution — the categorical drift / balance check
  run before fixing a training mixture.
- ``copurchase_pairs``    item-item co-occurrence (parts sharing an
  order) — the graph-projection rollup behind co-click / co-purchase
  recommenders.

Same contract as queries.py: name -> (spark_builder, duckdb_sql | None).

Scale notes (local[32] tests, 1000-executor design):
- ``markov_transitions`` / ``session_paths``: one hash shuffle on
  user_id, in-partition sort, then a tiny (|types|^2- or path-keyed)
  map-side-combinable count. No global sort; the per-user window never
  sees more than one user's rows.
- ``pmi_collocations`` / ``bigram_logprob``: pair and unigram counts are
  map-side-combinable aggregations (shuffle carries partial counts, not
  tokens); the LM join keys on (w1, w2) — at 100 TB both sides hash on
  the pair key once, and the scalar totals (token count, vocab size)
  ride along as broadcast one-row frames, never a driver collect.
- ``dedup_containment``: inverted-index bucket join on the shingle key —
  candidate pairs only ever form inside one shingle's posting list, never
  an all-pairs product. A document-frequency cap on the posting lists
  (df <= 1000 here) bounds the worst list so one boilerplate shingle
  cannot quadratically explode a partition; AQE skew-join covers the
  rest.
- ``chi2_source_lang``: two grouped counts plus a margins join on tiny
  (source x lang) frames — broadcast all the way.
- ``copurchase_pairs``: pairs explode in-task from each order's sorted
  distinct-part set (one order-keyed shuffle, no self-join — r13); pair
  fan-out is bounded by max order width (7 lineitems in TPC-H-ish data),
  keeping generation linear in lineitem count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from amazon_macie_activity_generator_spark.cache import begin_scope, scoped_persist
from amazon_macie_activity_generator_spark.operators.dedup import (
    tokens_expr,
    word_shingles_expr,
)
from amazon_macie_activity_generator_spark.sources.tables import load_table, spread_small_scan

from amazon_macie_activity_generator_spark.operators.dedup import (  # noqa: E402
    DUCK_TOKS_SQL as _DUCK_TOKS4,
)


# --------------------------------------------------------------------------
# markov_transitions — next-event transition matrix
# --------------------------------------------------------------------------

def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition counts and conditional probabilities over
    each user's time-ordered event sequence ((ts, event_id) is a total
    order, so lag() is deterministic). The result is |types|^2 rows at
    most: the user-keyed window shuffle dominates and the count is
    map-side combinable; prob denominators come from a window over the
    tiny counted frame, not a second pass over events."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # no time, no timeline: NULL-ts events are excluded (oracle mirrors)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("prob"),
    )


SQL_MARKOV_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events WHERE ts IS NOT NULL
), trans AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       round(n / sum(n) OVER (PARTITION BY prev_type), 6) AS prob
FROM trans
"""


# --------------------------------------------------------------------------
# session_paths — top entry paths (first three events per user)
# --------------------------------------------------------------------------

def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-three-event paths: each user's first three event types in
    (ts, event_id) order, joined with '>' into a path string, counted
    across users. Users with fewer than three events are excluded (their
    truncated paths would conflate with genuine short journeys). The
    rank-3 filter happens before the path shuffle, so the count stage
    sees three rows per user, not the full event history."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # no time, no timeline: NULL-ts events are excluded (oracle mirrors)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first3 = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
    paths = (
        first3.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.concat_ws(
                ">",
                F.max(F.when(F.col("rn") == 1, F.col("event_type"))),
                F.max(F.when(F.col("rn") == 2, F.col("event_type"))),
                F.max(F.when(F.col("rn") == 3, F.col("event_type"))),
            ).alias("path"),
        )
        .filter(F.col("k") == 3)
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(20)
    )


SQL_SESSION_PATHS = """
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE ts IS NOT NULL
), first3 AS (
  SELECT user_id,
         count(*) AS k,
         max(CASE WHEN rn = 1 THEN event_type END) || '>' ||
         max(CASE WHEN rn = 2 THEN event_type END) || '>' ||
         max(CASE WHEN rn = 3 THEN event_type END) AS path
  FROM ranked WHERE rn <= 3
  GROUP BY user_id
)
SELECT path, count(*) AS n_users
FROM first3 WHERE k = 3
GROUP BY path
ORDER BY n_users DESC, path
LIMIT 20
"""


# --------------------------------------------------------------------------
# ntile_bins — equi-depth histogram per event type
# --------------------------------------------------------------------------

def q_ntile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth quartiles of ``value`` per event type: ntile(4) over the
    total order (value, event_id) — the tiebreak makes bin assignment
    deterministic and identical across engines (both implement SQL ntile's
    floor/remainder split). Per-bin stats are exact except the mean, which
    is rounded to 6 dp to absorb summation-order jitter. NULL values are
    excluded before binning (a quantile of NULL is meaningless, and the
    engines default to opposite NULL placement in ORDER BY — Spark first,
    DuckDB last)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.filter(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
        .withColumn("bin", F.ntile(4).over(w))
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
            F.round(F.avg("value"), 6).alias("mean_value"),
        )
    )


SQL_NTILE_BINS = """
SELECT event_type, bin, count(*) AS n,
       round(min(value), 6) AS lo,
       round(max(value), 6) AS hi,
       round(avg(value), 6) AS mean_value
FROM (
  SELECT event_type, value,
         CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id)
              AS INT) AS bin
  FROM events WHERE value IS NOT NULL
)
GROUP BY event_type, bin
"""


# --------------------------------------------------------------------------
# pmi_collocations — pointwise mutual information of adjacent pairs
# --------------------------------------------------------------------------

def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by PMI over adjacent token pairs:
    pmi(x,y) = ln( (n_xy / N_bi) / ((n_x / N_uni) * (n_y / N_uni)) )
    with a min-count floor of 3 to suppress noise. All counts are exact
    integers; the division/log chain is written with the same operation
    order in both engines and rounded to 6 dp, and the final ordering
    keys on the ROUNDED pmi (then pair) so near-equal doubles cannot
    reorder across engines. Unigram counts join onto the pair counts by
    token key (two hash joins); the two scalar totals ride as broadcast
    one-row frames."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(tokens_expr(F.col("text")).alias("tk"))
    # inline generator child (r13): see q_bigram_logprob — exploding the
    # projected attribute re-tokenized the corpus inside an inferred
    # `size(tk) > 0` filter, once per copy of this subtree (three in the
    # final plan: the two unigram joins and the total).
    uni = (
        docs.select(F.explode(tokens_expr(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("nw"))
    )
    n_uni = uni.agg(F.sum("nw").alias("n_uni"))
    pairs = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("tk", 1, F.greatest(F.size("tk") - 1, F.lit(0))),
                F.slice("tk", 2, F.greatest(F.size("tk") - 1, F.lit(0))),
            )
        ).alias("p")
    ).select(F.col("p")["0"].alias("w1"), F.col("p")["1"].alias("w2"))
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("nxy"))
    n_bi = big.agg(F.sum("nxy").alias("n_bi"))
    joined = (
        big.filter(F.col("nxy") >= 3)
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("nw", "n1"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("nw", "n2"), "w2")
        .crossJoin(F.broadcast(n_bi))
        .crossJoin(F.broadcast(n_uni))
    )
    pmi = F.round(
        F.log(
            (F.col("nxy").cast("double") / F.col("n_bi"))
            / (
                (F.col("n1").cast("double") / F.col("n_uni"))
                * (F.col("n2").cast("double") / F.col("n_uni"))
            )
        ),
        6,
    )
    return (
        joined.select(
            F.concat_ws(" ", "w1", "w2").alias("pair"),
            F.col("nxy").alias("n"),
            pmi.alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("pair"))
        .limit(20)
    )


SQL_PMI_COLLOCATIONS = f"""
WITH toks AS (
  SELECT {_DUCK_TOKS4} AS tk FROM documents
), uni AS (
  SELECT unnest(tk) AS w FROM toks
), ucnt AS (
  SELECT w, count(*) AS nw FROM uni GROUP BY w
), totals_u AS (SELECT sum(nw) AS n_uni FROM ucnt),
pairs AS (
  SELECT unnest(list_transform(range(1, greatest(len(tk), 1)),
                i -> [tk[i], tk[i + 1]])) AS p
  FROM toks
), bcnt AS (
  SELECT p[1] AS w1, p[2] AS w2, count(*) AS nxy FROM pairs GROUP BY 1, 2
), totals_b AS (SELECT sum(nxy) AS n_bi FROM bcnt)
SELECT b.w1 || ' ' || b.w2 AS pair, b.nxy AS n,
       round(ln((CAST(b.nxy AS DOUBLE) / tb.n_bi)
                / ((CAST(u1.nw AS DOUBLE) / tu.n_uni)
                   * (CAST(u2.nw AS DOUBLE) / tu.n_uni))), 6) AS pmi
FROM bcnt b
JOIN ucnt u1 ON b.w1 = u1.w
JOIN ucnt u2 ON b.w2 = u2.w
CROSS JOIN totals_b tb CROSS JOIN totals_u tu
WHERE b.nxy >= 3
ORDER BY pmi DESC, pair
LIMIT 20
"""


# --------------------------------------------------------------------------
# bigram_logprob — per-document fluency under a corpus bigram LM
# --------------------------------------------------------------------------

def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean add-one-smoothed bigram log-likelihood per document:
    logp(w2 | w1) = ln((c(w1,w2) + 1) / (c(w1) + V)), averaged over the
    document's bigrams. c(.) are corpus-wide exact integer counts and V
    is the vocabulary size, so the only FP is the per-bigram ln and the
    final mean (rounded to 6 dp — the ~150-term sum's order jitter is
    ~1e-13). Per-doc bigrams join the LM tables on (w1,w2) and w1 — the
    same two hash joins a 100 TB scoring pass would run; V and nothing
    else is broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_expr(F.col("text")).alias("tk"))
    doc_bi = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("tk", 1, F.greatest(F.size("tk") - 1, F.lit(0))),
                F.slice("tk", 2, F.greatest(F.size("tk") - 1, F.lit(0))),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p")["0"].alias("w1"), F.col("p")["1"].alias("w2"))
    big = doc_bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    # explode the tokenize expression INLINE (r13, guide §2.4): exploding
    # the projected `tk` attribute lets InferFiltersFromGenerate add
    # `size(tk) > 0 AND isnotnull(tk)` below the Generate, and pushdown
    # then inlines the whole tokenize expression into that filter — the
    # unigram branch tokenized every document twice (plan-verified). With
    # the expression as the generator child the rule does not fire;
    # explode drops empty arrays anyway, so the rows are identical.
    uni = (
        docs.select(F.explode(tokens_expr(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    scored = (
        doc_bi.join(big, ["w1", "w2"])
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "lp",
            F.log(
                (F.col("c2") + 1).cast("double") / (F.col("c1") + F.col("v"))
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        )
    )


SQL_BIGRAM_LOGPROB = f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS4} AS tk FROM documents
), doc_bi AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(tk), 1)),
                i -> [tk[i], tk[i + 1]])) AS p
  FROM toks
), db AS (
  SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM doc_bi
), bcnt AS (
  SELECT w1, w2, count(*) AS c2 FROM db GROUP BY 1, 2
), ucnt AS (
  SELECT w, count(*) AS c1
  FROM (SELECT unnest(tk) AS w FROM toks) GROUP BY w
), vocab AS (SELECT count(*) AS v FROM ucnt)
SELECT d.doc_id, count(*) AS n_bigrams,
       round(avg(ln(CAST(b.c2 + 1 AS DOUBLE) / (u.c1 + vocab.v))), 6)
         AS avg_logprob
FROM db d
JOIN bcnt b ON d.w1 = b.w1 AND d.w2 = b.w2
JOIN ucnt u ON d.w1 = u.w
CROSS JOIN vocab
GROUP BY d.doc_id
"""


# --------------------------------------------------------------------------
# dedup_containment — asymmetric shingle containment
# --------------------------------------------------------------------------

def q_dedup_containment(
    spark: SparkSession, sf_dir: str, df_cap: int = 1000, heavy_df: int = 64
) -> DataFrame:
    """Containment near-dup detection: for document pairs sharing at
    least one distinct 3-word shingle, containment =
    max(|A ∩ B| / |A|, |A ∩ B| / |B|), keeping pairs >= 0.8 — the
    SYMMETRIZED asymmetric measure, so a subset document is caught
    regardless of which side carries the smaller doc_id (one-directional
    shared/|A| with A = lower id misses a contained doc whose id is the
    larger of the pair). Candidates come from gathered posting lists:
    ONE g-keyed ``sort_array(collect_list(doc_id))`` aggregation, capped
    at df <= 1000 (boilerplate-shingle guard), with light pairs
    (df <= 64) exploding in-task over the sorted list — no join. Grams
    with df > 64 go through a two-sided SALTED pair join — each posting
    list is split into S=8 hash buckets and pairs form per
    (g, salt_a, salt_b) cell, so the worst task builds (1000/8)^2 ≈ 16k
    pairs instead of ~500k from one 1000-df shingle. Pair set identical
    to the plain inverted-index self-join; counts are exact integers;
    the divisions are rounded to 6 dp."""
    # spread the one-input-split table across cores (r13, the _docs
    # rule): tokenize + shingle explode is the CPU cost and otherwise
    # runs entirely on the scan's single task
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    # distinct (doc_id, g) pairs come from array_distinct BEFORE the
    # explode — in-task, zero shuffle (r13; the old dropDuplicates form
    # paid a (doc_id, g)-keyed exchange of the full gram table)
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles_expr(F.col("text"), 3))).alias("g"),
    )
    # r13 (guide §2.4): gather the posting list per shingle with ONE
    # g-keyed aggregation — df IS size(ds), so the old separate df
    # aggregate and the df join back onto the gram table are gone, and
    # light pairs explode in-task over the sorted list (the
    # _banded_self_pairs construction) instead of a two-sided self-join.
    # Persist barrier: the gathered table feeds the size table, the
    # light explode, and both salted heavy sides.
    # df semantics pinned to the oracle: its DISTINCT collapses ALL
    # NULL-id rows of a gram into ONE row (NULLs compare equal there),
    # which the df cap then counts. collect_list drops NULLs, so count
    # that one row back explicitly — a NULL-id doc never pairs
    # (NULL < x is NULL) and never matches the size joins, but it must
    # push a gram over the 1000 cap exactly as the oracle's count(*)
    # does. No-op on NULL-id-free corpora.
    begin_scope("dedup_containment", spark)
    grouped = scoped_persist(
        grams.groupBy("g")
        .agg(
            F.sort_array(F.collect_list("doc_id")).alias("ds"),
            F.max(F.col("doc_id").isNull().cast("int")).alias("null_doc"),
        )
        .filter(F.size("ds") + F.col("null_doc") <= df_cap)
        .select("g", "ds"),
        "dedup_containment",
    )
    sizes = (
        grouped.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    n_salt = 8
    light_pairs = (
        grouped.filter(F.size("ds") <= heavy_df)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ds, (x, i) -> "
                    "transform(slice(ds, i + 2, size(ds)), "
                    "y -> struct(x AS da, y AS db))))"
                )
            ).alias("pr")
        )
        .select("pr.da", "pr.db")
    )
    # heavy grams (64 < df <= 1000) keep the two-sided salted join: a
    # single 1000-df gram would otherwise form its ~500k pairs in one
    # task; the salt splits it into n_salt^2 cells exactly as before
    heavy = grouped.filter(F.size("ds") > heavy_df).select(
        "g", F.explode("ds").alias("doc_id")
    )

    def _salt(c):
        return F.pmod(F.xxhash64(c, F.lit("containment-salt")), F.lit(n_salt)).cast("int")

    fan = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ha = (
        heavy.select(F.col("doc_id").alias("da"), "g")
        .withColumn("sa", _salt(F.col("da")))
        .withColumn("sb", fan)
    )
    hb = (
        heavy.select(F.col("doc_id").alias("db"), "g")
        .withColumn("sb", _salt(F.col("db")))
        .withColumn("sa", fan)
    )
    heavy_pairs = (
        ha.join(hb, ["g", "sa", "sb"])
        .filter(F.col("da") < F.col("db"))
        .select("da", "db")
    )
    shared = (
        light_pairs.unionAll(heavy_pairs)
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    containment = F.round(
        F.greatest(
            F.col("shared") / F.col("sz_a"), F.col("shared") / F.col("sz_b")
        ),
        6,
    )
    return (
        shared.join(sizes.select(F.col("doc_id").alias("da"), F.col("sz").alias("sz_a")), "da")
        .join(sizes.select(F.col("doc_id").alias("db"), F.col("sz").alias("sz_b")), "db")
        .select("da", "db", "shared", containment.alias("containment"))
        .filter(F.col("containment") >= 0.8)
    )


SQL_DEDUP_CONTAINMENT = f"""
WITH toks AS (
  -- NULL text ≡ empty text (Spark's shingle path folds both to the ''
  -- shingle); without the coalesce the NULL doc vanishes through unnest
  SELECT doc_id, coalesce({_DUCK_TOKS4}, []) AS tk FROM documents
), grams AS (
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN len(tk) < 3 THEN [coalesce(array_to_string(tk, ' '), '')]
                ELSE list_transform(range(1, len(tk) - 1),
                     i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])
                END) AS g
  FROM toks
), capped AS (
  SELECT g FROM (SELECT g, count(*) AS df FROM grams GROUP BY g)
  WHERE df <= 1000
), sh AS (
  SELECT grams.doc_id, grams.g FROM grams JOIN capped USING (g)
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), shared AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT s.da, s.db, s.shared,
       round(greatest(s.shared / za.sz, s.shared / zb.sz), 6) AS containment
FROM shared s
JOIN sizes za ON s.da = za.doc_id
JOIN sizes zb ON s.db = zb.doc_id
WHERE round(greatest(s.shared / za.sz, s.shared / zb.sz), 6) >= 0.8
"""


# --------------------------------------------------------------------------
# chi2_source_lang — categorical association / mixture drift
# --------------------------------------------------------------------------

def q_chi2_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared statistic per source against the corpus-wide language
    distribution: over the full (source x lang) grid (zero-count cells
    included — they still contribute E to the statistic),
    chi2 = sum((O - E)^2 / E) with E = src_total * lang_total / N.
    Margins and the grid are tiny aggregates of one corpus scan —
    broadcast joins all the way; counts are exact and the statistic is
    rounded to 6 dp."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("o"))
    src_tot = cells.groupBy("source").agg(F.sum("o").alias("st"))
    lang_tot = cells.groupBy("lang").agg(F.sum("o").alias("lt"))
    n = cells.agg(F.sum("o").alias("nn"))
    grid = (
        src_tot.crossJoin(F.broadcast(lang_tot))
        .join(cells, ["source", "lang"], "left")
        .crossJoin(F.broadcast(n))
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
        .withColumn("e", F.col("st").cast("double") * F.col("lt") / F.col("nn"))
    )
    return (
        grid.groupBy("source")
        .agg(
            F.max("st").alias("n_docs"),
            F.round(
                F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")),
                6,
            ).alias("chi2"),
            (F.count(F.lit(1)) - 1).alias("dof"),
        )
    )


SQL_CHI2_SOURCE_LANG = """
WITH cells AS (
  SELECT source, lang, count(*) AS o FROM documents GROUP BY 1, 2
), st AS (SELECT source, sum(o) AS st FROM cells GROUP BY 1),
lt AS (SELECT lang, sum(o) AS lt FROM cells GROUP BY 1),
n AS (SELECT sum(o) AS nn FROM cells),
grid AS (
  SELECT st.source, lt.lang, st.st, lt.lt,
         coalesce(c.o, 0) AS o,
         CAST(st.st AS DOUBLE) * lt.lt / n.nn AS e
  FROM st CROSS JOIN lt
  LEFT JOIN cells c ON c.source = st.source AND c.lang = lt.lang
  CROSS JOIN n
)
SELECT source, CAST(max(st) AS BIGINT) AS n_docs,
       round(sum((o - e) * (o - e) / e), 6) AS chi2,
       count(*) - 1 AS dof
FROM grid
GROUP BY source
"""


# --------------------------------------------------------------------------
# copurchase_pairs — item-item co-occurrence graph projection
# --------------------------------------------------------------------------

def _order_part_pairs(li: DataFrame) -> DataFrame:
    """One row per (order, unordered part pair): (p1, p2) with p1 < p2
    for every order containing both parts — the multiset the three
    co-purchase graph queries previously built as
    ``op JOIN op ON l_orderkey`` over the distinct (order, part)
    projection.

    r13 (guide §2.4): the self-join planned as TWO parquet scans + TWO
    distinct-aggregate shuffles of the same projection feeding a
    broadcast/sort-merge join. ``collect_set`` per order is the same
    dedup as ``dropDuplicates`` (l_partkey is non-null in this schema)
    in ONE scan + ONE order-keyed shuffle with map-side partial
    aggregation, and the C(w, 2) pair fan-out happens in-task over the
    sorted set (w <= 7 in TPC-H-shaped data, so the explode is O(1) per
    order). At 100 TB this halves the scans and shuffles AND removes the
    join: the old plan's broadcast side was op itself — order-count
    sized, un-broadcastable at scale, where it would degrade to a
    sort-merge join shuffling the projection a third time."""
    return (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(x AS p1, y AS p2))))"
                )
            ).alias("pr")
        )
        .select("pr.p1", "pr.p2")
    )


def _order_part_pairs_sym(li: DataFrame) -> DataFrame:
    """Both directions of every per-order unordered part pair:
    (src, dst) AND (dst, src) — the symmetric edge multiset pagerank
    and triangle_count previously built as
    ``pairs UNION ALL reversed(pairs)``.

    r14 (guide §2.4): that Union planned the ``_order_part_pairs``
    subtree TWICE — two parquet scans and two order-keyed
    ObjectHashAggregate exchanges feeding the same downstream dedup
    (pagerank job timeline showed the two gathers as back-to-back ~1.5 s
    cache-fill jobs). Emitting struct(x,y) and struct(y,x) from the SAME
    in-task C(w,2) explode produces the identical multiset — each
    unordered pair of each order exactly once per direction — with ONE
    scan and ONE gather shuffle; at 100 TB this halves the heaviest scan
    and shuffle of the graph family."""
    return (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "flatten(transform(slice(ps, i + 2, size(ps)), "
                    "y -> array(struct(x AS src, y AS dst), "
                    "struct(y AS src, x AS dst))))))"
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
    )


def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 part pairs by number of orders containing both: per-order
    distinct-part pair explode (``_order_part_pairs``), then a
    map-side-combinable pair count and a TakeOrdered top-20. Fan-out per
    order is C(width, 2) with width <= 7 in this schema, so pair
    generation stays linear in lineitem count; at 100 TB the order-keyed
    shuffle is the only data movement."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        _order_part_pairs(li)
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("p1"), F.asc("p2"))
        .limit(20)
    )


SQL_COPURCHASE_PAIRS = """
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_orders
FROM op a JOIN op b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, p1, p2
LIMIT 20
"""


# --------------------------------------------------------------------------
# pagerank_copurchase — iterative PageRank over the co-purchase graph
# --------------------------------------------------------------------------

def q_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three unrolled PageRank iterations (d = 0.85) over the undirected
    part co-purchase graph: nodes are parts, edges connect parts sharing
    an order. Each iteration is the canonical distributed step — join
    ranks onto edges by source node, send rank/degree along each edge,
    sum per destination — i.e. one hash join + one map-side-combinable
    aggregation per iteration, never an adjacency matrix. Ranks are
    rounded to 12 dp at every iteration in BOTH engines so double
    summation-order jitter (~1e-16) can't accumulate across iterations;
    the output is rounded to 6. Dangling nodes don't exist here (an
    undirected edge gives both endpoints degree >= 1). Top-20 by rank
    with node-id tiebreak."""
    d = 0.85
    li = load_table(spark, sf_dir, "lineitem")
    begin_scope("pagerank_copurchase", spark)
    edges = scoped_persist(
        _order_part_pairs_sym(li)
        .repartition("src")
        .dropDuplicates(),
        # (r13: a sortWithinPartitions("src") sorted-persist was measured
        # here and REVERTED — the contribution join plans as a
        # BroadcastHashJoin of the node-sized rank table over the cached
        # edges, so no edge-side sort exists to skip and the build-time
        # sort was pure cost.)
        "pagerank_copurchase",
    )  # symmetric by construction (each unordered pair emitted in both
    # directions before the dedup — identical to the old src != dst
    # self-join's edge set); persisted AND hash-partitioned on src:
    # the cached partitioning is reused by the degree aggregate and by
    # every iteration's contribution join, so each iteration shuffles
    # only the node-sized rank table, never the edge list (measured
    # ~30% faster at sf0.1; at cluster scale this is the difference
    # between shuffling E and shuffling V per iteration).
    # repartition BEFORE dropDuplicates: HashPartitioning(src) satisfies
    # the (src, dst) clustered distribution the dedup aggregate needs
    # (same src => same partition), so the dedup runs on the repartition
    # exchange directly — one edge-list shuffle instead of two.
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("src").alias("node"), "deg")
    n = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node", "deg", "n_nodes",
        F.round(F.lit(1.0) / F.col("n_nodes"), 12).alias("rank"),
    )
    # No rank-table persist (r13, guide §2.4/§5): the seed and every
    # iteration's rank frame have exactly ONE consumer — the next
    # iteration's broadcast build (the final frame: the top-20 sort) —
    # so with a single terminal action nothing is ever recomputed and
    # each scoped_persist only added a cache-fill materialization.
    # Measured (interleaved, deterministic plan metrics): 21 -> 16
    # jobs, 58 -> 43 stages, 1477 -> 1132 tasks, 56.7 -> 53.1 MB
    # shuffle write for the identical result. The 3-deep lineage stays
    # cheap to analyze because the iteration count is FIXED;
    # data-dependent convergence loops (operators/dedup.py label
    # propagation) still need their checkpoint form, and `edges` stays
    # persisted — it has four consumers (deg + three iteration joins).
    #
    # r13 (guide §2.4): the separate rank-UPDATE join is gone. The old
    # step joined contributions back onto the rank table (LeftOuter,
    # V-sized both sides — a Sort+Exchange pair per iteration, and the
    # cached rank table re-shuffled each time). In THIS graph the gather
    # side can rebuild the whole rank row itself: edges are symmetric,
    # so every node has >= 1 incoming edge and appears in the gather
    # (the old left join's NULL branch was dead code), each (src, dst)
    # is distinct so count(*) per dst IS deg(dst), and n_nodes rides
    # the contribution rows. One keyed join + one map-side-combinable
    # aggregation per iteration — nothing else. Identical math, same
    # 12-dp round per iteration (float-sum order inside sum(c) is the
    # same partition-order jitter the round already absorbs).
    # r14 (guide §1/§3.1): an explicit F.broadcast on the rank side was
    # measured and REVERTED. The unhinted plan broadcasts the CACHED
    # EDGE LIST (BuildLeft) — which looks inverted (E = 2.39M rows vs
    # V = 20k at sf0.1) but wins because the identical edge broadcast
    # is built ONCE and reused by all three iterations (ReusedExchange),
    # while a broadcast rank table differs per iteration and forces
    # three sequential non-reusable broadcast builds of the full
    # iteration lineage (measured: 8.3 s -> 10.4 s, 14 -> 17 jobs).
    # At cluster scale the planner's size estimate flips the build side
    # to the V-sized rank table on its own — exactly the case the
    # estimate-driven default handles and a hint would pin wrongly.
    for _ in range(3):
        ranks = (
            edges.join(
                ranks.select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("deg")).alias("c"),
                    "n_nodes",
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.count(F.lit(1)).alias("deg"),
                F.max("n_nodes").alias("n_nodes"),
                F.round(
                    (1.0 - d) / F.max("n_nodes") + d * F.sum("c"), 12
                ).alias("rank"),
            )
        )
    out = (
        ranks.select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(20)
    )
    return out


SQL_PAGERANK_COPURCHASE = """
WITH op AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges AS MATERIALIZED (
  -- r10: MATERIALIZED — without it DuckDB inlines this DISTINCT
  -- self-join into every iteration's contribution join, rebuilding the
  -- edge list four times over; at sf1 that spilled >70 GB and died
  -- while Spark's persisted-edge plan ran the same graph in 27 s
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), deg AS MATERIALIZED (
  SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1
), n AS (SELECT count(*) AS n_nodes FROM deg),
r0 AS MATERIALIZED (
  SELECT node, deg, n.n_nodes, round(1.0 / n.n_nodes, 12) AS rank
  FROM deg CROSS JOIN n
),
r1 AS MATERIALIZED (
  SELECT r.node, r.deg, r.n_nodes,
         round(0.15 / r.n_nodes + 0.85 * coalesce(i.inbound, 0.0), 12) AS rank
  FROM r0 r LEFT JOIN (
    SELECT e.dst AS node, sum(r.rank / r.deg) AS inbound
    FROM edges e JOIN r0 r ON e.src = r.node GROUP BY 1
  ) i USING (node)
),
r2 AS MATERIALIZED (
  SELECT r.node, r.deg, r.n_nodes,
         round(0.15 / r.n_nodes + 0.85 * coalesce(i.inbound, 0.0), 12) AS rank
  FROM r1 r LEFT JOIN (
    SELECT e.dst AS node, sum(r.rank / r.deg) AS inbound
    FROM edges e JOIN r1 r ON e.src = r.node GROUP BY 1
  ) i USING (node)
),
r3 AS MATERIALIZED (
  SELECT r.node, r.deg, r.n_nodes,
         round(0.15 / r.n_nodes + 0.85 * coalesce(i.inbound, 0.0), 12) AS rank
  FROM r2 r LEFT JOIN (
    SELECT e.dst AS node, sum(r.rank / r.deg) AS inbound
    FROM edges e JOIN r2 r ON e.src = r.node GROUP BY 1
  ) i USING (node)
)
SELECT node, round(rank, 6) AS rank
FROM r3
ORDER BY rank DESC, node
LIMIT 20
"""


# --------------------------------------------------------------------------
# triangle_count — graph-motif census on the co-purchase graph
# --------------------------------------------------------------------------

def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census over the part co-purchase graph with DEGREE-ORIENTED
    edges: each undirected edge points from its lower-degree endpoint to
    the higher-degree one (id tiebreak), then join edges (a,b)+(b,c) and
    verify (a,c) — the standard O(m^1.5) construction (node-iterator++ /
    Cohen's MapReduce form). Orientation counts each triangle exactly
    once; degree orientation bounds every node's out-degree by O(sqrt(m)),
    so a power-law hub of degree d no longer yields O(d^2) wedges — the
    property id-orientation lacks. Fully lazy: the three census counts
    are single-row aggregates combined with broadcast cross-joins, so
    building the DataFrame costs nothing (plan inspection / bench setup
    stay cheap) and the triangle total is orientation-invariant, matching
    the DuckDB oracle's mirrored orientation.

    Bench note: rounds <= 3 ran the census EAGERLY at build time, so
    BENCH_r03's 3.04 s for this entry measured only a 1-row
    createDataFrame — the real cost (~13 s at sf0.1) hid in the
    unbenched build phase. The lazy form surfaces the full cost in the
    bench timer; the adjacency-intersection closure is what brought the
    honest number down from ~19 s (wedge-shuffle form)."""
    li = load_table(spark, sf_dir, "lineitem")
    begin_scope("triangle_count", spark)
    # Symmetric directed edge list: both directions of every unordered
    # pair in ONE scan + gather (_order_part_pairs_sym, r14), deduped on
    # the one src-keyed exchange (repartition BEFORE dropDuplicates:
    # HashPartitioning(src) satisfies the (src, dst) dedup distribution,
    # so dedup AND the adjacency groupBy below run on that single
    # shuffle).
    sym = (
        _order_part_pairs_sym(li)
        .repartition("src")
        .dropDuplicates()
    )
    # r13 (guide §2.4): orientation WITHOUT the two node-table joins.
    # The old plan attached degrees by joining und with deg twice (four
    # exchanges + a separate deg union-aggregate shuffle). Instead, each
    # node's degree is the SIZE of its own neighbor list, and shipping
    # (src, deg_src) along every exploded edge lets the dst side gather
    # every neighbor's degree next to its own — one edge-sized shuffle
    # replaces deg + both joins. Orientation: edge points from the
    # endpoint with the smaller (degree, id) to the larger, exactly the
    # old `d1 <= d2` rule with the p1 < p2 id tiebreak.
    nbr_deg = (
        sym.groupBy("src")
        .agg(F.collect_list("dst").alias("nbrs"))
        .select("src", F.size("nbrs").alias("d"), F.explode("nbrs").alias("dst"))
    )
    out_adj = scoped_persist(
        nbr_deg.repartition("dst")
        .groupBy("dst")
        .agg(
            F.collect_list(F.struct(F.col("d"), F.col("src").alias("n"))).alias("nd")
        )
        .select(
            F.col("dst").alias("node"),
            F.expr(
                "transform(filter(nd, s -> s.d > size(nd) OR "
                "(s.d = size(nd) AND s.n > dst)), s -> s.n)"
            ).alias("out"),
        ),
        "triangle_count",
    )  # barrier: out-adjacency feeds the node/edge counts AND both tri
    # join sides; degree orientation caps |out| at O(sqrt(m)), so a
    # power-law hub never yields O(d^2) wedges.
    # Edge-iterator with adjacency intersection: triangle x≺y≺z (in the
    # (deg, id) order) is counted once at its lowest edge (x,y) as
    # |out(x) ∩ out(y)|; the intersect is one JVM-side expression and
    # the wedge set (49M rows at sf0.1) never materializes through a
    # shuffle.
    #
    # r14: the oriented edge stream stays NARROW (x, y — 16 B/row) and
    # out(x)/out(y) attach via TWO adjacency joins, instead of carrying
    # out(x) along the explode into one join. The carried form's fat
    # side — E rows × the full ox array ≈ the WEDGE byte volume — got
    # picked as the broadcast build side from pre-materialization
    # estimates (BuildLeft in plans/r14/triangle_count_before.txt) and
    # died at sf1 on the 8 GB broadcast cap
    # (cannotBroadcastTableOverMaxTableBytes; driver memory irrelevant).
    # Here both build-side candidates are the V-sized adjacency (total
    # payload = E longs, ~100x smaller than wedge bytes), broadcastable
    # to any realistic V; at cluster scale where even V outgrows the
    # cap, the planner's SMJ fallback shuffles wedge bytes — expensive
    # but feasible, unlike an over-cap broadcast crash.
    tri_cnt = (
        out_adj.select(F.col("node").alias("x"), F.explode("out").alias("y"))
        .join(out_adj.select(F.col("node").alias("x"), F.col("out").alias("ox")), "x")
        .join(out_adj.select(F.col("node").alias("y"), F.col("out").alias("oy")), "y")
        .select(F.size(F.array_intersect("ox", "oy")).alias("t"))
    )
    # node and edge census in ONE aggregate over the cached adjacency
    # (r13, guide §2.4): the old pair of single-row aggregates scanned
    # out_adj twice and chained TWO broadcast cross-joins — one extra
    # sequential broadcast-build job for the identical two numbers.
    n_ne = out_adj.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.coalesce(F.sum(F.size("out")), F.lit(0)).cast("long").alias("n_edges"),
    )
    n_tri = tri_cnt.agg(
        F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("n_triangles")
    )
    return n_ne.crossJoin(F.broadcast(n_tri))


SQL_TRIANGLE_COUNT = """
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), und AS (
  SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), deg AS (
  SELECT p, count(*) AS d FROM (
    SELECT p1 AS p FROM und UNION ALL SELECT p2 FROM und
  ) GROUP BY 1
), edges AS (
  -- degree orientation, id tiebreak (p1 < p2 already)
  SELECT CASE WHEN d1.d <= d2.d THEN u.p1 ELSE u.p2 END AS src,
         CASE WHEN d1.d <= d2.d THEN u.p2 ELSE u.p1 END AS dst
  FROM und u JOIN deg d1 ON u.p1 = d1.p JOIN deg d2 ON u.p2 = d2.p
), tri AS (
  SELECT count(*) AS n_tri
  FROM edges e1
  JOIN edges e2 ON e1.dst = e2.src
  JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
)
SELECT (SELECT count(*) FROM deg) AS n_nodes,
       (SELECT count(*) FROM edges) AS n_edges,
       (SELECT n_tri FROM tri) AS n_triangles
"""


# --------------------------------------------------------------------------
# gopher_quality_flags — named quality-rule audit table
# --------------------------------------------------------------------------

# THE Gopher rule set — single source of truth, shared by this audit
# table and by queries_ext5.q_training_mix (the composed pipeline whose
# docstring promises these exact rules): tuning a threshold here retunes
# both entries on BOTH engines.
GOPHER_STOPWORDS = ("the", "a", "and", "of", "to", "in")
GOPHER_WORDS_LO, GOPHER_WORDS_HI = 10, 100000
GOPHER_MWL_LO, GOPHER_MWL_HI = 2.0, 10.0
GOPHER_STOP_MIN = 2
_DUCK_STOPLIST = "[" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + "]"


def gopher_feature_exprs():
    """(n_words, mean_word_len, n_stopwords) column expressions over
    ``documents.text`` — the shared feature stage of the Gopher rules.
    ``mean_word_len`` carries the documented 6-dp boundary rounding.
    NULL text ≡ empty text (token coalesce): a NULL doc gets the same
    (0, 0.0, 0) features and definite False flags as an empty doc,
    instead of NULL-propagating through every rule."""
    tk = F.coalesce(tokens_expr(F.col("text")), F.array())
    stop = F.array([F.lit(w) for w in GOPHER_STOPWORDS])
    n_words = F.size(tk)
    mean_wl = F.round(
        F.aggregate(tk, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
        .cast("double") / F.greatest(n_words, F.lit(1)),
        6,
    )
    n_stop = F.size(F.filter(tk, lambda w: F.array_contains(stop, w)))
    return n_words, mean_wl, n_stop


def gopher_keep_expr(n_words, mean_wl, n_stop):
    """The conjunction keep rule over the shared feature expressions."""
    return (
        (n_words >= GOPHER_WORDS_LO) & (n_words <= GOPHER_WORDS_HI)
        & (mean_wl >= GOPHER_MWL_LO) & (mean_wl <= GOPHER_MWL_HI)
        & (n_stop >= GOPHER_STOP_MIN)
    )


def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document named quality-rule flags in the style of the Gopher
    rules (Rae et al. '21): word-count bounds, mean-word-length bounds,
    and a minimum stopword count, plus the conjunction keep flag. Unlike
    ``corpus_clean`` (which APPLIES a filter chain and reports survivor
    stats), this emits the audit table — every doc with every rule's
    verdict — the shape used to tune thresholds before committing a
    filter. Single scan, pure expressions, exact integer/ratio rules.

    Boundary rule (deliberate, mirrored in the oracle): ``ok_word_len``
    compares the 6-dp ROUNDED ``mean_word_len`` against the 2.0/10.0
    bounds — a doc at 1.9999996 rounds to 2.0 and passes in BOTH
    engines; zero-token docs get mean_word_len = 0.0 (Spark's aggregate
    seed; the oracle coalesces DuckDB's NULL list_sum([]) to 0)."""
    # r13 (guide §2.5): the gopher feature exprs tokenize in the scan
    # stage; spread is a no-op at real scale
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    n_words, mean_wl, n_stop = gopher_feature_exprs()
    flags = docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        n_stop.cast("long").alias("n_stopwords"),
    ).select(
        "doc_id", "n_words", "mean_word_len", "n_stopwords",
        ((F.col("n_words") >= GOPHER_WORDS_LO)
         & (F.col("n_words") <= GOPHER_WORDS_HI)).alias("ok_word_count"),
        ((F.col("mean_word_len") >= GOPHER_MWL_LO)
         & (F.col("mean_word_len") <= GOPHER_MWL_HI)).alias("ok_word_len"),
        (F.col("n_stopwords") >= GOPHER_STOP_MIN).alias("ok_stopwords"),
    )
    return flags.withColumn(
        "keep",
        F.col("ok_word_count") & F.col("ok_word_len") & F.col("ok_stopwords"),
    )


SQL_GOPHER_QUALITY_FLAGS = f"""
WITH feat AS (
  SELECT doc_id,
         len(tk) AS n_words,
         round(CAST(coalesce(list_sum(list_transform(tk, w -> length(w))), 0)
                    AS DOUBLE)
               / greatest(len(tk), 1), 6) AS mean_word_len,
         len(list_filter(tk, w -> list_contains(
             {_DUCK_STOPLIST}, w))) AS n_stopwords
  FROM (SELECT doc_id, coalesce({_DUCK_TOKS4}, []) AS tk FROM documents)
)
SELECT doc_id, n_words, mean_word_len, n_stopwords,
       n_words >= {GOPHER_WORDS_LO} AND n_words <= {GOPHER_WORDS_HI} AS ok_word_count,
       mean_word_len >= {GOPHER_MWL_LO} AND mean_word_len <= {GOPHER_MWL_HI} AS ok_word_len,
       n_stopwords >= {GOPHER_STOP_MIN} AS ok_stopwords,
       (n_words >= {GOPHER_WORDS_LO} AND n_words <= {GOPHER_WORDS_HI})
         AND (mean_word_len >= {GOPHER_MWL_LO} AND mean_word_len <= {GOPHER_MWL_HI})
         AND n_stopwords >= {GOPHER_STOP_MIN} AS keep
FROM feat
"""


EXT4_QUERIES = {
    "markov_transitions": (q_markov_transitions, SQL_MARKOV_TRANSITIONS),
    "session_paths": (q_session_paths, SQL_SESSION_PATHS),
    "ntile_bins": (q_ntile_bins, SQL_NTILE_BINS),
    "pmi_collocations": (q_pmi_collocations, SQL_PMI_COLLOCATIONS),
    "bigram_logprob": (q_bigram_logprob, SQL_BIGRAM_LOGPROB),
    "dedup_containment": (q_dedup_containment, SQL_DEDUP_CONTAINMENT),
    "chi2_source_lang": (q_chi2_source_lang, SQL_CHI2_SOURCE_LANG),
    "copurchase_pairs": (q_copurchase_pairs, SQL_COPURCHASE_PAIRS),
    "pagerank_copurchase": (q_pagerank_copurchase, SQL_PAGERANK_COPURCHASE),
    "triangle_count": (q_triangle_count, SQL_TRIANGLE_COUNT),
    "gopher_quality_flags": (q_gopher_quality_flags, SQL_GOPHER_QUALITY_FLAGS),
}
