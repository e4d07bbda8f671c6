"""Fifth extension catalog: embedding-space classification, robust
anomaly statistics, chunk-level exact dedup, and cross-source content
overlap.

The reference (/root/reference/src/main.py) is a time-series activity
generator with none of this surface; these extend SURVEY.md §2.8's
north-star set with four more operations a large-scale training-data
pipeline runs:

- ``knn_classify``     leave-one-out 5-NN majority-vote label prediction
  over the embedding table, reported as a per-label accuracy table — the
  standard embedding-quality probe (is the space linearly usable?) run
  before training on auto-labeled data. ``knn_classify_lsh`` is the same
  vote over SRP-LSH candidates — the shape that survives a large query
  side — with the full bucket pipeline re-derived in its oracle.
- ``psi_value_drift``  per-event-type PSI (population stability index)
  between the early and late halves of the stream's time range — the
  standard distribution-drift gate run on every feature/metric before
  refreshing a training set (robust_outliers covers point anomalies;
  PSI catches the distribution itself moving).
- ``dedup_chunk_exact``  C4-style chunk-level exact dedup: per document,
  the fraction of its non-overlapping 8-token chunks that also occur in
  some OTHER document — the "boilerplate ratio" filter that document-
  level hashing misses (Raffel et al. '20 dedupe at the span level).
- ``source_overlap``   pairwise shingle-overlap matrix between sources
  (shared distinct 3-shingles + Jaccard) — the cross-source duplication
  audit run before fixing a training mixture, so double-counted content
  is discovered *between* corpora, not just within one.
- ``training_mix``     the composed end-to-end assembly decision table:
  quality gate -> exact dedup among survivors -> domain-mixture
  upsample factor, one row per document with the why of every
  keep/drop — the pipeline the individual operators exist to serve.
- ``bpe_merges``       the BPE tokenizer TRAINING loop (three unrolled
  greedy merge rounds over the whole corpus), completing X8's
  single-round candidate count with the actual learned merge table.
- ``bpe_encode``       ENCODE with that tokenizer: the same three learned
  merges applied to every document, reported as the per-document token
  budget (n_raw, n_bpe, n_merged, compression) a pipeline uses to size
  a corpus after switching tokenizers.

Same contract as queries.py: name -> (spark_builder, duckdb_sql | None).

Scale notes (local[32] tests, 1000-executor design):
- ``knn_classify``: the query side (100 vectors) broadcasts into a single
  corpus scan — the corpus is never shuffled or self-joined. The vote /
  argmax windows run on the neighbors frame (|queries| x k rows), which
  also broadcasts into the label-lookup join. At a 100 TB corpus the
  brute-force scan is the exact baseline; the SRP-LSH bucketed path
  (``topk_cosine_lsh``, operators/similarity.py:149) is the drop-in
  candidate generator when the query side is itself large.
- ``psi_value_drift``: one stats pass and one (type, segment, bin)
  grouped count over the stream — both map-side combinable — with the
  |types|-row stats frame broadcast back; the bin grid / pivot / PSI sum
  all run on tiny |types| x 20 frames. No windows over the event stream.
- ``dedup_chunk_exact``: chunking is a per-row projection (no shuffle);
  the duplicate census is one chunk-keyed shuffle with a map-side
  combinable distinct-doc count, joined back keyed on the same chunk —
  candidate work only ever forms inside one chunk's hash bucket.
- ``source_overlap``: the self-join is keyed on the shingle; per-shingle
  fan-out is bounded by (#sources that contain it)^2, and the output is
  |sources|^2 rows. Per-source totals broadcast. The df-cap guard
  (shingles spanning > 1000 sources dropped from join AND totals, the
  dedup_containment pattern) bounds the square at a million-source
  corpus; mirrored in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from amazon_macie_activity_generator_spark.operators.dedup import (
    tokens_expr,
    word_shingles_expr,
)
from amazon_macie_activity_generator_spark.operators.similarity import (
    NONFINITE_COMPONENT_SQL,
    brute_force_topk,
    nonfinite_component,
)
from amazon_macie_activity_generator_spark.functions.rounding import (
    round_fixed,
    sql_round_fixed,
)
from amazon_macie_activity_generator_spark.sources.tables import load_table, spread_small_scan

# shared oracle fragments: the ext5 oracles tokenize/shingle exactly as
# the ext catalog does — import, don't re-declare, so a tokenizer-regex
# change can never de-sync the two modules' DuckDB sides
from amazon_macie_activity_generator_spark.queries_ext import (  # noqa: E402
    _DUCK_3GRAMS as _DUCK_3SH5,
    _DUCK_TOKS as _DUCK_TOKS5,
)

# the Gopher rule constants/expressions live with the audit entry
# (queries_ext4); training_mix interpolates the SAME constants into its
# oracle so the composed pipeline cannot drift from the audit table
from amazon_macie_activity_generator_spark import queries_ext4 as _G  # noqa: E402

# cosine between a corpus row (e.embedding) and a broadcast query vector
# (q.qv) — THE recipe of queries_ext.SQL_TOPK_COSINE (4-dp rounding,
# zero-norm guard), imported so tie-breaks stay cross-engine stable
from amazon_macie_activity_generator_spark.queries_ext import (  # noqa: E402
    _DUCK_COS as _DUCK_COS5,
)


# --------------------------------------------------------------------------
# knn_classify — leave-one-out 5-NN majority-vote accuracy per label
# --------------------------------------------------------------------------

def _knn_vote_accuracy(emb: DataFrame, nbrs: DataFrame, cutoff: int = 100) -> DataFrame:
    """Shared kNN tail for both neighbor generators (exact
    ``brute_force_topk`` and SRP-LSH): label lookup with the
    |queries| x k neighbor frame broadcast into the corpus scan,
    majority vote with the (count desc, label asc) argmax tie-break,
    and the per-label accuracy table. One tie-break rule, one place —
    mirrored once in ``_DUCK_KNN_TAIL``."""
    labeled = emb.select("vec_id", "label").join(
        F.broadcast(nbrs.select("query_id", "vec_id")), "vec_id"
    )
    votes = labeled.groupBy("query_id", "label").agg(F.count("*").alias("c"))
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.col("label"))
    pred = (
        votes.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("query_id", F.col("label").alias("pred_label"))
    )
    truth = emb.filter(F.col("vec_id") < cutoff).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    correct = F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
    return (
        pred.join(F.broadcast(truth), "query_id")
        .withColumn("correct", correct)
        .groupBy("true_label")
        .agg(
            F.count("*").alias("n"),
            F.sum("correct").alias("n_correct"),
            F.round(F.avg(F.col("correct").cast("double")), 6).alias("accuracy"),
        )
    )


# vote -> argmax -> accuracy, shared by both kNN oracles; {scored} is the
# CTE holding (query_id, vec_id, sim) from whichever neighbor generator
_DUCK_KNN_TAIL = """
nbrs AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
    FROM {scored}
  ) WHERE rnk <= 5
),
votes AS (
  SELECT n.query_id, e.label, count(*) AS c
  FROM nbrs n JOIN embeddings e USING (vec_id)
  GROUP BY 1, 2
),
pred AS (
  SELECT query_id, label AS pred_label FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, label) AS r
    FROM votes
  ) WHERE r = 1
),
truth AS (
  SELECT vec_id AS query_id, label AS true_label
  FROM embeddings WHERE vec_id < 100
)
SELECT truth.true_label,
       count(*) AS n,
       CAST(sum(CASE WHEN p.pred_label = truth.true_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       round(avg(CASE WHEN p.pred_label = truth.true_label THEN 1.0 ELSE 0.0 END), 6) AS accuracy
FROM pred p JOIN truth USING (query_id)
GROUP BY 1
"""


def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X27 — per-label accuracy of a leave-one-out 5-NN majority-vote
    classifier over ``embeddings`` (query set: vec_id < 100).

    Determinism: neighbor rank breaks ties on (rounded sim desc, vec_id
    asc) inside brute_force_topk; the vote argmax breaks count ties on
    the smaller label. Both rules are mirrored in the oracle.

    r13: the corpus side arrives via ``_emb`` (spread across cores) —
    the |corpus| x |queries| cosine fold previously ran on the parquet
    scan's single input split.
    """
    from amazon_macie_activity_generator_spark.queries_ext import _emb

    emb_raw = load_table(spark, sf_dir, "embeddings")
    queries = emb_raw.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )  # broadcast side: built from the raw scan, no spread shuffle
    nbrs = brute_force_topk(_emb(spark, sf_dir), queries, k=5)
    return _knn_vote_accuracy(emb_raw, nbrs)


SQL_KNN_CLASSIFY = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv
  FROM embeddings WHERE vec_id < 100 AND embedding IS NOT NULL
),
scored AS (
  SELECT q.query_id, e.vec_id, {_DUCK_COS5} AS sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != q.query_id AND e.embedding IS NOT NULL
),
""" + _DUCK_KNN_TAIL.format(scored="scored")


def q_knn_classify_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X27 scale path — the same leave-one-out 5-NN vote, but neighbors
    come from the SRP-LSH candidate generator (4 tables x 10 sign bits,
    Hamming-1 multi-probe) instead of the exact corpus scan: the shape
    that holds when the query side is itself large (candidates form via
    the (table, bucket)-keyed join, never a full cross product).

    Fully oracle-checked like ``topk_cosine_lsh``: the seeded planes are
    embedded in the SQL as sign-bit masks and the whole bucket ->
    probe -> candidate -> re-rank -> vote pipeline is re-derived in
    DuckDB. Queries with zero LSH candidates drop out of the accuracy
    table in both engines (same inner joins).
    """
    from amazon_macie_activity_generator_spark.operators.similarity import (
        lsh_bucket_topk,
    )
    from amazon_macie_activity_generator_spark.queries_ext import _emb

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    nbrs = lsh_bucket_topk(emb, queries, k=5, planes=10, dim=64)
    return _knn_vote_accuracy(emb, nbrs)


def _sql_knn_classify_lsh() -> str:
    """Oracle: the SRP pipeline of queries_ext.SQL_TOPK_COSINE_LSH with
    the query cutoff at 100 plus the vote/argmax/accuracy tail."""
    from amazon_macie_activity_generator_spark.queries_ext import _srp_mask_values

    cos = _DUCK_COS5.replace("q.qv", "q2.qv")
    return f"""
WITH planes(tbl, p, mask) AS (VALUES {_srp_mask_values()}),
bits AS (
  SELECT e.vec_id, pl.tbl,
         CAST(sum(CASE WHEN list_sum(list_transform(range(64),
               i -> CAST(e.embedding[i + 1] AS DOUBLE) *
                    (CASE WHEN ((pl.mask >> i) & 1) = 1 THEN 1.0 ELSE -1.0 END)
             )) >= 0 THEN (CAST(1 AS BIGINT) << pl.p) ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings e CROSS JOIN planes pl
  WHERE e.embedding IS NOT NULL  -- NULL vectors have no geometry
  GROUP BY e.vec_id, pl.tbl
),
qb AS (SELECT vec_id AS query_id, tbl, bucket FROM bits WHERE vec_id < 100),
probes AS (
  SELECT query_id, tbl, bucket FROM qb
  UNION ALL
  SELECT query_id, tbl, xor(bucket, CAST(1 AS BIGINT) << pp.p) AS bucket
  FROM qb CROSS JOIN (SELECT unnest(range(10)) AS p) pp
),
cand AS (
  SELECT DISTINCT pr.query_id, b.vec_id
  FROM probes pr JOIN bits b USING (tbl, bucket)
  WHERE b.vec_id != pr.query_id
),
lsh_scored AS (
  SELECT c.query_id, e.vec_id, {cos} AS sim
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN (SELECT vec_id AS query_id, embedding AS qv
        FROM embeddings WHERE vec_id < 100 AND embedding IS NOT NULL) q2 ON q2.query_id = c.query_id
),
""" + _DUCK_KNN_TAIL.format(scored="lsh_scored")


# --------------------------------------------------------------------------
# psi_value_drift — population stability index, early vs late half
# --------------------------------------------------------------------------

_PSI_BINS = 10
_PSI_EPS = 1e-6


def _drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared base population of the drift gates (``psi_value_drift`` /
    ``ks_value_drift``): events projected to (event_type, value, us),
    excluding NULL values (no value, no distribution point — floor/least
    NULL-handling also differs across engines) AND NULL timestamps (no
    time, no half — the corpus-wide time-ordered rule). ONE definition
    so the two gates can never drift apart on who is in the population;
    ``_DUCK_DRIFT_EV`` is the oracle twin."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select("event_type", "value", F.unix_micros(F.col("ts")).alias("us"))
    )


def _drift_is_early(us=None, tmn=None, tmx=None):
    """The midpoint split predicate, shared by both gates."""
    us = us if us is not None else F.col("us")
    tmn = tmn if tmn is not None else F.col("tmn")
    tmx = tmx if tmx is not None else F.col("tmx")
    return us <= (tmn + tmx) / F.lit(2)


_DUCK_DRIFT_EV = """
  SELECT event_type, value, epoch_us(ts) AS us FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL
"""


def q_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X28 — per-event-type PSI (population stability index) of the
    value distribution between the EARLY and LATE halves of that type's
    time range: 10 equi-width bins over the type's global [min, max],
    PSI = sum over bins of (p_early - p_late) * ln((p_early + eps) /
    (p_late + eps)). The standard drift gate (PSI > 0.2 = significant
    shift) run before refreshing a training set.

    Empty bins count with p = 0 (the eps smoothing keeps ln finite), so
    the bin grid is materialized for every (type, segment, bin) cell —
    built from the |types|-row stats frame, not the stream. Determinism:
    bin edges and the midpoint split use exact min/max aggregates; both
    engines run identical IEEE arithmetic on them.
    """
    ev = _drift_events(spark, sf_dir)  # shared population + NULL policy
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.min("us").alias("tmn"),
        F.max("us").alias("tmx"),
    )
    j = ev.join(F.broadcast(stats), "event_type")
    seg = F.when(_drift_is_early(), F.lit("early")).otherwise(F.lit("late"))
    width = F.col("mx") - F.col("mn")
    bin_ = (
        F.when(
            width > 0,
            F.least(
                F.floor((F.col("value") - F.col("mn")) / width * _PSI_BINS),
                F.lit(_PSI_BINS - 1),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    counts = (
        j.select("event_type", seg.alias("seg"), bin_.alias("bin"))
        .groupBy("event_type", "seg", "bin")
        .agg(F.count("*").alias("c"))
    )
    # full (type, seg, bin) grid so empty bins enter the PSI sum as p = 0
    grid = (
        stats.select("event_type")
        .select(
            "event_type",
            F.explode(F.array(F.lit("early"), F.lit("late"))).alias("seg"),
        )
        .select(
            "event_type", "seg",
            F.explode(F.sequence(F.lit(0), F.lit(_PSI_BINS - 1))).alias("bin"),
        )
    )
    filled = grid.join(counts, ["event_type", "seg", "bin"], "left").select(
        "event_type", "seg", "bin", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    totals = filled.groupBy("event_type", "seg").agg(F.sum("c").alias("tot"))
    p = filled.join(totals, ["event_type", "seg"]).withColumn(
        "p", F.col("c") / F.greatest(F.col("tot"), F.lit(1))
    )
    wide = p.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("seg") == "early", F.col("p")).otherwise(0.0)).alias("p1"),
        F.sum(F.when(F.col("seg") == "late", F.col("p")).otherwise(0.0)).alias("p2"),
        F.sum(F.when(F.col("seg") == "early", F.col("c")).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("seg") == "late", F.col("c")).otherwise(0)).alias("c2"),
    )
    term = (F.col("p1") - F.col("p2")) * F.log(
        (F.col("p1") + _PSI_EPS) / (F.col("p2") + _PSI_EPS)
    )
    return wide.groupBy("event_type").agg(
        F.sum("c1").alias("n_early"),
        F.sum("c2").alias("n_late"),
        F.round(F.sum(term), 6).alias("psi"),
    )


SQL_PSI_VALUE_DRIFT = f"""
WITH ev AS ({_DUCK_DRIFT_EV}),
stats AS (
  SELECT event_type, min(value) AS mn, max(value) AS mx,
         min(us) AS tmn, max(us) AS tmx
  FROM ev GROUP BY 1
),
binned AS (
  SELECT e.event_type,
         CASE WHEN e.us <= (s.tmn + s.tmx) / 2 THEN 'early' ELSE 'late' END AS seg,
         CAST(CASE WHEN s.mx - s.mn > 0
              THEN least(floor((e.value - s.mn) / (s.mx - s.mn) * {_PSI_BINS}), {_PSI_BINS - 1})
              ELSE 0 END AS INT) AS bin
  FROM ev e JOIN stats s USING (event_type)
),
counts AS (
  SELECT event_type, seg, bin, count(*) AS c FROM binned GROUP BY 1, 2, 3
),
grid AS (
  SELECT s.event_type, seg.seg, CAST(b.i AS INT) AS bin
  FROM stats s
  CROSS JOIN (SELECT unnest(['early', 'late']) AS seg) seg
  CROSS JOIN (SELECT unnest(range({_PSI_BINS})) AS i) b
),
filled AS (
  SELECT g.event_type, g.seg, g.bin, coalesce(c.c, 0) AS c
  FROM grid g LEFT JOIN counts c USING (event_type, seg, bin)
),
totals AS (
  SELECT event_type, seg, sum(c) AS tot FROM filled GROUP BY 1, 2
),
p AS (
  SELECT f.event_type, f.seg, f.bin, f.c,
         f.c / greatest(t.tot, 1) AS p
  FROM filled f JOIN totals t USING (event_type, seg)
),
wide AS (
  SELECT event_type, bin,
         sum(CASE WHEN seg = 'early' THEN p ELSE 0.0 END) AS p1,
         sum(CASE WHEN seg = 'late' THEN p ELSE 0.0 END) AS p2,
         sum(CASE WHEN seg = 'early' THEN c ELSE 0 END) AS c1,
         sum(CASE WHEN seg = 'late' THEN c ELSE 0 END) AS c2
  FROM p GROUP BY 1, 2
)
SELECT event_type,
       CAST(sum(c1) AS BIGINT) AS n_early,
       CAST(sum(c2) AS BIGINT) AS n_late,
       round(sum((p1 - p2) * ln((p1 + {_PSI_EPS}) / (p2 + {_PSI_EPS}))), 6) AS psi
FROM wide
GROUP BY 1
"""


# --------------------------------------------------------------------------
# ks_value_drift — exact two-sample Kolmogorov-Smirnov, early vs late half
# --------------------------------------------------------------------------

def q_ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X28b — the EXACT two-sample KS statistic per event type between
    the early and late halves of that type's time range (same midpoint
    split as ``psi_value_drift``): D = max over observed values of
    |ECDF_early(v) - ECDF_late(v)|. PSI quantizes into 10 bins and can
    miss a shift that stays within a bin; KS is binless and catches any
    CDF displacement — the pair is the standard drift gate set.

    Exactness/determinism: values group to (type, value, segment) counts
    first (ties collapse exactly), the two cumulative sums run over one
    value-ordered window, and D is a max of |c_e/n_e - c_l/n_l| — pure
    integer counts and one division each, identical IEEE in both
    engines; 6-dp round on output only. Types whose early or late half
    is empty have no two-sample statistic and drop (HAVING in both).

    Scale shape: the stream pre-aggregates map-side to (type, distinct
    value) rows, so the per-type window sorts the DISTINCT-value frame,
    not the events; totals ride a broadcast join. NULL values and NULL
    timestamps are excluded (no value -> no CDF point; no time -> no
    half).
    """
    ev = _drift_events(spark, sf_dir)  # shared population + NULL policy
    tstats = ev.groupBy("event_type").agg(
        F.min("us").alias("tmn"), F.max("us").alias("tmx")
    )
    seg_is_early = _drift_is_early()
    g = (
        ev.join(F.broadcast(tstats), "event_type")
        .groupBy("event_type", "value")
        .agg(
            F.sum(F.when(seg_is_early, 1).otherwise(0)).alias("ce"),
            F.sum(F.when(~seg_is_early, 1).otherwise(0)).alias("cl"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = g.select(
        "event_type",
        F.sum("ce").over(w).alias("cum_e"),
        F.sum("cl").over(w).alias("cum_l"),
    )
    totals = g.groupBy("event_type").agg(
        F.sum("ce").alias("n_early"), F.sum("cl").alias("n_late")
    )
    d = (
        cum.join(F.broadcast(totals), "event_type")
        .filter((F.col("n_early") > 0) & (F.col("n_late") > 0))
        .groupBy("event_type")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_e") / F.col("n_early")
                    - F.col("cum_l") / F.col("n_late")
                )
            ).alias("ks_raw"),
        )
    )
    return d.join(F.broadcast(totals), "event_type").select(
        "event_type", "n_early", "n_late", F.round("ks_raw", 6).alias("ks")
    )


SQL_KS_VALUE_DRIFT = f"""
WITH ev AS ({_DUCK_DRIFT_EV}),
tstats AS (
  SELECT event_type, min(us) AS tmn, max(us) AS tmx FROM ev GROUP BY 1
),
g AS (
  SELECT e.event_type, e.value,
         sum(CASE WHEN e.us <= (t.tmn + t.tmx) / 2 THEN 1 ELSE 0 END) AS ce,
         sum(CASE WHEN e.us <= (t.tmn + t.tmx) / 2 THEN 0 ELSE 1 END) AS cl
  FROM ev e JOIN tstats t USING (event_type)
  GROUP BY 1, 2
),
cum AS (
  SELECT event_type,
         sum(ce) OVER w AS cum_e,
         sum(cl) OVER w AS cum_l
  FROM g
  WINDOW w AS (PARTITION BY event_type ORDER BY value
               ROWS UNBOUNDED PRECEDING)
),
totals AS (
  SELECT event_type, sum(ce) AS n_early, sum(cl) AS n_late
  FROM g GROUP BY 1
  HAVING sum(ce) > 0 AND sum(cl) > 0
)
SELECT c.event_type,
       CAST(t.n_early AS BIGINT) AS n_early,
       CAST(t.n_late AS BIGINT) AS n_late,
       round(max(abs(c.cum_e / t.n_early - c.cum_l / t.n_late)), 6) AS ks
FROM cum c JOIN totals t USING (event_type)
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# dedup_chunk_exact — C4-style chunk-level duplicate ratio per document
# --------------------------------------------------------------------------

_CHUNK = 8  # tokens per non-overlapping chunk; trailing partial chunks drop


def q_dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X29 — per-document chunk-level exact-duplicate audit: split each
    document into non-overlapping 8-token chunks (trailing partial chunk
    dropped), count how many of its chunk INSTANCES also occur in at
    least one other document, and flag keep = dup_ratio <= 0.5.

    This is the span-level dedup document-level hashing misses (C4 /
    Raffel et al. '20 remove repeated three-sentence spans; tokens stand
    in for sentences here because the corpus has no punctuation).
    """
    # r13 (guide §2.5): tokenize+chunk-explode runs in the scan stage;
    # spread is a no-op at real scale
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    tk = tokens_expr(F.col("text"))
    n_full = F.floor(F.size("tk") / _CHUNK).cast("int")
    # sequence(0, -1) would yield [0, -1] (negative step), so gate on >= 1 chunk
    idx = F.when(
        n_full >= 1, F.sequence(F.lit(0), n_full - 1)
    ).otherwise(F.array().cast("array<int>"))
    chunks = (
        docs.select("doc_id", tk.alias("tk"))
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("tk"), i * _CHUNK + 1, _CHUNK)
                    ),
                )
            ).alias("chunk"),
        )
    )
    freq = chunks.groupBy("chunk").agg(F.count_distinct("doc_id").alias("ndocs"))
    per_doc = (
        chunks.join(freq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("ndocs") > 1, 1).otherwise(0)).alias("n_dup_chunks"),
        )
    )
    out = (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_chunks"), F.lit(0)).alias("n_chunks"),
            F.coalesce(F.col("n_dup_chunks"), F.lit(0)).alias("n_dup_chunks"),
        )
    )
    ratio = F.round(
        F.col("n_dup_chunks") / F.greatest(F.col("n_chunks"), F.lit(1)), 6
    )
    return out.withColumn("dup_ratio", ratio).withColumn(
        "keep", F.col("dup_ratio") <= 0.5
    )


SQL_DEDUP_CHUNK_EXACT = f"""
WITH tk AS (
  SELECT doc_id, {_DUCK_TOKS5} AS tk FROM documents
),
chunks AS (
  SELECT doc_id,
         unnest(list_transform(range(CAST(floor(len(tk) / {_CHUNK}.0) AS BIGINT)),
                i -> array_to_string(tk[(i * {_CHUNK} + 1):(i * {_CHUNK} + {_CHUNK})], ' '))) AS chunk
  FROM tk
),
freq AS (
  SELECT chunk, count(DISTINCT doc_id) AS ndocs FROM chunks GROUP BY 1
),
per_doc AS (
  SELECT c.doc_id,
         count(*) AS n_chunks,
         sum(CASE WHEN f.ndocs > 1 THEN 1 ELSE 0 END) AS n_dup_chunks
  FROM chunks c JOIN freq f USING (chunk)
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(p.n_chunks, 0) AS BIGINT) AS n_chunks,
       CAST(coalesce(p.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks,
       round(coalesce(p.n_dup_chunks, 0) / greatest(coalesce(p.n_chunks, 0), 1), 6) AS dup_ratio,
       round(coalesce(p.n_dup_chunks, 0) / greatest(coalesce(p.n_chunks, 0), 1), 6) <= 0.5 AS keep
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


# --------------------------------------------------------------------------
# source_overlap — pairwise shingle overlap between sources
# --------------------------------------------------------------------------

_OVERLAP_SOURCE_DF_CAP = 1000


def q_source_overlap(
    spark: SparkSession, sf_dir: str, source_df_cap: int = _OVERLAP_SOURCE_DF_CAP
) -> DataFrame:
    """X30 — cross-source duplication audit: for every pair of sources,
    the number of distinct 3-word shingles they share and the Jaccard of
    their shingle sets. Pairs with zero shared shingles are omitted.

    Pair formation is bounded per shingle by C(#sources containing it, 2)
    — never an all-pairs product over documents. That square is the
    residual risk at a million-source corpus: one boilerplate shingle
    present in every source would form |sources|^2 pairs in a single
    task. The df-cap guard (dedup_containment's posting-list cap,
    queries_ext4.py) bounds it: shingles spanning more than
    ``source_df_cap`` sources are dropped from BOTH the pair explode and
    the per-source totals — such shingles carry no dedup signal (they
    are corpus-wide boilerplate), and excluding them from the Jaccard
    denominator keeps the ratio consistent with the capped numerator. A
    no-op below the cap (the sf-test corpora have ~20 sources), mirrored
    exactly in the oracle.

    r13 (guide §2.4): the per-shingle source set is gathered with ONE
    (shingle)-keyed ``collect_set`` aggregation and pairs explode
    in-task over the sorted set (the ``_order_part_pairs``
    construction). The previous form — distinct (source, shingle) rows,
    a df-count aggregate joined back as the cap filter, then a
    shingle-keyed SELF-JOIN — shuffled the fat shingle strings four
    times (distinct, df aggregate, both join sides); this shuffles them
    once, the distinct folds into the set-union semantics of
    ``collect_set``, the cap filter is ``size(ss) <= cap`` on the
    aggregate itself, and the per-source totals explode from the same
    persisted set table. In-task fan-out is C(|ss|, 2) <= C(cap, 2),
    exactly the old per-shingle join bound.
    """
    # spread the one-input-split table across cores (r13, the _docs
    # rule): tokenize + shingle explode is the CPU cost and otherwise
    # runs entirely on the scan's single task before the aggregate's
    # exchange spreads anything
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    from amazon_macie_activity_generator_spark.cache import begin_scope, scoped_persist

    # persist barrier: the capped per-shingle source-set table feeds the
    # pair explode AND the totals explode — uncached each consumer
    # replays tokenize+explode+aggregate
    begin_scope("source_overlap", spark)
    # df semantics pinned to the oracle: its cap counts DISTINCT
    # (source, shingle) rows, which includes a NULL source once.
    # collect_set drops NULLs, so count it back explicitly — a NULL
    # source can never pair (NULL < x is NULL) or match the totals
    # joins, but it must still push a shingle over the cap exactly as
    # the oracle's count(*) does. No-op on NULL-free corpora.
    srcs = scoped_persist(
        docs.select(
            "source", F.explode(word_shingles_expr(F.col("text"), 3)).alias("sh")
        )
        .groupBy("sh")
        .agg(
            F.sort_array(F.collect_set("source")).alias("ss"),
            F.max(
                F.when(F.col("source").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("null_src"),
        )
        .filter(F.size("ss") + F.col("null_src") <= source_df_cap)
        .select("sh", "ss"),
        "source_overlap",
    )
    pairs = (
        srcs.select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, (x, i) -> "
                    "transform(slice(ss, i + 2, size(ss)), "
                    "y -> struct(x AS sa, y AS sb))))"
                )
            ).alias("pr")
        )
        .groupBy(
            F.col("pr.sa").alias("source_a"),
            F.col("pr.sb").alias("source_b"),
        )
        # source sets are sets, so each co-occurring pair appears once
        # per shared shingle: count(*) IS the number of distinct shared
        # shingles
        .agg(F.count("*").alias("n_shared"))
    )
    totals = (
        srcs.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count("*").alias("n_sh"))
    )
    ta = totals.select(F.col("source").alias("source_a"), F.col("n_sh").alias("na"))
    tb = totals.select(F.col("source").alias("source_b"), F.col("n_sh").alias("nb"))
    jac = F.round(
        F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared")), 6
    )
    return (
        pairs.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select("source_a", "source_b", "n_shared", jac.alias("jaccard"))
    )


def _sql_source_overlap(source_df_cap: int = _OVERLAP_SOURCE_DF_CAP) -> str:
    """Oracle twin of q_source_overlap, generated from the SAME cap
    parameter so a caller-supplied cap can never silently diverge from
    the comparison SQL (the _sql_split_leakage pattern)."""
    return f"""
WITH tok AS (
  SELECT source, {_DUCK_TOKS5} AS toks FROM documents
),
sh_all AS (
  SELECT DISTINCT source, unnest({_DUCK_3SH5}) AS sh FROM tok
),
sh AS (
  SELECT source, sh FROM sh_all
  WHERE sh IN (SELECT sh FROM sh_all GROUP BY sh
               HAVING count(*) <= {source_df_cap})
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
  GROUP BY 1, 2
),
totals AS (
  SELECT source, count(*) AS n_sh FROM sh GROUP BY 1
)
SELECT p.source_a, p.source_b, p.n_shared,
       round(p.n_shared / (ta.n_sh + tb.n_sh - p.n_shared), 6) AS jaccard
FROM pairs p
JOIN totals ta ON ta.source = p.source_a
JOIN totals tb ON tb.source = p.source_b
"""


SQL_SOURCE_OVERLAP = _sql_source_overlap()


# --------------------------------------------------------------------------
# hard_negatives — triplet mining for embedding training
# --------------------------------------------------------------------------

def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X33 — hard positive/negative mining, the triplet-selection step of
    contrastive embedding training: for each anchor (vec_id < 100), the
    most-similar vector sharing its label (hardest positive) and the
    most-similar vector with a DIFFERENT label (hardest negative), plus
    the margin between them — anchors with a negative margin are the
    pairs a triplet loss actually learns from.

    Scale shape: the anchor set broadcasts into ONE corpus scan, and the
    per-(anchor, side) argmax is a struct-max aggregation — map-side
    combinable, so the |corpus| x |anchors| scored stream reduces to two
    rows per anchor inside each task before any shuffle (no window over
    the scored frame). Both norms are hoisted to once-per-ROW columns
    below the join (r12 — the scored stream previously re-folded BOTH
    vector norms per PAIR, 3x the O(dim) work; same fold expressions,
    same denominator product, so every 4-dp round and the oracle hash
    are unchanged). The brute-force scan is the exact baseline;
    ``hard_negatives_lsh`` is the same miner over the SRP-LSH candidate
    generator — the proven swap when the corpus or anchor side grows.
    Ties break on (sim desc, vec_id
    asc) via the struct's (sim, -vec_id) ordering, mirrored in the
    oracle's row_number.
    """
    from amazon_macie_activity_generator_spark.operators.similarity import (
        dot_expr,
        norm_expr,
    )

    from amazon_macie_activity_generator_spark.queries_ext import _emb

    # NULL vectors out on both sides (brute_force_topk's rule): a NULL
    # sim inside the struct-max would resolve by engine NULL semantics.
    # _emb spreads the one-input-split table across cores (r13): the
    # |corpus| x |anchors| fold below is the CPU cost, and unspread it
    # ran on the scan's single task.
    emb = _emb(spark, sf_dir).filter(
        F.col("embedding").isNotNull()
    ).withColumn("nrm", norm_expr(F.col("embedding")))
    anchors = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull() & (F.col("vec_id") < 100))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.col("label").alias("q_label"),
            norm_expr(F.col("embedding")).alias("qn"),
        )
    )  # broadcast side: built from the raw scan, no spread shuffle
    denom = F.col("nrm") * F.col("qn")
    sim = F.round(
        F.when(denom == 0, F.lit(0.0)).otherwise(
            dot_expr(F.col("embedding"), F.col("qv")) / denom),
        4,
    )
    scored = (
        emb.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "q_label",
            (F.col("label") == F.col("q_label")).alias("is_pos"),
            F.struct(
                sim.alias("sim"),
                (-F.col("vec_id")).alias("nv"),
                F.col("vec_id").alias("vid"),
            ).alias("cand"),
        )
    )
    best = scored.groupBy("query_id", "q_label", "is_pos").agg(F.max("cand").alias("b"))
    pos = best.filter(F.col("is_pos")).select(
        "query_id", F.col("q_label").alias("label"),
        F.col("b.vid").alias("pos_id"), F.col("b.sim").alias("pos_sim"),
    )
    neg = best.filter(~F.col("is_pos")).select(
        "query_id", F.col("b.vid").alias("neg_id"), F.col("b.sim").alias("neg_sim"),
    )
    return pos.join(neg, "query_id").select(
        "query_id", "label", "pos_id", "pos_sim", "neg_id", "neg_sim",
        F.round(F.col("pos_sim") - F.col("neg_sim"), 4).alias("margin"),
    )


SQL_HARD_NEGATIVES = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv, label AS q_label
  FROM embeddings WHERE vec_id < 100 AND embedding IS NOT NULL
),
scored AS (
  SELECT q.query_id, q.q_label, e.vec_id, e.label, {cos} AS sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != q.query_id AND e.embedding IS NOT NULL
),
best AS (
  SELECT query_id, q_label, (label = q_label) AS is_pos, vec_id, sim,
         row_number() OVER (PARTITION BY query_id, (label = q_label)
                            ORDER BY sim DESC, vec_id) AS r
  FROM scored
)
SELECT p.query_id, p.q_label AS label,
       p.vec_id AS pos_id, p.sim AS pos_sim,
       n.vec_id AS neg_id, n.sim AS neg_sim,
       round(p.sim - n.sim, 4) AS margin
FROM best p JOIN best n ON n.query_id = p.query_id
WHERE p.is_pos AND p.r = 1 AND (NOT n.is_pos) AND n.r = 1
""".format(cos=_DUCK_COS5)


def q_hard_negatives_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X33 scale path — the same triplet mining, but candidates come from
    the SRP-LSH generator (4 tables x 10 sign bits, Hamming-1
    multi-probe) instead of the exact |corpus| x |anchors| scan: the
    swap ``q_hard_negatives`` names as its scale path, proven end-to-end.
    The candidate label rides the corpus scan (``corpus_carry``), so the
    per-(anchor, side) struct-max argmax runs directly on the
    (table, bucket)-keyed candidate stream — still map-side combinable,
    still no window, and no second corpus join for labels. Anchors whose
    candidate set lacks a positive or a negative drop out via the final
    inner join, in both engines.

    "Hard" under LSH means hardest IN-BUCKET candidate — for negatives
    that is exactly the semi-hard mining regime used at scale (near-
    collisions are the informative negatives); agreement with the exact
    miner is pinned in tests/test_ext5_lsh.py rather than by hash (the
    candidate sets legitimately differ).
    """
    from amazon_macie_activity_generator_spark.operators.similarity import (
        lsh_scored_candidates,
    )
    from amazon_macie_activity_generator_spark.queries_ext import _emb

    emb = _emb(spark, sf_dir)
    anchors = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"),
        "embedding",
        F.col("label").alias("q_label"),
    )
    scored = lsh_scored_candidates(
        emb,
        anchors.select("query_id", "embedding"),
        planes=10,
        dim=64,
        corpus_carry=("label",),
    )
    cand = scored.join(
        F.broadcast(anchors.select("query_id", "q_label")), "query_id"
    ).select(
        "query_id", "q_label",
        (F.col("label") == F.col("q_label")).alias("is_pos"),
        F.struct(
            F.col("sim").alias("sim"),
            (-F.col("vec_id")).alias("nv"),
            F.col("vec_id").alias("vid"),
        ).alias("cand"),
    )
    best = cand.groupBy("query_id", "q_label", "is_pos").agg(F.max("cand").alias("b"))
    pos = best.filter(F.col("is_pos")).select(
        "query_id", F.col("q_label").alias("label"),
        F.col("b.vid").alias("pos_id"), F.col("b.sim").alias("pos_sim"),
    )
    neg = best.filter(~F.col("is_pos")).select(
        "query_id", F.col("b.vid").alias("neg_id"), F.col("b.sim").alias("neg_sim"),
    )
    return pos.join(neg, "query_id").select(
        "query_id", "label", "pos_id", "pos_sim", "neg_id", "neg_sim",
        F.round(F.col("pos_sim") - F.col("neg_sim"), 4).alias("margin"),
    )


def _sql_hard_negatives_lsh() -> str:
    """Oracle: the SRP bucket -> probe -> candidate pipeline of
    ``_sql_knn_classify_lsh`` (same seeded planes as sign-bit masks,
    query cutoff 100) feeding the hard-negatives argmax tail of
    ``SQL_HARD_NEGATIVES``."""
    from amazon_macie_activity_generator_spark.queries_ext import _srp_mask_values

    cos = _DUCK_COS5.replace("q.qv", "q2.qv")
    return f"""
WITH planes(tbl, p, mask) AS (VALUES {_srp_mask_values()}),
bits AS (
  SELECT e.vec_id, pl.tbl,
         CAST(sum(CASE WHEN list_sum(list_transform(range(64),
               i -> CAST(e.embedding[i + 1] AS DOUBLE) *
                    (CASE WHEN ((pl.mask >> i) & 1) = 1 THEN 1.0 ELSE -1.0 END)
             )) >= 0 THEN (CAST(1 AS BIGINT) << pl.p) ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings e CROSS JOIN planes pl
  WHERE e.embedding IS NOT NULL  -- NULL vectors have no geometry
  GROUP BY e.vec_id, pl.tbl
),
qb AS (SELECT vec_id AS query_id, tbl, bucket FROM bits WHERE vec_id < 100),
probes AS (
  SELECT query_id, tbl, bucket FROM qb
  UNION ALL
  SELECT query_id, tbl, xor(bucket, CAST(1 AS BIGINT) << pp.p) AS bucket
  FROM qb CROSS JOIN (SELECT unnest(range(10)) AS p) pp
),
cand AS (
  SELECT DISTINCT pr.query_id, b.vec_id
  FROM probes pr JOIN bits b USING (tbl, bucket)
  WHERE b.vec_id != pr.query_id
),
scored AS (
  SELECT c.query_id, q2.q_label, e.vec_id, e.label, {cos} AS sim
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN (SELECT vec_id AS query_id, embedding AS qv, label AS q_label
        FROM embeddings WHERE vec_id < 100 AND embedding IS NOT NULL) q2 ON q2.query_id = c.query_id
),
best AS (
  SELECT query_id, q_label, (label = q_label) AS is_pos, vec_id, sim,
         row_number() OVER (PARTITION BY query_id, (label = q_label)
                            ORDER BY sim DESC, vec_id) AS r
  FROM scored
)
SELECT p.query_id, p.q_label AS label,
       p.vec_id AS pos_id, p.sim AS pos_sim,
       n.vec_id AS neg_id, n.sim AS neg_sim,
       round(p.sim - n.sim, 4) AS margin
FROM best p JOIN best n ON n.query_id = p.query_id
WHERE p.is_pos AND p.r = 1 AND (NOT n.is_pos) AND n.r = 1
"""


# --------------------------------------------------------------------------
# bpe_merges — three unrolled rounds of greedy BPE merge training
# --------------------------------------------------------------------------

def _bpe_top_pair(cur: DataFrame) -> DataFrame:
    """Most frequent adjacent token pair of the current corpus state:
    overlapping zip counts (standard BPE statistics), tie-break on
    (w1, w2) ascending. One pair-keyed map-side-combinable shuffle plus
    a TakeOrdered — the same shape as bpe_pair_counts, once per round."""
    pairs = cur.select(
        F.explode(
            F.arrays_zip(
                F.slice("tk", 1, F.greatest(F.size("tk") - 1, F.lit(0))),
                F.slice("tk", 2, F.greatest(F.size("tk") - 1, F.lit(0))),
            )
        ).alias("p")
    ).select(F.col("p")["0"].alias("w1"), F.col("p")["1"].alias("w2"))
    return (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "w1", "w2")
        .limit(1)
    )


def _bpe_apply(cur: DataFrame, top: DataFrame, carry: tuple = ()) -> DataFrame:
    """Merge every non-overlapping left-to-right occurrence of the top
    pair: tokens are re-joined with DOUBLE spaces (so adjacent pattern
    occurrences never share a delimiter character and literal replace-all
    is exactly the greedy merge), replaced, re-split. A map-side
    projection — the 1-row top pair broadcasts. ``carry`` columns
    (e.g. doc_id for the encode path) pass through untouched.

    A corpus state with no adjacent pair at all (every doc has <= 1
    token) makes ``top`` EMPTY; a plain crossJoin would then silently
    drop every row. Instead the pair attaches via a broadcast left join
    on a constant key and an absent pair coalesces to a chr(1) sentinel
    in BOTH engines (see ``_BPE_DUCK_APPLY``), so the round degrades to
    the same (no-op) merge on each side by construction."""
    s = F.concat(F.lit("  "), F.concat_ws("  ", F.col("tk")), F.lit("  "))
    w1 = F.coalesce(F.col("w1"), F.lit("\x01"))
    w2 = F.coalesce(F.col("w2"), F.lit("\x01"))
    pat = F.concat(F.lit(" "), w1, F.lit("  "), w2, F.lit(" "))
    rep = F.concat(F.lit(" "), w1, F.lit("_"), w2, F.lit(" "))
    merged = F.replace(s, pat, rep)
    return (
        cur.withColumn("_k", F.lit(1))
        .join(
            F.broadcast(top.select("w1", "w2").withColumn("_k", F.lit(1))),
            on="_k",
            how="left",
        )
        .select(*carry, F.filter(F.split(merged, " +"), lambda t: t != "").alias("tk"))
    )


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8b — the BPE TRAINING LOOP itself, not just one round's
    candidates: three unrolled greedy merge iterations (count adjacent
    pairs -> take the most frequent -> merge all its non-overlapping
    occurrences corpus-wide -> recount), emitting the learned merge
    table (round, pair, merged token, count at selection time).

    Iterative like pagerank_copurchase: each round is one pair-keyed
    map-side-combinable shuffle plus a global top-1 whose single row
    broadcasts into a map-side re-tokenization — no corpus self-join,
    no window over the corpus. Counting uses overlapping-zip statistics
    and merging is non-overlapping left-to-right, both mirrored exactly
    in the DuckDB oracle (the double-space join guarantees literal
    replace-all == greedy fold in BOTH engines). Each round's corpus
    state persists (pagerank's pattern) so round k's statistics read the
    materialized round k-1 instead of replaying the whole merge chain
    from parquet — the batch analogue of checkpointing tokenizer state
    between merge rounds; at 100 TB the persist becomes a stored table.
    Persist lifecycle: scoped_persist — a repeat invocation releases the
    previous call's cached rounds (see cache.py).
    """
    from amazon_macie_activity_generator_spark.cache import begin_scope, scoped_persist

    begin_scope("bpe_merges", spark)
    docs = load_table(spark, sf_dir, "documents")
    cur = scoped_persist(
        docs.select(tokens_expr(F.col("text")).alias("tk")), "bpe_merges"
    )
    out = None
    for r in (1, 2, 3):
        top = _bpe_top_pair(cur)
        row = top.select(
            F.lit(r).alias("merge_round"), "w1", "w2",
            F.concat(F.col("w1"), F.lit("_"), F.col("w2")).alias("merged"),
            "n",
        )
        out = row if out is None else out.unionByName(row)
        if r < 3:
            cur = scoped_persist(_bpe_apply(cur, top), "bpe_merges")
    return out


_BPE_DUCK_ROUND = """
p{r} AS (
  SELECT unnest(list_transform(range(1, greatest(len(tk), 1)),
                i -> [tk[i], tk[i + 1]])) AS pr
  FROM t{r}
),
top{r} AS (
  SELECT pr[1] AS w1, pr[2] AS w2, count(*) AS n
  FROM p{r} GROUP BY 1, 2
  ORDER BY n DESC, w1, w2 LIMIT 1
)"""

_BPE_DUCK_APPLY = """
t{nxt} AS (
  SELECT {carry}list_filter(string_split_regex(
           replace('  ' || coalesce(array_to_string(tk, '  '), '') || '  ',
                   coalesce((SELECT ' ' || w1 || '  ' || w2 || ' ' FROM top{r}),
                            ' ' || chr(1) || '  ' || chr(1) || ' '),
                   coalesce((SELECT ' ' || w1 || '_' || w2 || ' ' FROM top{r}),
                            ' ' || chr(1) || '_' || chr(1) || ' ')),
           ' +'), x -> x <> '') AS tk
  FROM t{r}
)"""

SQL_BPE_MERGES = (
    f"WITH t0 AS (SELECT {_DUCK_TOKS5} AS tk FROM documents),"
    + _BPE_DUCK_ROUND.format(r=0) + ","
    + _BPE_DUCK_APPLY.format(r=0, nxt=1, carry="") + ","
    + _BPE_DUCK_ROUND.format(r=1) + ","
    + _BPE_DUCK_APPLY.format(r=1, nxt=2, carry="") + ","
    + _BPE_DUCK_ROUND.format(r=2)
    + """
SELECT 1 AS merge_round, w1, w2, w1 || '_' || w2 AS merged, CAST(n AS BIGINT) AS n FROM top0
UNION ALL
SELECT 2 AS merge_round, w1, w2, w1 || '_' || w2 AS merged, CAST(n AS BIGINT) AS n FROM top1
UNION ALL
SELECT 3 AS merge_round, w1, w2, w1 || '_' || w2 AS merged, CAST(n AS BIGINT) AS n FROM top2
"""
)


# --------------------------------------------------------------------------
# bpe_encode — apply the learned merge table back to the corpus
# --------------------------------------------------------------------------

def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8c — ENCODE with the tokenizer ``bpe_merges`` trains: re-derive
    the same three greedy merges (identical statistics, so the learned
    table is by construction the one training emits), apply all three to
    every document, and report the per-document encoding outcome:
    (doc_id, n_raw, n_bpe, n_merged, compression) — the token-budget
    accounting a pipeline runs to size a training corpus after switching
    tokenizers.

    Scale shape: identical to the training loop — each round is one
    pair-keyed map-side-combinable shuffle plus a broadcast 1-row merge
    applied as a map-side projection with doc_id carried through; the
    final stats are a per-row projection of the encoded state. The
    corpus is shuffled only on pair keys, never on content or doc id.
    Per-round persists bound recomputation exactly as in the training
    loop (see ``q_bpe_merges``); scoped_persist releases the previous
    invocation's rounds (cache.py).
    """
    from amazon_macie_activity_generator_spark.cache import begin_scope, scoped_persist

    begin_scope("bpe_encode", spark)
    docs = load_table(spark, sf_dir, "documents")
    cur = scoped_persist(
        docs.select(
            "doc_id",
            tokens_expr(F.col("text")).alias("tk"),
        ).withColumn("n_raw", F.size("tk").cast("long")),
        "bpe_encode",
    )
    for r in (1, 2, 3):
        top = _bpe_top_pair(cur)
        cur = scoped_persist(
            _bpe_apply(cur, top, carry=("doc_id", "n_raw")), "bpe_encode"
        )
    n_bpe = F.size("tk").cast("long")
    return cur.select(
        "doc_id",
        "n_raw",
        n_bpe.alias("n_bpe"),
        (F.col("n_raw") - n_bpe).alias("n_merged"),
        F.when(F.col("n_raw") > 0, F.round(n_bpe / F.col("n_raw"), 4))
        .otherwise(F.lit(1.0))
        .alias("compression"),
    )


SQL_BPE_ENCODE = (
    # n_raw is CARRIED through the rounds like the Spark side carries
    # ("doc_id", "n_raw"): the old final `t0 JOIN t3 USING (doc_id)`
    # silently dropped NULL-doc_id documents (joins drop NULL keys in
    # both engines) while Spark kept them — encode is per-row on text,
    # identity is just carried along
    # lateral column alias (len(tk), not len(<tokenizer>) again): the
    # tokenizer is the dominant cost of the CTE, evaluate it once
    f"WITH t0 AS (SELECT doc_id, {_DUCK_TOKS5} AS tk,"
    f" CAST(len(tk) AS BIGINT) AS n_raw FROM documents),"
    + _BPE_DUCK_ROUND.format(r=0) + ","
    + _BPE_DUCK_APPLY.format(r=0, nxt=1, carry="doc_id, n_raw, ") + ","
    + _BPE_DUCK_ROUND.format(r=1) + ","
    + _BPE_DUCK_APPLY.format(r=1, nxt=2, carry="doc_id, n_raw, ") + ","
    + _BPE_DUCK_ROUND.format(r=2) + ","
    + _BPE_DUCK_APPLY.format(r=2, nxt=3, carry="doc_id, n_raw, ")
    + """
SELECT doc_id,
       n_raw,
       CAST(len(tk) AS BIGINT) AS n_bpe,
       CAST(n_raw - len(tk) AS BIGINT) AS n_merged,
       CASE WHEN n_raw > 0
            THEN round(CAST(len(tk) AS DOUBLE) / n_raw, 4)
            ELSE 1.0 END AS compression
FROM t3
"""
)


# --------------------------------------------------------------------------
# training_mix — end-to-end training-set assembly decision table
# --------------------------------------------------------------------------

def q_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X31 — the composed pipeline a training run actually executes, as
    one decision table: Gopher-style quality gate (word-count bounds,
    mean-word-length bounds, stopword minimum — exact rules of
    ``gopher_quality_flags``) -> exact dedup among quality survivors
    (canonical = min doc_id per identical text, ``dedup_exact``
    semantics) -> domain-mixture upsample factor over the surviving
    corpus (balance-to-largest, ``mix_sampling_weights`` semantics).
    One row per document: why it was kept/dropped and, if kept, how
    often it repeats per epoch.

    Scale shape: one corpus scan computes all per-doc features; the
    dedup census is one text-keyed grouped aggregation over quality
    survivors (at 100 TB key on md5(text) — same census, 16-byte
    shuffle keys); the per-source totals and the global max ride back
    as broadcast one-row/|sources|-row frames. No windows, no pair
    joins, no Python.
    """
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    n_words, mean_wl, n_stop = _G.gopher_feature_exprs()
    feat = docs.select(
        "doc_id", "source", "text",
        n_words.cast("long").alias("n_tokens"),
        _G.gopher_keep_expr(n_words, mean_wl, n_stop).alias("quality_keep"),
    )
    # r13 (guide §2.2): the dedup census is ONE text-partitioned window
    # — min(doc_id) over quality rows of the same text — instead of a
    # survivors groupBy(text) plus a full-corpus text-keyed join back
    # (which shuffled the text column three times: the aggregate, and
    # both SortMergeJoin sides). min(when(quality, id)) skips non-quality
    # rows exactly like the old filtered aggregate. NULL-text docs form
    # one window partition where the join matched nothing, but their
    # quality_keep is definitively False (gopher features coalesce NULL
    # text to empty), so dedup_keep is False either way.
    canon_id = F.min(
        F.when(F.col("quality_keep"), F.col("doc_id"))
    ).over(Window.partitionBy("text"))
    # coalesce(.., False), matching the oracle's final coalesce: a
    # NULL-id duplicate compares NULL to its canon and must come out
    # False (not NULL) in both engines — an id-less row is never the
    # canonical copy (min(doc_id) skips NULLs identically in both)
    with_canon = feat.select(
        "doc_id", "source", "n_tokens", "quality_keep",
        F.coalesce(
            F.col("quality_keep") & (F.col("doc_id") == canon_id),
            F.lit(False),
        ).alias("dedup_keep"),
    )
    kept = with_canon.withColumn(
        "final_keep", F.col("quality_keep") & F.col("dedup_keep")
    )
    per_src = (
        kept.filter(F.col("final_keep"))
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("src_tokens"))
    )
    mx = per_src.agg(F.max("src_tokens").alias("mx"))
    return (
        kept.join(F.broadcast(per_src), "source", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            "doc_id", "source", "n_tokens", "quality_keep", "dedup_keep",
            "final_keep",
            F.when(
                F.col("final_keep"),
                F.round(F.col("mx") / F.col("src_tokens"), 6),
            ).otherwise(F.lit(0.0)).alias("upsample_factor"),
        )
    )


SQL_TRAINING_MIX = f"""
WITH feat AS (
  SELECT doc_id, source, text,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         (len(tk) >= {_G.GOPHER_WORDS_LO} AND len(tk) <= {_G.GOPHER_WORDS_HI}
          AND round(CAST(coalesce(list_sum(list_transform(tk, w -> length(w))), 0)
                         AS DOUBLE) / greatest(len(tk), 1), 6)
              BETWEEN {_G.GOPHER_MWL_LO} AND {_G.GOPHER_MWL_HI}
          AND len(list_filter(tk, w -> list_contains(
                {_G._DUCK_STOPLIST}, w))) >= {_G.GOPHER_STOP_MIN}) AS quality_keep
  FROM (SELECT doc_id, source, text, coalesce({_DUCK_TOKS5}, []) AS tk
        FROM documents)
),
canon AS (
  SELECT text, min(doc_id) AS canon_id FROM feat WHERE quality_keep GROUP BY text
),
kept AS (
  SELECT f.doc_id, f.source, f.n_tokens, f.quality_keep,
         (f.quality_keep AND f.doc_id = c.canon_id) AS dedup_keep,
         (f.quality_keep AND f.doc_id = c.canon_id) AS final_keep
  FROM feat f LEFT JOIN canon c USING (text)
),
per_src AS (
  SELECT source, sum(n_tokens) AS src_tokens FROM kept WHERE final_keep GROUP BY source
)
SELECT k.doc_id, k.source, k.n_tokens,
       k.quality_keep,
       coalesce(k.dedup_keep, FALSE) AS dedup_keep,
       coalesce(k.final_keep, FALSE) AS final_keep,
       CASE WHEN coalesce(k.final_keep, FALSE)
            THEN round((SELECT max(src_tokens) FROM per_src) / CAST(p.src_tokens AS DOUBLE), 6)
            ELSE 0.0 END AS upsample_factor
FROM kept k LEFT JOIN per_src p USING (source)
"""


# --------------------------------------------------------------------------
# split_leakage — near-dup pairs straddling the train/holdout split
# --------------------------------------------------------------------------

def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X34 — eval-contamination audit: which NEAR-DUPLICATE pairs straddle
    the deterministic train/holdout split? A random document-level split
    puts ~2·p·(1-p) of every near-dup cluster's pairs across the boundary
    — each one a copy of training data inside the eval set — and this is
    the check every pipeline runs before trusting a held-out metric.

    Pure composition of two oracle-checked pieces: the md5 MinHash-LSH
    pipeline (``dedup_minhash_md5``, the cross-engine candidate
    generator) supplies the pairs, and the md5 hash split
    (``hash_split``, 0.9 train) classifies each endpoint as a MAP-SIDE
    EXPRESSION over the pair table — no join, no extra shuffle; the
    audit costs exactly the dedup pass it rides on. ``leaks`` marks the
    straddling pairs.
    """
    from amazon_macie_activity_generator_spark.operators.dedup import (
        dedup_minhash_md5_pairs,
    )
    from amazon_macie_activity_generator_spark.operators.sampling import hash_split
    from amazon_macie_activity_generator_spark.queries_ext import _docs_aug

    pairs = dedup_minhash_md5_pairs(_docs_aug(spark, sf_dir))
    # the ONE split definition (operators/sampling.py), applied per
    # endpoint — salt/threshold/labels can never drift from the
    # hash_split catalog entry this audit composes with
    tagged = hash_split(
        hash_split(pairs, "id_a", train_fraction=0.9, out_col="split_a"),
        "id_b", train_fraction=0.9, out_col="split_b",
    )
    return tagged.select(
        "id_a", "id_b", "jaccard", "split_a", "split_b",
        (F.col("split_a") != F.col("split_b")).alias("leaks"),
    )


def _sql_split_leakage() -> str:
    """Oracle: the dedup_minhash_md5 pipeline verbatim as a CTE (nested
    WITH — one definition, imported not re-derived) + the hash_split
    CASE applied to both pair endpoints."""
    from amazon_macie_activity_generator_spark.operators.sampling import (
        split_threshold_hex,
    )
    from amazon_macie_activity_generator_spark.queries_ext import (
        SQL_DEDUP_MINHASH_MD5,
    )

    thr = split_threshold_hex(0.9)
    case = (
        "CASE WHEN substr(md5('split:' || CAST({c} AS VARCHAR)), 1, 6) < '"
        + thr
        + "' THEN 'train' ELSE 'holdout' END"
    )
    sa, sb = case.format(c="id_a"), case.format(c="id_b")
    return f"""
WITH pairs AS ({SQL_DEDUP_MINHASH_MD5})
SELECT id_a, id_b, jaccard,
       {sa} AS split_a,
       {sb} AS split_b,
       ({sa}) <> ({sb}) AS leaks
FROM pairs
"""


def q_embedding_finite_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2d-g — ingest-time embedding validation gate (round 7): classify
    every vector as ``null`` / ``empty`` / ``non_finite`` (any component
    that is NULL, NaN, or ±Inf — fp overflow happens at crawl scale) /
    ``wrong_dim`` (length differs from the corpus's MODAL length —
    ragged encodes are routine in a 100 TB re-ingest, have no geometry
    against the corpus, and crashed every numpy kernel path before the
    zero-fill guards) / ``zero_norm`` / ``ok``, with per-class counts.
    The quarantine step the similarity geometry assumes ran: downstream
    cosine/LSH/IVF operators are specified over gated (``ok``) vectors,
    and ``quantize_int8`` additionally hard-guards because a cast of
    round(NaN) to int is a job-killing CAST_OVERFLOW under ANSI mode.
    The component predicate is `similarity.nonfinite_component` — ONE
    definition shared with the quantizer and both SQL twins.

    Map-only single pass (one exists() + one aggregate() per vector)
    plus a count-per-length aggregate folded to a broadcast one-row
    modal frame, then a 6-group aggregation — at 100 TB this is
    scan-bound, shuffles a handful of rows per task. The zero_norm fold
    runs AFTER the non_finite branch, so it only ever sees fully-finite
    components (a NULL element would make the fold NULL and SQL's
    NULL-skipping sum 0 — divergent). Modal tie-break: larger count,
    then SMALLER length — mirrored in the oracle's ORDER BY."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    # modal length as a LAZY one-row broadcast (max over (count, -len)
    # structs == largest count, smallest len; NULL struct on an
    # all-NULL/empty corpus, in which case no row reaches wrong_dim)
    modal = (
        emb.where(e.isNotNull())
        .groupBy(F.size(e).alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max(F.struct(F.col("c"), (-F.col("d")).alias("nd"))).alias("m"))
        .select((-F.col("m.nd")).alias("_modal_dim"))
    )
    sumsq = F.aggregate(
        e, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
    )
    status = (
        F.when(e.isNull(), F.lit("null"))
        .when(F.size(e) == 0, F.lit("empty"))
        .when(F.exists(e, nonfinite_component), F.lit("non_finite"))
        .when(F.size(e) != F.col("_modal_dim"), F.lit("wrong_dim"))
        .when(sumsq == 0, F.lit("zero_norm"))
        .otherwise(F.lit("ok"))
    )
    return (
        emb.crossJoin(F.broadcast(modal))
        .select(status.alias("status"), "vec_id")
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("first_vec_id"))
    )


SQL_EMBEDDING_FINITE_GATE = f"""
WITH dims AS (
  SELECT len(embedding) AS d, count(*) AS c FROM embeddings
  WHERE embedding IS NOT NULL GROUP BY 1
), modal AS (
  -- largest count, then SMALLER length (mirrors the Spark struct-max)
  SELECT d FROM dims ORDER BY c DESC, d ASC LIMIT 1
), cls AS (
  SELECT vec_id,
         CASE WHEN embedding IS NULL THEN 'null'
              WHEN len(embedding) = 0 THEN 'empty'
              WHEN len(list_filter(embedding, x -> {NONFINITE_COMPONENT_SQL})) > 0 THEN 'non_finite'
              WHEN len(embedding) <> (SELECT d FROM modal) THEN 'wrong_dim'
              WHEN list_aggregate(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') = 0 THEN 'zero_norm'
              ELSE 'ok' END AS status
  FROM embeddings
)
SELECT status, count(*) AS n_vectors, min(vec_id) AS first_vec_id
FROM cls GROUP BY status
"""


def q_events_time_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time EVENT TIMESTAMP validation gate (round 7), the events
    twin of ``embedding_finite_gate``: classify every event as
    ``null_ts`` / ``pre_epoch`` (before 1970) / ``far_future`` (2100+)
    / ``ok``, with per-class counts. Wild timestamps are a certainty in
    a 100 TB crawl and they do real damage downstream: a year-9999 row
    explodes min..max calendar spines into multi-million-slot grids
    (hourly_activity_spine / interpolate_gaps carry hard span caps as
    guard rails), poisons streaming WATERMARKS (max-event-time − delay
    discards every sane event as late), and pre-epoch fractional seconds
    sit exactly on the engines' trunc-vs-floor epoch disagreement.
    Quarantine first; the time-ordered operators are specified over
    gated (``ok``) events. Map-only scan + 4-group aggregation."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts")
    status = (
        F.when(ts.isNull(), F.lit("null_ts"))
        .when(ts < F.lit("1970-01-01 00:00:00").cast("timestamp"), F.lit("pre_epoch"))
        .when(ts >= F.lit("2100-01-01 00:00:00").cast("timestamp"), F.lit("far_future"))
        .otherwise(F.lit("ok"))
    )
    return (
        ev.select(status.alias("status"), "event_id")
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("event_id").alias("first_event_id"))
    )


SQL_EVENTS_TIME_GATE = """
WITH cls AS (
  SELECT event_id,
         CASE WHEN ts IS NULL THEN 'null_ts'
              WHEN ts < TIMESTAMP '1970-01-01 00:00:00' THEN 'pre_epoch'
              WHEN ts >= TIMESTAMP '2100-01-01 00:00:00' THEN 'far_future'
              ELSE 'ok' END AS status
  FROM events
)
SELECT status, count(*) AS n_events, min(event_id) AS first_event_id
FROM cls GROUP BY status
"""


def q_doc_id_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time PRIMARY-KEY validation gate (round 7), the documents
    twin of ``embedding_finite_gate`` / ``events_time_gate``: a 100 TB
    crawl re-ingests pages, so duplicate ``doc_id`` rows are routine —
    identical re-crawls AND conflicting re-crawls after an edit. A
    duplicate-key probe showed 8 catalog entries silently diverging
    cross-engine on such input (pick-one windows, pair predicates, and
    per-id joins all assume key uniqueness). Quarantine first: classify
    every doc_id as ``unique`` / ``dup_identical`` (same text repeated) /
    ``dup_conflict`` (different texts share the id), and name the
    deterministic winner — the row whose content hash (md5 of text, NULL
    text ≡ '' per the NULL contract) is lexicographically smallest.
    Downstream documents operators are specified over gated (one row per
    doc_id) corpora; tests/test_degenerate_corpus.py pins that every
    documents-family entry agrees cross-engine once the gate has run.

    One hash aggregation on doc_id (map-side partial agg) — scan-bound at
    100 TB, no joins, no windows."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.coalesce(F.col("text"), F.lit("")))
    agg = docs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(h).alias("n_variants"),
        F.min(h).alias("kept_md5"),
    )
    status = (
        F.when(F.col("n_rows") == 1, F.lit("unique"))
        .when(F.col("n_variants") == 1, F.lit("dup_identical"))
        .otherwise(F.lit("dup_conflict"))
    )
    return agg.select("doc_id", "n_rows", "n_variants", status.alias("status"), "kept_md5")


SQL_DOC_ID_DEDUP_GATE = """
WITH agg AS (
  SELECT doc_id,
         count(*) AS n_rows,
         count(DISTINCT md5(coalesce(text, ''))) AS n_variants,
         min(md5(coalesce(text, ''))) AS kept_md5
  FROM documents GROUP BY doc_id
)
SELECT doc_id, n_rows, n_variants,
       CASE WHEN n_rows = 1 THEN 'unique'
            WHEN n_variants = 1 THEN 'dup_identical'
            ELSE 'dup_conflict' END AS status,
       kept_md5
FROM agg
"""


def q_vec_id_unique_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings half of the primary-key gate: duplicate ``vec_id`` rows
    (re-encoded shards landing twice) made kNN/LSH/kmeans entries diverge
    in the same probe. Unlike documents there is no portable content hash
    for a float vector (string formatting of floats differs per engine),
    so this half DETECTS — per-id row count and whether the duplicate
    rows are at least norm-identical after 6-dp rounding — and the
    contract requires upstream resolution; downstream similarity
    operators are specified over unique-id corpora. Scan + one hash agg,
    scale-safe."""
    emb = load_table(spark, sf_dir, "embeddings")
    # empty vector -> NULL norm explicitly: Spark's aggregate() seed sums
    # [] to 0.0 where DuckDB's list_aggregate([],'sum') is NULL (the
    # pinned empty-sum trap) — countDistinct skips NULL in both engines
    # round_fixed, not native round(): the norm fingerprint is exactly the
    # derived-value class whose half boundaries diverge cross-engine
    norm6 = F.when(
        F.size("embedding") > 0,
        round_fixed(
            F.sqrt(
                F.aggregate(
                    F.col("embedding"),
                    F.lit(0.0),
                    lambda a, x: a + x.cast("double") * x.cast("double"),
                )
            ),
            6,
        ),
    )
    agg = emb.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(norm6).alias("n_norms"),
    )
    status = (
        F.when(F.col("n_rows") == 1, F.lit("unique"))
        .when(F.col("n_norms") == 1, F.lit("dup_same_norm"))
        .otherwise(F.lit("dup_conflict"))
    )
    return agg.select("vec_id", "n_rows", status.alias("status"))


SQL_VEC_ID_UNIQUE_AUDIT = f"""
WITH agg AS (
  SELECT vec_id,
         count(*) AS n_rows,
         count(DISTINCT {sql_round_fixed(
             "sqrt(list_aggregate(list_transform(embedding, "
             "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))", 6)}) AS n_norms
  FROM embeddings GROUP BY vec_id
)
SELECT vec_id, n_rows,
       CASE WHEN n_rows = 1 THEN 'unique'
            WHEN n_norms = 1 THEN 'dup_same_norm'
            ELSE 'dup_conflict' END AS status
FROM agg
"""


def q_event_id_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events half of the primary-key gate family (round 7): at-least-once
    delivery makes duplicate ``event_id`` rows routine — exact redelivery
    copies AND same-id rows with mutated payloads. Seven series-pipeline
    entries (align/anomaly/pivot/rolling/collect) silently diverged
    cross-engine on such input (slot aggregations tie-break differently).
    Classify each event_id as ``unique`` / ``dup_identical`` (drop the
    copies) / ``dup_conflict`` (quarantine; upstream must resolve — there
    is no portable winner rule over a float payload). Payload identity is
    the full row struct (ts at MICROsecond identity — the engine's
    timestamp unit — plus user/type/value/props); struct distinctness
    treats NULL fields as equal and NaN as NaN in BOTH engines, which a
    multi-column countDistinct would not (it drops any-NULL rows).
    One hash aggregation, scan-bound at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    payload = F.struct(
        F.unix_micros(F.col("ts")).alias("t"),
        "user_id", "event_type", "value", "props",
    )
    agg = ev.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(payload).alias("n_variants"),
    )
    status = (
        F.when(F.col("n_rows") == 1, F.lit("unique"))
        .when(F.col("n_variants") == 1, F.lit("dup_identical"))
        .otherwise(F.lit("dup_conflict"))
    )
    return agg.select("event_id", "n_rows", "n_variants", status.alias("status"))


SQL_EVENT_ID_DEDUP_GATE = """
WITH agg AS (
  SELECT event_id,
         count(*) AS n_rows,
         count(DISTINCT struct_pack(
             t := epoch_us(ts), u := user_id, e := event_type,
             v := value, p := props)) AS n_variants
  FROM events GROUP BY event_id
)
SELECT event_id, n_rows, n_variants,
       CASE WHEN n_rows = 1 THEN 'unique'
            WHEN n_variants = 1 THEN 'dup_identical'
            ELSE 'dup_conflict' END AS status
FROM agg
"""


def q_events_value_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time EVENT VALUE validation gate (round 7), completing the
    gate family (``embedding_finite_gate`` / ``events_time_gate`` /
    ``event_id_dedup_gate``): classify every event's measurement as
    ``null_value`` / ``non_finite`` (NaN or ±Inf — fp overflow and bad
    sensor encodes are routine at 100 TB) / ``extreme`` (|v| > 1e12 —
    the catalog's strictest value arithmetic is 4-dp int64 fixed-point
    rounding, exact only to ~9.2e14; 1e12 leaves three orders of
    magnitude of summation headroom before any downstream sum can reach
    that cliff) / ``ok``, with per-class counts.

    Why it exists, measured on this catalog: a non-finite probe over the
    51 events-reading entries found one Spark-side job-killer (the
    anomaly magnitude's ANSI ``CAST_OVERFLOW`` on an Inf series max —
    now try_cast, degrading to NULL), six oracle-side int-cast aborts,
    and eleven silent cross-engine divergences (NaN ordering in windows,
    NaN grouping, percentile interpolation). Quarantine first: the
    value-arithmetic operators are specified over gated (``ok`` +
    ``null_value``) events, pinned by the degenerate sweep. NULL values
    stay in-contract — every aggregate already skips them symmetrically.

    Map-only scan + 4-group aggregation; shuffles four rows per task."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    status = (
        F.when(v.isNull(), F.lit("null_value"))
        .when(F.isnan(v) | (F.abs(v) == F.lit(float("inf"))), F.lit("non_finite"))
        .when(F.abs(v) > F.lit(1e12), F.lit("extreme"))
        .otherwise(F.lit("ok"))
    )
    return (
        ev.select(status.alias("status"), "event_id")
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("event_id").alias("first_event_id"))
    )


SQL_EVENTS_VALUE_GATE = """
WITH cls AS (
  SELECT event_id,
         CASE WHEN value IS NULL THEN 'null_value'
              WHEN isnan(value) OR isinf(value) THEN 'non_finite'
              WHEN abs(value) > 1e12 THEN 'extreme'
              ELSE 'ok' END AS status
  FROM events
)
SELECT status, count(*) AS n_events, min(event_id) AS first_event_id
FROM cls GROUP BY status
"""


def q_multimodal_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode (round 8, VERDICT r7 ask #2): id-parameterized
    BMP/PPM/PNG payloads (operators/multimodal.py synthetic_pixel_media —
    raw RGB byte j of media ``id`` is (id + j) % 256, container by
    id % 4) are decoded by ``decode_pixels`` with no third-party libs:
    BMP 24-bpp padded bottom-up BGR, PPM P6, PNG via zlib inflate +
    reconstruction of all five row filters (the encoder rotates filters
    r % 5, so a decoder that botches Sub/Up/Average/Paeth cannot match),
    and GIF through the real LZW compressor + a fixed 256-color palette
    (so the hash also proves the variable-width LZW decoder). Round 13
    sub-routes id%8==4 to TGA (type 2/10 truecolor incl. RLE, both row
    origins, 24/32 bpp), id%8==5 to QOI (full op set), and id%8==7 to
    TIFF (II+MM byte orders, LZW/PackBits/uncompressed, predictor-2
    differencing, tiled + strip organization) — all lossless over the
    same raw fill, so only the fmt column's CASE changes here while
    the sums stay formula-derived.
    The oracle re-derives per-channel sums arithmetically over the raw
    index space — a hash match proves every pixel byte was decoded
    through the real container format. The pixel sha256 column is
    engine-local evidence (unit-tested), excluded here because DuckDB
    cannot build arbitrary-byte blobs to hash. NULL doc_ids are excluded
    in BOTH engines — the corpus-wide no-key-no-identity rule (payloads
    here are synthesized FROM the id, so an id-less row has no media) —
    and so are negative ids: Python's floored % and DuckDB's truncated %
    disagree below zero (-1 % 32 is 31 vs -1), so the id-parameterized
    payload grammar is defined over non-negative ids only."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        decode_pixels,
        synthetic_pixel_media,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
        & (F.col("doc_id") >= 0)
        & (F.col("doc_id") < 300)
    )
    media = synthetic_pixel_media(docs.select("doc_id"))

    out = decode_pixels(media)
    return out.select(
        "media_id", "fmt", "width", "height", "n_pixels",
        "r_sum", "g_sum", "b_sum",
    )


SQL_MULTIMODAL_PIXELS = """
WITH m AS (
  -- rk: one output row PER INPUT ROW — grouping by media_id alone would
  -- collapse duplicate doc_ids into one row with doubled sums while the
  -- Spark side emits one decoded row per input row
  SELECT doc_id AS media_id,
         ROW_NUMBER() OVER (ORDER BY doc_id) AS rk,
         CASE WHEN doc_id % 8 = 4 THEN 'tga' WHEN doc_id % 8 = 5 THEN 'qoi'
              WHEN doc_id % 8 = 7 THEN 'tiff'
              WHEN doc_id % 4 = 0 THEN 'bmp' WHEN doc_id % 4 = 1 THEN 'ppm'
              WHEN doc_id % 4 = 2 THEN 'png' ELSE 'gif' END AS fmt,
         1 + doc_id % 32 AS w, 1 + doc_id % 24 AS h
  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0 AND doc_id < 300
), px AS (
  SELECT media_id, rk, fmt, w, h, unnest(range(w * h * 3)) AS j FROM m
)
SELECT media_id, fmt,
       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(sum(CASE WHEN j % 3 = 0 THEN (media_id + j) % 256 END) AS BIGINT) AS r_sum,
       CAST(sum(CASE WHEN j % 3 = 1 THEN (media_id + j) % 256 END) AS BIGINT) AS g_sum,
       CAST(sum(CASE WHEN j % 3 = 2 THEN (media_id + j) % 256 END) AS BIGINT) AS b_sum
FROM px GROUP BY media_id, rk, fmt, w, h
"""


def q_multimodal_pixels_palette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PALETTE-PNG decode (round 9, VERDICT r8 ask #3): 8-bit indexed
    PNGs (color type 3) are the dominant non-truecolor format in real
    crawls; ``synthetic_palette_media`` (operators/multimodal.py) builds
    them with an id-parameterized index stream (pixel p carries index
    (id + p) %% 256) AND an id-parameterized 256-entry palette (entry k =
    ((3k + id), (5k + 2id), (7k + 3id)) %% 256), row filters rotating
    r %% 5 over the 1-byte index stream. The oracle re-derives the
    decoded channel sums arithmetically through the palette indirection,
    so a hash match proves PLTE lookup + index-width filter
    reconstruction, not just container sniffing. Same id conventions as
    ``multimodal_pixels``: NULL and negative doc_ids are excluded in both
    engines (no key = no media; Python floored %% vs DuckDB truncated %%
    diverge below zero)."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        decode_pixels,
        synthetic_palette_media,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
        & (F.col("doc_id") >= 0)
        & (F.col("doc_id") < 300)
    )
    media = synthetic_palette_media(docs.select("doc_id"))

    out = decode_pixels(media)
    return out.select(
        "media_id", "fmt", "width", "height", "n_pixels",
        "r_sum", "g_sum", "b_sum",
    )


SQL_MULTIMODAL_PIXELS_PALETTE = """
WITH m AS (
  -- rk: one output row PER INPUT ROW (duplicate doc_ids must not
  -- collapse — the Spark side decodes one media row per input row)
  SELECT doc_id AS media_id,
         ROW_NUMBER() OVER (ORDER BY doc_id) AS rk,
         1 + doc_id % 32 AS w, 1 + doc_id % 24 AS h
  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0 AND doc_id < 300
), px AS (
  SELECT media_id, rk, w, h, unnest(range(w * h)) AS p FROM m
), lut AS (
  -- palette lookup: pixel p carries index k = (id + p) % 256; palette
  -- entry k decodes to ((3k + id), (5k + 2id), (7k + 3id)) % 256
  SELECT media_id, rk, w, h, (media_id + p) % 256 AS k FROM px
)
SELECT media_id, 'png' AS fmt,
       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(sum((3 * k + media_id) % 256) AS BIGINT) AS r_sum,
       CAST(sum((5 * k + 2 * media_id) % 256) AS BIGINT) AS g_sum,
       CAST(sum((7 * k + 3 * media_id) % 256) AS BIGINT) AS b_sum
FROM lut GROUP BY media_id, rk, w, h
"""


def q_multimodal_pixels_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG decode (round 10, VERDICT r9 ask #1 — the last first-class
    raster format): id-parameterized JFIF files built by the real
    entropy encoder (``operators/jpeg.py``) with flat quant tables
    (q=8) and DC-only blocks are decoded by ``decode_pixels`` through
    the full pipeline — marker parse, table-driven Huffman decode of
    the interleaved scan (with byte stuffing and, for id %% 3 == 1,
    restart markers + DC predictor resets; id %% 5 == 2 files are
    PROGRESSIVE SOF2 with libjpeg's 10-scan script, whose full
    refinement ends at the same pixels — so the same oracle also pins
    the multi-scan DC-first/refine + AC EOB-run machinery), dequantize,
    vectorized IDCT, replication chroma upsampling (4:4:4 and 4:2:0 by
    id %% 2), and the 16-bit fixed-point YCbCr->RGB conversion. A
    DC-only block's IDCT is exactly constant ``dc*q/8 = dc`` (q=8), so
    every decoded sample is ``dc + 128`` and the oracle re-derives the
    channel sums arithmetically: per Y block b, y = 128 + (id+7b)%%64-32
    with chroma (2id+11c)%%64-32 / (3id+5c)%%64-32 for chroma block
    c = b (4:4:4) or b//4 (4:2:0), then the decoder's exact fixed-point
    conversion (floor((91881*cr1 + 32768)/65536) etc.). A hash match
    therefore proves real Huffman+IDCT+upsample+color decode, not
    container sniffing. Round 13: the id %% 7 == 3 slice wraps the same
    JPEG content in TIFF compression-7 containers (single full strip /
    per-MCU-row strips with JPEGTables tag-347 abbreviation /
    self-contained per-row strips, II+MM byte orders) — strips slice
    the scan-order DC arrays at MCU-row boundaries so the pasted
    decode is pixel-identical, the sums formula is unchanged, and only
    the fmt CASE flips to 'tiff'; a hash match on that slice proves
    the container walk + tables splice + per-strip JPEG decode. Same
    id conventions as the other pixel entries: NULL and negative
    doc_ids excluded in both engines."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        decode_pixels,
        synthetic_jpeg_media,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
        & (F.col("doc_id") >= 0)
        & (F.col("doc_id") < 300)
    )
    media = synthetic_jpeg_media(docs.select("doc_id"))

    out = decode_pixels(media)
    return out.select(
        "media_id", "fmt", "width", "height", "n_pixels",
        "r_sum", "g_sum", "b_sum",
    )


SQL_MULTIMODAL_PIXELS_JPEG = """
WITH m AS (
  -- rk: one output row PER INPUT ROW (duplicate doc_ids must not
  -- collapse — the Spark side decodes one media row per input row)
  SELECT doc_id AS media_id,
         ROW_NUMBER() OVER (ORDER BY doc_id) AS rk,
         doc_id % 2 AS sub,
         -- round 13: the id%7==3 slice ships the same JPEG content
         -- inside a TIFF compression-7 container, so only fmt flips
         CASE WHEN doc_id % 7 = 3 THEN 'tiff' ELSE 'jpeg' END AS fmt,
         CASE WHEN doc_id % 2 = 0 THEN 8 * (1 + doc_id % 4)
              ELSE 16 * (1 + doc_id % 3) END AS w,
         CASE WHEN doc_id % 2 = 0 THEN 8 * (1 + doc_id % 3)
              ELSE 16 * (1 + doc_id % 2) END AS h
  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0 AND doc_id < 300
), blk AS (
  -- one row per 8x8 luma block, scan order; n_blocks = (w/8)*(h/8) for
  -- BOTH subsamplings (4:2:0 has 4 Y blocks per 16x16 MCU)
  SELECT media_id, rk, fmt, w, h, sub,
         unnest(range((w // 8) * (h // 8))) AS yb
  FROM m
), cc AS (
  -- DC-only blocks with flat q=8: decoded Y sample = 128 + dcY(yb);
  -- chroma block index is yb (4:4:4) or yb//4 (= its MCU, 4:2:0)
  SELECT media_id, rk, fmt, w, h,
         128 + ((media_id + 7 * yb) % 64) - 32 AS y,
         ((2 * media_id + 11 * (CASE WHEN sub = 0 THEN yb ELSE yb // 4 END)) % 64) - 32 AS cb1,
         ((3 * media_id + 5 * (CASE WHEN sub = 0 THEN yb ELSE yb // 4 END)) % 64) - 32 AS cr1
  FROM blk
), rgb AS (
  -- the decoder's exact fixed-point YCbCr->RGB (arithmetic shift = floor)
  SELECT media_id, rk, fmt, w, h,
         GREATEST(0, LEAST(255, y + CAST(floor((91881 * cr1 + 32768) / 65536.0) AS BIGINT))) AS r,
         GREATEST(0, LEAST(255, y - CAST(floor((22554 * cb1 + 46802 * cr1 + 32768) / 65536.0) AS BIGINT))) AS g,
         GREATEST(0, LEAST(255, y + CAST(floor((116130 * cb1 + 32768) / 65536.0) AS BIGINT))) AS b
  FROM cc
)
SELECT media_id, fmt,
       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(64 * sum(r) AS BIGINT) AS r_sum,
       CAST(64 * sum(g) AS BIGINT) AS g_sum,
       CAST(64 * sum(b) AS BIGINT) AS b_sum
FROM rgb GROUP BY media_id, rk, fmt, w, h
"""


def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode (round 11; round 12 adds the LOSSY lane — the
    audio twin of the pixel entries): id-parameterized RIFF/WAVE files
    from the ``synthetic_audio_media`` grammar are decoded by
    ``extract_audio_features`` (Arrow-batched mapInPandas over
    ``_decode_wav_pcm``). id%7 != 5: integer PCM — bits (8/16/24 by
    id%3, spanning unsigned-centered, signed-LE, and sign-extended
    lanes), channels 1+id%2, rate 8000*(1+id%3), n_frames 50+id%200,
    flat sample j = ((id*7 + 13j) % 201) - 100 — lossless, so the
    oracle re-derives every stat from the input formula. id%7 == 5:
    MONO IMA ADPCM (samples/block 9/17/25 — multi-block with padded
    final block + fact truncation), a LOSSY codec: the oracle REPLAYS
    the encode-by-decode state machine as a recursive CTE (89-entry
    step table, quantizer thresholds, reconstruction diff, int16
    clamp, index walk), so a hash match proves the engine ran the
    actual ADPCM predictor over every nibble — compressed-audio decode,
    not header sniffing. id%7 == 3 (round 13): MONO MS-ADPCM (fmt
    0x02; samples/block 10/18/26, coefficient pair (id//7)%7 walking
    all seven standard pairs, initial iDelta 16 + (id%11)*9) — also
    lossy, also replayed as a recursive CTE (two-sample linear
    predictor, floored-division quantizer, symmetric delta-adaptation
    table, per-block header restart). id%7 == 1 / id%7 == 6 (round
    13): G.711 µ-law / A-law (mono+stereo, input amplified x327 to
    sweep all companding segments) — lossy but STATELESS, so the
    oracle re-derives decode(encode(x)) per sample with the CCITT
    arithmetic, no recursion. Late round 13: of the integer-PCM ids,
    (id//7) %% 3 == 1 files ship the same samples in an AIFF container
    (big-endian IFF, signed 8-bit, 80-bit extended-float rate, IFF pad
    bytes, alternating SSND offsets) and (id//7) %% 3 == 2 files in a
    Sun/NeXT .au container (big-endian signed PCM, annotation
    padding) — lossless and stat-identical, so the unchanged oracle
    hash also proves both container parses. Exact int64
    sample_sum / abs_peak, duration flooring, float64 rms
    bit-identical via exact-integer sums under 2^53. NULL/negative
    doc_ids excluded in both engines."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        extract_audio_features,
        synthetic_audio_media,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
        & (F.col("doc_id") >= 0)
        & (F.col("doc_id") < 400)
    )
    media = synthetic_audio_media(docs.select("doc_id"))

    return extract_audio_features(media)


SQL_MULTIMODAL_AUDIO = """
WITH RECURSIVE p AS (
  SELECT doc_id AS i,
         1 + doc_id % 2 AS nch,
         8000 * (1 + doc_id % 3) AS rate,
         50 + doc_id % 200 AS nf
  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0 AND doc_id < 400
        AND doc_id % 7 NOT IN (1, 3, 5, 6)
), s AS (
  SELECT i, nch, rate, nf,
         list_transform(range(nf * nch),
                        j -> (i * 7 + 13 * j) % 201 - 100) AS samples
  FROM p
), pcm AS (
  -- (CTE p above already excludes both compressed lanes)
  SELECT i AS media_id,
         CAST(rate AS BIGINT) AS sample_rate,
         CAST(nch AS BIGINT) AS n_channels,
         CAST(nf AS BIGINT) AS n_frames,
         CAST(nf * 1000 // rate AS BIGINT) AS duration_ms,
         CAST(list_sum(samples) AS BIGINT) AS sample_sum,
         CAST(list_max(list_transform(samples, x -> abs(x))) AS BIGINT) AS abs_peak,
         sqrt(CAST(list_sum(list_transform(samples, x -> x * x)) AS DOUBLE)
              / (nf * nch)) AS rms
  FROM s
), ap AS (
  -- IMA ADPCM lane (r12): mono, spb = 9/17/25, LOSSY — the oracle
  -- replays the encode-by-decode state machine of
  -- _wav_encode_ima_adpcm/_decode_wav_ima exactly: per block-start
  -- sample the header predictor IS the input; per nibble the quantizer
  -- thresholds (step, step/2, step/4), the reconstruction diff
  -- (step/8 + bit-weighted step terms), int16 clamp, and the index
  -- walk over the 89-entry step table
  SELECT doc_id AS i, 8000 * (1 + doc_id % 3) AS rate,
         50 + doc_id % 200 AS nf, 9 + 8 * (doc_id % 3) AS spb
  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0 AND doc_id < 400
        AND doc_id % 7 = 5
), st AS (
  SELECT i, rate, nf, spb, 0 AS t,
         CAST((i * 7) % 201 - 100 AS BIGINT) AS pred,
         0 AS idx,
         CAST((i * 7) % 201 - 100 AS BIGINT) AS ssum,
         CAST(abs((i * 7) % 201 - 100) AS BIGINT) AS apk,
         CAST(((i * 7) % 201 - 100) * ((i * 7) % 201 - 100) AS BIGINT) AS ssq
  FROM ap
  UNION ALL
  SELECT i, rate, nf, spb, t + 1, d,
         CASE WHEN (t + 1) % spb = 0 THEN idx
              ELSE GREATEST(0, LEAST(88,
                   idx + ([-1,-1,-1,-1,2,4,6,8])[n + 1])) END,
         ssum + d, GREATEST(apk, abs(d)), ssq + d * d
  FROM (
    SELECT i, rate, nf, spb, t, idx, ssum, apk, ssq, n,
           CASE WHEN (t + 1) % spb = 0 THEN x
                ELSE GREATEST(-32768, LEAST(32767,
                     pred + CASE WHEN x < pred THEN -diff ELSE diff END))
           END AS d
    FROM (
      SELECT *,
             step // 8 + CASE WHEN b4 THEN step ELSE 0 END
                       + CASE WHEN b2 THEN step // 2 ELSE 0 END
                       + CASE WHEN b1 THEN step // 4 ELSE 0 END AS diff,
             4 * CAST(b4 AS INT) + 2 * CAST(b2 AS INT) + CAST(b1 AS INT) AS n
      FROM (
        SELECT *, a1 - CASE WHEN b2 THEN step // 2 ELSE 0 END >= step // 4 AS b1
        FROM (
          SELECT *, a1 >= step // 2 AS b2
          FROM (
            SELECT *, a0 - CASE WHEN b4 THEN step ELSE 0 END AS a1
            FROM (
              SELECT *, a0 >= step AS b4
              FROM (
                SELECT i, rate, nf, spb, t, pred, idx, ssum, apk, ssq,
                       CAST((i * 7 + 13 * (t + 1)) % 201 - 100 AS BIGINT) AS x,
                       abs(CAST((i * 7 + 13 * (t + 1)) % 201 - 100 AS BIGINT)
                           - pred) AS a0,
                       ([7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,
                         41,45,50,55,60,66,73,80,88,97,107,118,130,143,157,
                         173,190,209,230,253,279,307,337,371,408,449,494,544,
                         598,658,724,796,876,963,1060,1166,1282,1411,1552,
                         1707,1878,2066,2272,2499,2749,3024,3327,3660,4026,
                         4428,4871,5358,5894,6484,7132,7845,8630,9493,10442,
                         11487,12635,13899,15289,16818,18500,20350,22385,
                         24623,27086,29794,32767])[idx + 1] AS step
                FROM st WHERE t + 1 < nf
              )
            )
          )
        )
      )
    )
  )
), adpcm AS (
  SELECT i AS media_id,
         CAST(rate AS BIGINT) AS sample_rate,
         CAST(1 AS BIGINT) AS n_channels,
         CAST(nf AS BIGINT) AS n_frames,
         CAST(nf * 1000 // rate AS BIGINT) AS duration_ms,
         ssum AS sample_sum,
         apk AS abs_peak,
         sqrt(CAST(ssq AS DOUBLE) / nf) AS rms
  FROM st WHERE t = nf - 1
), mp AS (
  -- MS-ADPCM lane (r13): mono, spb = 10/18/26, coefficient pair
  -- (doc_id // 7) % 7 over the 7 standard pairs, per-file initial
  -- iDelta 16 + (doc_id % 11) * 9. LOSSY — replay the encode-by-decode
  -- state machine of _wav_encode_ms_adpcm/_decode_wav_ms exactly:
  -- per-block samples 0/1 are the header (lossless), then per nibble
  -- pred = (s1*c1 + s2*c2) >> 8, code = clamp(floor((x-pred)/delta),
  -- -8, 7), sample = clamp_int16(pred + code*delta), delta =
  -- max(16, ADAPT[|code|]*delta >> 8) with the symmetric 9-entry
  -- adaptation table
  SELECT doc_id AS i, 8000 * (1 + doc_id % 3) AS rate,
         50 + doc_id % 200 AS nf, 10 + 8 * (doc_id % 3) AS spb,
         ([256,512,0,192,240,460,392])[(doc_id // 7) % 7 + 1] AS c1,
         ([0,-256,0,64,0,-208,-232])[(doc_id // 7) % 7 + 1] AS c2,
         16 + (doc_id % 11) * 9 AS d0
  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0 AND doc_id < 400
        AND doc_id % 7 = 3
), ms AS (
  SELECT i, rate, nf, spb, c1, c2, d0, 0 AS t,
         CAST((i * 7) % 201 - 100 AS BIGINT) AS s1,
         CAST(0 AS BIGINT) AS s2,
         CAST(d0 AS BIGINT) AS dlt,
         CAST((i * 7) % 201 - 100 AS BIGINT) AS ssum,
         CAST(abs((i * 7) % 201 - 100) AS BIGINT) AS apk,
         CAST(((i * 7) % 201 - 100) * ((i * 7) % 201 - 100) AS BIGINT) AS ssq
  FROM mp
  UNION ALL
  SELECT i, rate, nf, spb, c1, c2, d0, t + 1,
         d, s1, ndlt, ssum + d, GREATEST(apk, abs(d)), ssq + d * d
  FROM (
    SELECT i, rate, nf, spb, c1, c2, d0, t, s1, ssum, apk, ssq,
           CASE WHEN pos <= 1 THEN x
                ELSE GREATEST(-32768, LEAST(32767, p + cc * dlt)) END AS d,
           CASE WHEN pos = 0 THEN CAST(d0 AS BIGINT)
                WHEN pos = 1 THEN dlt
                ELSE GREATEST(16,
                     ([230,230,230,230,307,409,512,614,768])[abs(cc) + 1]
                     * dlt // 256) END AS ndlt
    FROM (
      SELECT *, CASE WHEN pos <= 1 THEN CAST(0 AS BIGINT)
                     ELSE GREATEST(-8, LEAST(7,
                          CAST(floor((x - p) / CAST(dlt AS DOUBLE))
                               AS BIGINT))) END AS cc
      FROM (
        SELECT *, CAST(floor((s1 * c1 + s2 * c2) / 256.0) AS BIGINT) AS p
        FROM (
          SELECT i, rate, nf, spb, c1, c2, d0, t, s1, s2, dlt,
                 ssum, apk, ssq,
                 (t + 1) % spb AS pos,
                 CAST((i * 7 + 13 * (t + 1)) % 201 - 100 AS BIGINT) AS x
          FROM ms WHERE t + 1 < nf
        )
      )
    )
  )
), msout AS (
  SELECT i AS media_id,
         CAST(rate AS BIGINT) AS sample_rate,
         CAST(1 AS BIGINT) AS n_channels,
         CAST(nf AS BIGINT) AS n_frames,
         CAST(nf * 1000 // rate AS BIGINT) AS duration_ms,
         ssum AS sample_sum,
         apk AS abs_peak,
         sqrt(CAST(ssq AS DOUBLE) / nf) AS rms
  FROM ms WHERE t = nf - 1
), gp AS (
  -- G.711 lanes (r13): µ-law (law=1, doc_id%7==1) / A-law (law=0,
  -- doc_id%7==6), mono+stereo, input amplified x327. STATELESS
  -- companding: decode(encode(x)) is re-derived per sample with the
  -- CCITT arithmetic — no recursion needed
  SELECT doc_id AS i, 1 + doc_id % 2 AS nch,
         8000 * (1 + doc_id % 3) AS rate, 50 + doc_id % 200 AS nf,
         CASE WHEN doc_id % 7 = 1 THEN 1 ELSE 0 END AS law
  FROM documents WHERE doc_id IS NOT NULL AND doc_id >= 0 AND doc_id < 400
        AND doc_id % 7 IN (1, 6)
), gx AS (
  SELECT i, nch, rate, nf, law,
         ((i * 7 + 13 * unnest(range(nf * nch))) % 201 - 100) * 327 AS x
  FROM gp
), gd AS (
  SELECT i, nch, rate, nf,
         CASE WHEN law = 1 THEN
           -- µ-law: a = min(|x|,32635)+132, p = 2^segment,
           -- dec = sign * ((((a // (8p)) % 16) * 8 + 132) * p - 132)
           (CASE WHEN x < 0 THEN -1 ELSE 1 END)
           * ((((ua // (8 * up)) % 16) * 8 + 132) * up - 132)
         ELSE
           -- A-law: m = 13-bit magnitude, seg/mant split,
           -- dec = sign * ((mant*16 + (8 | 0x108)) << max(seg-1, 0))
           (CASE WHEN x >= 0 THEN 1 ELSE -1 END)
           * (CASE WHEN aseg >= 2
                   THEN (amant * 16 + 264) * (1 << (aseg - 1))
                   WHEN aseg = 1 THEN amant * 16 + 264
                   ELSE amant * 16 + 8 END)
         END AS d
  FROM (
    SELECT *, CASE WHEN aseg < 2 THEN (am // 2) % 16
                   ELSE (am >> aseg) & 15 END AS amant
    FROM (
      SELECT *,
             CASE WHEN ua < 256 THEN 1 WHEN ua < 512 THEN 2
                  WHEN ua < 1024 THEN 4 WHEN ua < 2048 THEN 8
                  WHEN ua < 4096 THEN 16 WHEN ua < 8192 THEN 32
                  WHEN ua < 16384 THEN 64 ELSE 128 END AS up,
             CASE WHEN am <= 31 THEN 0 WHEN am <= 63 THEN 1
                  WHEN am <= 127 THEN 2 WHEN am <= 255 THEN 3
                  WHEN am <= 511 THEN 4 WHEN am <= 1023 THEN 5
                  WHEN am <= 2047 THEN 6 ELSE 7 END AS aseg
      FROM (
        SELECT *, LEAST(abs(x), 32635) + 132 AS ua,
               CASE WHEN x >= 0 THEN x // 8 ELSE (0 - x - 1) // 8 END AS am
        FROM gx
      )
    )
  )
), g711 AS (
  SELECT i AS media_id,
         CAST(rate AS BIGINT) AS sample_rate,
         CAST(nch AS BIGINT) AS n_channels,
         CAST(nf AS BIGINT) AS n_frames,
         CAST(nf * 1000 // rate AS BIGINT) AS duration_ms,
         CAST(sum(d) AS BIGINT) AS sample_sum,
         CAST(max(abs(d)) AS BIGINT) AS abs_peak,
         sqrt(CAST(sum(d * d) AS DOUBLE) / (nf * nch)) AS rms
  FROM gd GROUP BY i, nch, rate, nf
)
SELECT * FROM pcm UNION ALL SELECT * FROM adpcm
UNION ALL SELECT * FROM msout UNION ALL SELECT * FROM g711
"""


EXT5_QUERIES = {
    "knn_classify": (q_knn_classify, SQL_KNN_CLASSIFY),
    "knn_classify_lsh": (q_knn_classify_lsh, _sql_knn_classify_lsh()),
    "psi_value_drift": (q_psi_value_drift, SQL_PSI_VALUE_DRIFT),
    "ks_value_drift": (q_ks_value_drift, SQL_KS_VALUE_DRIFT),
    "dedup_chunk_exact": (q_dedup_chunk_exact, SQL_DEDUP_CHUNK_EXACT),
    "source_overlap": (q_source_overlap, SQL_SOURCE_OVERLAP),
    "training_mix": (q_training_mix, SQL_TRAINING_MIX),
    "bpe_merges": (q_bpe_merges, SQL_BPE_MERGES),
    "bpe_encode": (q_bpe_encode, SQL_BPE_ENCODE),
    "hard_negatives": (q_hard_negatives, SQL_HARD_NEGATIVES),
    "hard_negatives_lsh": (q_hard_negatives_lsh, _sql_hard_negatives_lsh()),
    "split_leakage": (q_split_leakage, _sql_split_leakage()),
    "embedding_finite_gate": (q_embedding_finite_gate, SQL_EMBEDDING_FINITE_GATE),
    "events_time_gate": (q_events_time_gate, SQL_EVENTS_TIME_GATE),
    "doc_id_dedup_gate": (q_doc_id_dedup_gate, SQL_DOC_ID_DEDUP_GATE),
    "vec_id_unique_audit": (q_vec_id_unique_audit, SQL_VEC_ID_UNIQUE_AUDIT),
    "event_id_dedup_gate": (q_event_id_dedup_gate, SQL_EVENT_ID_DEDUP_GATE),
    "events_value_gate": (q_events_value_gate, SQL_EVENTS_VALUE_GATE),
    # round 8 — appended last within ext5 so existing entries keep their
    # insertion order (the rotation's final tiebreak)
    "multimodal_pixels": (q_multimodal_pixels, SQL_MULTIMODAL_PIXELS),
    # round 9 — the single new entry this round (catalog otherwise frozen
    # so the rotation window covers the whole stale cohort)
    "multimodal_pixels_palette": (
        q_multimodal_pixels_palette, SQL_MULTIMODAL_PIXELS_PALETTE,
    ),
    # round 10 — the single new entry this round (catalog otherwise
    # frozen so the rotation window finishes the r7-evidence refresh)
    "multimodal_pixels_jpeg": (
        q_multimodal_pixels_jpeg, SQL_MULTIMODAL_PIXELS_JPEG,
    ),
    # round 11 — the single new entry this round (freeze discipline):
    # the audio decode path gains driver-oracle evidence; the animated
    # GIF path folds into the existing multimodal_frames grammar
    "multimodal_audio": (q_multimodal_audio, SQL_MULTIMODAL_AUDIO),
}
