"""Second extension catalog: retrieval / corpus-hygiene / clustering /
analytics-breadth queries over the driver tables.

These extend SURVEY.md §2.8 (the reference — a time-series activity
generator, /root/reference/src/main.py — has none of this; the north star
adds the operators a 100 TB training-data pipeline needs):

- ``contamination_ngram``  benchmark-decontamination via word 5-gram
  overlap (single scan, gram-key window — the standard pass before LLM
  training).
- ``bm25_search``          BM25 full-text ranking for a fixed query.
- ``inverted_index``       token -> postings-list build.
- ``repetition_ratio``     intra-document repetition quality signals.
- ``unigram_logprob``      corpus-LM mean NLL per doc (perplexity proxy).
- ``kmeans_assign``        one deterministic Lloyd iteration over the
  embeddings table, cross-engine oracle-checked (the building block under
  semantic dedup / IVF; the iterative fit lives in
  operators/similarity.py:kmeans_fit and is recall-tested rows-only).
- ``semantic_dedup``       cluster-prefiltered near-dup pairs (planted
  positives; O(sum k_i^2), never all-pairs).
- ``revenue_by_nation``    TPC-H Q5-shaped 6-table join (broadcast dims).
- ``grouping_sets_parts``  explicit GROUPING SETS over part x lineitem.
- ``dedup_latest_event``   keep-newest dedup by (user_id, event_type).
- ``value_histogram``      fixed-width bucket histogram.
- ``robust_outliers``      median/MAD outlier flags.
- ``topk_per_group``       per-group top-k via row_number.
- ``value_ranks``          rank/dense_rank/percent_rank/ntile, 1 shuffle.
- ``table_profile``        all-column stats in one scan.
- ``scd2_intervals``       CDC validity intervals via lead().
- ``interpolate_gaps``     linear gap repair (operators/interpolate.py).
- ``streaming_join``       watermarked stream-stream funnel join.
- ``streaming_append_windows`` append-mode finalized-window semantics.

Same contract as queries.py: name -> (spark_builder, duckdb_sql | None).

Scale notes (local[32] tests, 1000-executor design):
- All six dimension tables in ``revenue_by_nation`` are broadcast; the
  only shuffles are lineitem->orders hash joins on their natural keys and
  the final nation aggregate.
- ``contamination_ngram`` / ``inverted_index`` shuffle once on the token
  (n-gram) key; the benchmark-gram side of the contamination join is tiny
  by construction and broadcast.
- ``bm25_search`` computes corpus stats (N, avgdl, df) as a single-row
  aggregate crossJoin-broadcast back — two passes over the corpus, no
  wide shuffle; top-k is TakeOrdered (no global sort materialization).
- ``kmeans_assign`` broadcasts the k=8 centroid table at every step;
  per-dim centroid means shuffle k*dim rows only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from amazon_macie_activity_generator_spark.cache import begin_scope, scoped_persist
from amazon_macie_activity_generator_spark.functions.rounding import sql_round_fixed
from amazon_macie_activity_generator_spark.operators.dedup import tokens_expr
from amazon_macie_activity_generator_spark.operators.interpolate import MAX_GRID_SLOTS
from amazon_macie_activity_generator_spark.sources.tables import load_table, spread_small_scan

# DuckDB fragment: whitespace tokens of lowercased text — import the
# single source (co-located with tokens_expr), never re-declare.
from amazon_macie_activity_generator_spark.operators.dedup import (  # noqa: E402
    DUCK_TOKS_SQL as _DUCK_TOKS,
)


# --------------------------------------------------------------------------
# contamination_ngram — word-5-gram overlap between train and benchmark docs
# --------------------------------------------------------------------------

_NGRAM_N = 5


def _five_grams(toks):
    """Distinct word 5-grams of a token array (empty when < 5 tokens).

    The token array is BOUND ONCE via the array-wrap trick (transform's
    lambda variable is an evaluated value): referencing ``toks`` directly
    inside the index lambda re-evaluates the whole tokenize expression
    per gram index — O(n_tokens x doc_len), which turned a single 300 KB
    document into a >8-minute task (the huge-doc sweep's catch). Bound,
    the same doc grams in ~1 s."""
    grams = F.element_at(
        F.transform(
            F.array(toks),  # bind the token array once
            lambda t: F.when(
                F.size(t) >= _NGRAM_N,
                F.transform(
                    F.sequence(F.lit(0), F.size(t) - _NGRAM_N),
                    lambda i: F.concat_ws(" ", F.slice(t, i + 1, _NGRAM_N)),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ),
        1,
    )
    return F.array_distinct(grams)


def q_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination pass: docs with doc_id % 10 == 0 act as the held-out
    benchmark; every other doc reports how many of its distinct word
    5-grams also occur in any benchmark doc. ONE corpus scan: explode
    grams once, flag each gram row with a whole-partition window max of
    "appears in a benchmark doc" (single shuffle on the gram key), then
    re-aggregate per train doc — no second scan, no broadcast build, and
    the gram shuffle is the same hash partitioning an LSH band join would
    use at 100 TB. The local file arrives as one input split while gram
    construction is CPU-bound, so spread it first (at real scale
    maxPartitionBytes provides the splits and this is a no-op)."""
    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    grams = docs.select(
        "doc_id", F.explode(_five_grams(tokens_expr(F.col("text")))).alias("gram")
    )
    in_bench = F.max((F.col("doc_id") % 10 == 0).cast("int")).over(
        Window.partitionBy("gram")
    )
    flagged = grams.withColumn("hit", in_bench)
    per_doc = (
        flagged.filter(F.col("doc_id") % 10 != 0)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("hit").alias("n_contaminated"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_contaminated",
        F.round(F.col("n_contaminated") / F.col("n_grams"), 4).alias("contamination_rate"),
    )


SQL_CONTAMINATION = f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS tk FROM documents
), grams AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, greatest(len(tk) - {_NGRAM_N - 2}, 1)),
                   i -> coalesce(array_to_string(list_slice(tk, i, i + {_NGRAM_N - 1}), ' '), ''))
  )) AS gram
  FROM toks
), bench AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0
)
SELECT g.doc_id,
       count(*) AS n_grams,
       count(b.gram) AS n_contaminated,
       round(count(b.gram) / count(*), 4) AS contamination_rate
FROM grams g LEFT JOIN bench b USING (gram)
WHERE g.doc_id % 10 <> 0
GROUP BY g.doc_id
"""


# --------------------------------------------------------------------------
# bm25_search — classic BM25 ranking for a fixed 3-term query
# --------------------------------------------------------------------------

_BM25_TERMS = ["spark", "hash", "window"]
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 25


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k over the documents table for the fixed query
    {spark, hash, window}: idf = ln(1 + (N - df + .5)/(df + .5)),
    tf-saturated with k1=1.2, b=0.75 length normalization. Corpus stats
    (N, avgdl, per-term df) come from one single-row aggregate that is
    crossJoin-broadcast back onto the docs — the 100 TB plan is two scans
    and a TakeOrdered top-k, never a global sort."""
    docs = spread_small_scan(
        load_table(spark, sf_dir, "documents"), "doc_id"
    ).withColumn(
        "__toks", tokens_expr(F.col("text"))
    )
    def _tf(term: str):
        # NB: a 2-arg lambda would be read by F.filter as (element, index)
        return F.size(F.filter("__toks", lambda x: x == F.lit(term)))

    tf_cols = [_tf(t).alias(f"tf_{i}") for i, t in enumerate(_BM25_TERMS)]
    scored_src = docs.select("doc_id", F.size("__toks").alias("dl"), *tf_cols)
    stats = scored_src.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    j = scored_src.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(_BM25_TERMS)):
        tf = F.col(f"tf_{i}").cast("double")
        df_t = F.col(f"df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0) + (F.col("n_docs") - df_t + F.lit(0.5)) / (df_t + F.lit(0.5))
        )
        denom = tf + F.lit(_BM25_K1) * (
            F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl")
        )
        term = idf * tf * F.lit(_BM25_K1 + 1.0) / denom
        score = term if score is None else score + term
    return (
        j.select("doc_id", F.round(score, 4).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_BM25_TOPK)
    )


def _duck_tf(term: str) -> str:
    return f"len(list_filter(tk, x -> x = '{term}'))"


SQL_BM25 = f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS tk FROM documents
), scored_src AS (
  SELECT doc_id, len(tk) AS dl,
         {", ".join(f"{_duck_tf(t)} AS tf_{i}" for i, t in enumerate(_BM25_TERMS))}
  FROM toks
), stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl,
         {", ".join(f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
                    for i in range(len(_BM25_TERMS)))}
  FROM scored_src
)
SELECT doc_id, bm25 FROM (
  SELECT doc_id, round({" + ".join(
    f"ln(1.0 + (n_docs - CAST(df_{i} AS DOUBLE) + 0.5) / (CAST(df_{i} AS DOUBLE) + 0.5))"
    f" * CAST(tf_{i} AS DOUBLE) * {_BM25_K1 + 1.0}"
    f" / (CAST(tf_{i} AS DOUBLE) + {_BM25_K1} * ({1.0 - _BM25_B} + {_BM25_B} * dl / avgdl))"
    for i in range(len(_BM25_TERMS)))}, 4) AS bm25
  FROM scored_src, stats
)
WHERE bm25 > 0
ORDER BY bm25 DESC, doc_id
LIMIT {_BM25_TOPK}
"""


# --------------------------------------------------------------------------
# inverted_index — token -> postings list (capped), the retrieval substrate
# --------------------------------------------------------------------------

_POSTINGS_CAP = 8


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build an inverted index over documents: one row per distinct token
    with document frequency and the first 8 doc_ids as a postings prefix.
    One shuffle on the token key; collect_list stays bounded because the
    per-token groups are the shuffle partitions' natural unit (at 100 TB
    the cap would move into a window row_number < cap before the
    collect to bound skewed tokens' state)."""
    docs = load_table(spark, sf_dir, "documents")
    # a NULL doc_id cannot be a posting: unindexable rows are excluded
    # in both engines (Spark rendered their lists as '' via concat_ws,
    # DuckDB as NULL — the NULL-id probe's divergence)
    postings = docs.filter(F.col("doc_id").isNotNull()).select(
        "doc_id", F.explode(F.array_distinct(tokens_expr(F.col("text")))).alias("token")
    )
    w = Window.partitionBy("token").orderBy("doc_id")
    capped = postings.withColumn("rn", F.row_number().over(w))
    return (
        capped.groupBy("token")
        .agg(
            F.max("rn").cast("long").alias("n_docs"),
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(F.when(F.col("rn") <= _POSTINGS_CAP, F.col("doc_id")))),
                    lambda d: d.cast("string"),
                ),
            ).alias("postings"),
        )
    )


SQL_INVERTED_INDEX = f"""
WITH postings AS (
  -- NULL doc_id cannot be a posting (mirrors the Spark-side filter)
  SELECT doc_id, unnest(list_distinct({_DUCK_TOKS})) AS token
  FROM documents WHERE doc_id IS NOT NULL
)
SELECT token, count(*) AS n_docs,
       array_to_string(list_sort(list(doc_id ORDER BY doc_id))[1:{_POSTINGS_CAP}], ',') AS postings
FROM postings
GROUP BY token
"""


# --------------------------------------------------------------------------
# repetition_ratio — intra-document repetition quality signals
# --------------------------------------------------------------------------

def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition features (a Gopher-style quality rule family):
    distinct-token ratio and the share of the single most frequent token.
    Expressed as explode -> two-level aggregate so the token counting is a
    map-side-combinable groupBy, not a per-row O(vocab*len) array scan."""
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    tok = docs.select("doc_id", F.explode(tokens_expr(F.col("text"))).alias("token"))
    per_token = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_token.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top_token_count"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.round(F.col("n_distinct") / F.col("n_tokens"), 4).alias("distinct_ratio"),
            F.round(F.col("top_token_count") / F.col("n_tokens"), 4).alias("top_token_share"),
        )
    )


SQL_REPETITION = f"""
WITH tok AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
), per_token AS (
  SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token
)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
       round(count(*) / sum(c), 4) AS distinct_ratio,
       round(max(c) / sum(c), 4) AS top_token_share
FROM per_token
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# kmeans_assign — one deterministic Lloyd iteration, cross-engine checkable
# --------------------------------------------------------------------------

_KM_K = 8


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic Lloyd iteration over embeddings: seeds are the
    k=8 vectors with vec_id < 8; assign-all -> recompute per-cluster
    means (rounded to 6 dp in BOTH engines to pin down FP summation
    order) -> re-assign; emit (vec_id, cluster, dist). The 8-row centroid
    table is broadcast at each assignment; the mean recompute shuffles
    only k*dim rows (posexplode -> groupBy(cluster, dim)). This is the
    verified kernel under operators/similarity.py:kmeans_fit (iterative,
    rows-only) and the IVF ANN index."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        # NULL vector = no geometry (the finite-gate contract). Without
        # this a NULL row with vec_id < k lands in the SEED set and the
        # engines diverge on NULL-distance placement (Spark's struct-min
        # vs DuckDB's NULLS-LAST row_number) — caught by the dup-key
        # sweep, whose fixture put the NULL at vec_id 1.
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    )
    # single local input split + CPU-bound distance math -> spread first
    # (no-op at real scale where maxPartitionBytes provides the splits)
    emb = emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")
    seeds = emb.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cluster"), F.col("v").alias("c")
    )

    def assign(points: DataFrame, cents: DataFrame) -> DataFrame:
        j = points.crossJoin(F.broadcast(cents)).select(
            "vec_id", "v", "cluster", _sq_dist(F.col("v"), F.col("c")).alias("dist")
        )
        best = j.groupBy("vec_id", "v").agg(
            F.min(F.struct("dist", "cluster")).alias("best")
        )
        return best.select("vec_id", "v", F.col("best.cluster").alias("cluster"),
                           F.col("best.dist").alias("dist"))

    a0 = assign(emb, seeds)
    cent1 = (
        a0.select("cluster", F.posexplode("v").alias("dim", "x"))
        .groupBy("cluster", "dim")
        .agg(F.round(F.avg("x"), 6).alias("m"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
            ).alias("c")
        )
    )
    a1 = assign(emb, cent1)
    return a1.select("vec_id", "cluster", F.round("dist", 4).alias("dist"))


SQL_KMEANS_ASSIGN = f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE embedding IS NOT NULL
), seeds AS (
  SELECT vec_id AS cluster, v AS c FROM emb WHERE vec_id < {_KM_K}
), d0 AS (
  SELECT e.vec_id, e.v, s.cluster,
         list_sum(list_transform(range(1, len(e.v) + 1),
                                 i -> (e.v[i] - s.c[i]) * (e.v[i] - s.c[i]))) AS dist
  FROM emb e CROSS JOIN seeds s
), a0 AS (
  SELECT vec_id, v, cluster, dist FROM d0
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
), cent1 AS (
  SELECT cluster, list(m ORDER BY dim) AS c FROM (
    SELECT cluster, dim, round(avg(x), 6) AS m
    FROM (SELECT cluster, unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM a0)
    GROUP BY cluster, dim
  ) GROUP BY cluster
), d1 AS (
  SELECT e.vec_id, c1.cluster,
         list_sum(list_transform(range(1, len(e.v) + 1),
                                 i -> (e.v[i] - c1.c[i]) * (e.v[i] - c1.c[i]))) AS dist
  FROM emb e CROSS JOIN cent1 c1
)
SELECT vec_id, cluster, round(dist, 4) AS dist FROM d1
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
"""


# --------------------------------------------------------------------------
# topk_recall_ivf — IVF ANN quality, fully oracle-checked
# --------------------------------------------------------------------------

_IVF_NLIST = 16
_IVF_NPROBE = 4


def q_topk_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of an IVF-flat ANN search against exact brute force, per
    query vector — the driver-gated twin of the rows-only
    ``topk_cosine_ivf`` (whose numpy k-means quantizer is FP-order
    dependent). This variant is deterministic end to end so BOTH
    pipelines replay in SQL: coarse quantizer = seed vectors vec_id < 16
    refined by ONE Lloyd step with means rounded to 6 dp (the
    kmeans_assign kernel), queries probe their nprobe=4 nearest
    centroids, candidates re-rank by exact cosine. Scale shape is the
    IVF one: corpus assigned once (16-row broadcast centroid table),
    candidate join keyed on the cluster id, never all-pairs."""
    from amazon_macie_activity_generator_spark.operators.similarity import (
        brute_force_topk,
        dot_expr,
        norm_expr,
    )

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())  # NULL vec: no geometry
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    )
    emb = emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")
    seeds = emb.filter(F.col("vec_id") < _IVF_NLIST).select(
        F.col("vec_id").alias("cluster"), F.col("v").alias("c")
    )

    def assign(points: DataFrame, cents: DataFrame, n: int) -> DataFrame:
        j = points.crossJoin(F.broadcast(cents)).select(
            "vec_id", "v", "cluster", _sq_dist(F.col("v"), F.col("c")).alias("dist")
        )
        w = Window.partitionBy("vec_id").orderBy("dist", "cluster")
        return (
            j.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= n)
            .drop("rn", "dist")
        )

    a0 = assign(emb, seeds, 1)
    cent1 = (
        a0.select("cluster", F.posexplode("v").alias("dim", "x"))
        .groupBy("cluster", "dim")
        .agg(F.round(F.avg("x"), 6).alias("m"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
            ).alias("c")
        )
    )
    begin_scope("topk_recall_ivf", spark)
    cent1 = scoped_persist(cent1, "topk_recall_ivf")
    # k rows — the "write the IVF index once" barrier: both the
    # corpus assignment and the query probes read the cache, not its
    # lineage (lazy: per-partition cache locking prevents double compute)
    corpus = assign(emb, cent1, 1)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    probes = assign(
        queries.select(F.col("query_id").alias("vec_id"), F.col("qv").alias("v")),
        cent1, _IVF_NPROBE,
    ).select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "cluster")

    # norms hoisted to once-per-row columns (r12): same folds, same
    # denominator product as cosine_expr, so 4-dp rounds and the oracle
    # hash are unchanged — but the candidate stream folds O(dim) once
    # per pair instead of three times
    cand = corpus.withColumn("__cn", norm_expr(F.col("v"))).join(
        F.broadcast(probes.withColumn("__qn", norm_expr(F.col("qv")))),
        "cluster",
    ).filter(F.col("query_id") != F.col("vec_id"))
    denom = F.col("__cn") * F.col("__qn")
    scored = cand.select(
        "query_id", "vec_id",
        F.round(
            F.when(denom == 0, F.lit(0.0)).otherwise(
                dot_expr(F.col("v"), F.col("qv")) / denom),
            4,
        ).alias("sim"),
    ).dropDuplicates(["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("vec_id"))
    ann = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "vec_id")
    )

    emb_raw = load_table(spark, sf_dir, "embeddings")
    exact = brute_force_topk(
        emb_raw,
        emb_raw.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        k=5,
    ).select("query_id", "vec_id")
    # r14: one left join + one aggregation (queries_ext._recall_at_5) —
    # the old two-count/left-semi/left-outer tail re-ran the brute-force
    # exact subtree for each of its two consumers
    from amazon_macie_activity_generator_spark.queries_ext import _recall_at_5

    return _recall_at_5(exact, ann)


# the load-bearing cross-engine cosine expression — single definition in
# queries_ext so a precision tweak can never drift between the catalogs
from amazon_macie_activity_generator_spark.queries_ext import _DUCK_COS as _DUCK_COS_QV  # noqa: E402

SQL_TOPK_RECALL_IVF = f"""
WITH emb AS (
  SELECT vec_id, embedding, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE embedding IS NOT NULL
), seeds AS (
  SELECT vec_id AS cluster, v AS c FROM emb WHERE vec_id < {_IVF_NLIST}
), d0 AS (
  SELECT e.vec_id, e.v, s.cluster,
         list_sum(list_transform(range(1, len(e.v) + 1),
                                 i -> (e.v[i] - s.c[i]) * (e.v[i] - s.c[i]))) AS dist
  FROM emb e CROSS JOIN seeds s
), a0 AS (
  SELECT vec_id, v, cluster FROM d0
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
), cent1 AS (
  SELECT cluster, list(m ORDER BY dim) AS c FROM (
    SELECT cluster, dim, round(avg(x), 6) AS m
    FROM (SELECT cluster, unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM a0)
    GROUP BY cluster, dim
  ) GROUP BY cluster
), d1 AS (
  SELECT e.vec_id, e.v, c1.cluster,
         list_sum(list_transform(range(1, len(e.v) + 1),
                                 i -> (e.v[i] - c1.c[i]) * (e.v[i] - c1.c[i]))) AS dist
  FROM emb e CROSS JOIN cent1 c1
), corpus AS (
  SELECT vec_id, cluster FROM d1
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
), probes AS (
  SELECT vec_id AS query_id, cluster FROM d1 WHERE vec_id < 5
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) <= {_IVF_NPROBE}
), cand AS (
  SELECT DISTINCT p.query_id, c.vec_id
  FROM probes p JOIN corpus c USING (cluster)
  WHERE c.vec_id != p.query_id
), ivf_scored AS (
  SELECT cd.query_id, cd.vec_id, {_DUCK_COS_QV} AS sim
  FROM cand cd
  JOIN embeddings e ON e.vec_id = cd.vec_id
  JOIN (SELECT vec_id AS query_id, embedding AS qv
        FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL) q
    ON q.query_id = cd.query_id
), ivf_topk AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
    FROM ivf_scored
  ) WHERE rank <= 5
), exact_scored AS (
  -- embedding IS NOT NULL both sides: mirrors brute_force_topk (this was
  -- the one exact-scored CTE missing it — a NULL row at vec_id < 5
  -- produced a ghost query with recall 0 here while Spark dropped it)
  SELECT q.query_id, e.vec_id, {_DUCK_COS_QV} AS sim
  FROM embeddings e
  CROSS JOIN (SELECT vec_id AS query_id, embedding AS qv
              FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL) q
  WHERE e.vec_id != q.query_id AND e.embedding IS NOT NULL
), exact_topk AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
    FROM exact_scored
  ) WHERE rank <= 5
)
SELECT x.query_id,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(i.vec_id) AS BIGINT) AS n_overlap,
       round(count(i.vec_id) / CAST(count(*) AS DOUBLE), 4) AS recall_at_5
FROM exact_topk x
LEFT JOIN ivf_topk i ON i.query_id = x.query_id AND i.vec_id = x.vec_id
GROUP BY x.query_id
"""


# --------------------------------------------------------------------------
# revenue_by_nation — TPC-H Q5-shaped six-table join, broadcast dims
# --------------------------------------------------------------------------

def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by supplier nation for ASIA, orders placed in 1996 — the
    Q5 join shape. customer/supplier/nation/region are broadcast (the
    plan has exactly two shuffle joins: lineitem->orders on l_orderkey
    and nothing else wide); the date filter is pushed to the orders scan.
    Local sums of double are order-sensitive at the 1e-9 level, so both
    engines round the revenue to 2 dp."""
    li = load_table(spark, sf_dir, "lineitem")
    # range predicate, not year(): comparisons on the raw column reach the
    # parquet scan as PushedFilters; a function call would not
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    j = (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(dims), (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
    )
    return (
        j.groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


SQL_REVENUE_BY_NATION = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --------------------------------------------------------------------------
# dedup_latest_event — keep-newest dedup by key (CDC compaction shape)
# --------------------------------------------------------------------------

def q_dedup_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep only the newest event per (user_id, event_type) — the
    changelog-compaction / SCD-1 shape. Single shuffle on the dedup key;
    at scale this is the max_by/window top-1 pattern, never a self-join.
    Ties on ts break by highest event_id (deterministic). NULL-ts events
    are excluded: an event without a time cannot be "latest", and a NULL
    DESC window-order key is placed unstably by DuckDB's parallel sort
    (the mom_revenue_change flake class)."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.round("value", 4).alias("value"))
    )


SQL_DEDUP_LATEST = """
SELECT user_id, event_type, event_id, round(value, 4) AS value FROM events
WHERE ts IS NOT NULL
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) = 1
"""


# --------------------------------------------------------------------------
# streaming_append_windows — append-mode finalized-window semantics
# --------------------------------------------------------------------------

def q_streaming_append_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling windows in APPEND mode: a window row is
    emitted exactly once, when the watermark passes its end — the
    finalized-result semantics production streaming jobs rely on (the
    complete-mode twin is streaming_tumbling). After an availableNow
    drain the emitted set is exactly the windows whose end <= max(ts) -
    watermark; the oracle states that closure rule in SQL (max(ts)
    truncated to milliseconds — the precision Spark's watermark tracker
    uses)."""
    import os
    import shutil
    import tempfile
    import uuid

    from amazon_macie_activity_generator_spark.streaming.replay import (
        streaming_tumbling_counts,
    )

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="amag_append_")
    try:
        src = os.path.join(work, "src")
        events.write.parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        name = "append_" + uuid.uuid4().hex[:8]
        q = (
            streaming_tumbling_counts(stream, "1 hour", "2 hours")
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
    return spark.table(name).select(
        F.col("bucket").cast("string").alias("bucket"),
        "event_type", "n_events", "sum_value",
    )


SQL_STREAMING_APPEND = """
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS bucket, event_type,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
HAVING date_trunc('hour', any_value(ts)) + INTERVAL 1 HOUR
       <= (SELECT date_trunc('milliseconds', max(ts)) FROM events)
          - INTERVAL 2 HOUR
"""


# --------------------------------------------------------------------------
# semantic_dedup — cluster-prefiltered embedding near-dup (the scale path)
# --------------------------------------------------------------------------

_SEM_THRESH = 0.999


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup, scale path: assign every embedding to its nearest
    seed centroid (vec_id < 8), then search for near-duplicate pairs ONLY
    within a cluster — O(sum k_i^2) instead of the O(n^2) all-pairs join
    (at 100 TB, k ~ sqrt(n) clusters makes each bucket self-join small and
    the shuffle key is the cluster id). Planted positives: every 50th
    vector reappears with a deterministic per-dimension perturbation; the
    pair filter is cosine >= 0.999, far above random 64-dim cosines
    (~N(0, 1/8)) and below the planted ~0.999999, so FP drift can't flip
    membership. Fully oracle-checked — same augmentation, same seeds,
    same arithmetic in DuckDB."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        # NULL vector = no geometry; a NULL row among the seed ids would
        # otherwise split the engines on NULL-distance placement (see
        # q_kmeans_assign)
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    )
    emb = emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")
    pert = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "v",
            lambda x, i: x * (F.lit(1.0) + F.lit(0.0005) * (((i + 1) % 7) - F.lit(3.0))),
        ).alias("v"),
    )
    aug = emb.unionByName(pert)
    seeds = emb.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cluster"), F.col("v").alias("c")
    )
    d = aug.crossJoin(F.broadcast(seeds)).select(
        "vec_id", "v", "cluster", _sq_dist(F.col("v"), F.col("c")).alias("dist")
    )
    assigned = (
        d.groupBy("vec_id", "v")
        .agg(F.min(F.struct("dist", "cluster")).alias("best"))
        .select("vec_id", "v", F.col("best.cluster").alias("cluster"))
    )
    # norms precompute per ROW before the pair join — computing them per
    # PAIR (the naive form) does O(pairs * dim) redundant work inside the
    # join, the dominant cost of a bucket self-join at scale
    norm = F.sqrt(
        F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    sides = assigned.withColumn("nrm", norm)
    a = sides.select("cluster", F.col("vec_id").alias("id_a"),
                     F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = sides.select("cluster", F.col("vec_id").alias("id_b"),
                     F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    # zero-norm guard (same contract as operators.similarity.cosine_expr):
    # a zero vector has cosine 0 to everything, not a divide-by-zero abort
    denom = F.col("na") * F.col("nb")
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.when(denom == 0, F.lit(0.0)).otherwise(dot / denom))
        .filter(F.col("cos") >= _SEM_THRESH)
    )
    return pairs.select("cluster", "id_a", "id_b", F.round("cos", 6).alias("cos"))


SQL_SEMANTIC_DEDUP = f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE embedding IS NOT NULL
), aug AS (
  SELECT vec_id, v FROM emb
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(range(1, len(v) + 1),
                        i -> v[i] * (1.0 + 0.0005 * ((i % 7) - 3.0))) AS v
  FROM emb WHERE vec_id % 50 = 0
), seeds AS (
  SELECT vec_id AS cluster, v AS c FROM emb WHERE vec_id < {_KM_K}
), assigned AS (
  SELECT vec_id, v, cluster FROM (
    SELECT a.vec_id, a.v, s.cluster,
           list_sum(list_transform(range(1, len(a.v) + 1),
                                   i -> (a.v[i] - s.c[i]) * (a.v[i] - s.c[i]))) AS dist
    FROM aug a CROSS JOIN seeds s
  ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) = 1
)
SELECT cluster, id_a, id_b, round(cos, 6) AS cos FROM (
  SELECT a.cluster, a.vec_id AS id_a, b.vec_id AS id_b,
         CASE WHEN sqrt(list_sum(list_transform(a.v, x -> x * x)))
                   * sqrt(list_sum(list_transform(b.v, x -> x * x))) = 0
              THEN 0.0
              ELSE list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]))
                   / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                      * sqrt(list_sum(list_transform(b.v, x -> x * x)))) END AS cos
  FROM assigned a JOIN assigned b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
) WHERE cos >= {_SEM_THRESH}
"""


# --------------------------------------------------------------------------
# value_ranks — ranking-function family in one pass
# --------------------------------------------------------------------------

def q_value_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / ntile over one shuffle: events
    ranked within event_type by integer value (ties share rank — rank
    functions are deterministic because they depend only on the ordering
    KEY, not physical row order; the ntile uses the (value, event_id)
    total order for the same reason). Completes the window-function
    surface next to row_number (topk_per_group) and lead (scd2).
    NULL values are excluded: ranking NULL is meaningless and the engines
    default to opposite NULL placement (Spark first, DuckDB last)."""
    events = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # floor(), not cast: Spark's double->long cast truncates while
    # DuckDB's rounds half-away — floor is identical in both engines
    v = F.floor("value")
    w_ties = Window.partitionBy("event_type").orderBy(v)
    w_total = Window.partitionBy("event_type").orderBy(v, "event_id")
    return events.select(
        "event_id",
        "event_type",
        v.alias("v_int"),
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
        F.round(F.percent_rank().over(w_ties), 6).alias("pct_rank"),
        F.ntile(4).over(w_total).alias("quartile"),
    )


SQL_VALUE_RANKS = """
SELECT event_id, event_type, CAST(floor(value) AS BIGINT) AS v_int,
       CAST(rank() OVER w AS INT) AS rnk,
       CAST(dense_rank() OVER w AS INT) AS drnk,
       round(percent_rank() OVER w, 6) AS pct_rank,
       CAST(ntile(4) OVER (PARTITION BY event_type
                           ORDER BY floor(value), event_id) AS INT) AS quartile
FROM events
WHERE value IS NOT NULL
WINDOW w AS (PARTITION BY event_type ORDER BY floor(value))
"""


# --------------------------------------------------------------------------
# table_profile — single-pass column profiling (the data-quality preamble)
# --------------------------------------------------------------------------

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the events table — count / nulls / distincts /
    min / max per column, then a one-row unpivot to a row per column.

    Shape chosen for 100 TB: putting five exact ``count_distinct``s in a
    single ``agg`` makes Catalyst plan an Expand that replicates every
    input row ~6x through the shuffle (round 1's slowest query). Instead
    the non-distinct aggregates (count/nulls/min/max — map-side
    combinable) run in ONE full-width pass, and each exact distinct runs
    as its own single-distinct aggregation over a pruned one-column scan
    — Spark rewrites a lone distinct into two hash aggregates keyed on
    the column, no Expand. Total column-bytes read ~2x the single pass
    versus 6x row replication; the six one-row results meet in broadcast
    joins that move bytes, not data. (When estimates suffice, prefer the
    HLL single-pass — see approx_distinct_daily.) Timestamps format to
    fixed 6-digit micros so both engines stringify identically."""
    events = load_table(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value"]

    def _fmt(c, x):
        # doubles print via an explicit %.6f: the engines' native
        # double->string reprs agree on small values but split at the
        # scientific-notation cutover (Spark '1.0E12' vs DuckDB
        # '1000000000000.0'). NULL must stay NULL: format_string
        # stringifies a NULL argument as the literal 'null' (Java
        # String.format), which an all-NULL or empty column would hit.
        if c == "ts":
            return F.date_format(x, _TS_FMT_SPARK)
        if c == "value":
            return F.when(x.isNotNull(), F.format_string("%.6f", x))
        return x.cast("string")

    def smin(c):
        return _fmt(c, F.min(c))

    def smax(c):
        return _fmt(c, F.max(c))

    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            smin(c).alias(f"{c}__min"),
            smax(c).alias(f"{c}__max"),
        ]
    one = events.agg(*aggs)
    for c in cols:
        one = one.crossJoin(F.broadcast(
            events.agg(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
        ))
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )


def _duck_profile_row(c: str) -> str:
    if c == "ts":
        mn, mx = (
            f"strftime(min({c}), '{_TS_FMT_DUCK}')",
            f"strftime(max({c}), '{_TS_FMT_DUCK}')",
        )
    elif c == "value":
        mn, mx = f"printf('%.6f', min({c}))", f"printf('%.6f', max({c}))"
    else:
        mn, mx = f"CAST(min({c}) AS VARCHAR)", f"CAST(max({c}) AS VARCHAR)"
    return (
        f"SELECT '{c}' AS \"column\", count(*) AS n_rows,"
        f" CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,"
        f" count(DISTINCT {c}) AS n_distinct, {mn} AS min_value, {mx} AS max_value"
        " FROM events"
    )


SQL_TABLE_PROFILE = "\nUNION ALL\n".join(
    _duck_profile_row(c) for c in ["event_id", "ts", "user_id", "event_type", "value"]
)


# --------------------------------------------------------------------------
# scd2_intervals — change-history validity intervals via lead()
# --------------------------------------------------------------------------

def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2-style history: each user's events become validity intervals
    [ts, next ts) via lead() over (user_id, ordered by ts, event_id) —
    the standard change-data-capture history build. Single shuffle on the
    key; the open interval (last row) has valid_to NULL. NULL-ts events
    are excluded (no time, no history position; oracle mirrors)."""
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_type",
        F.round("value", 4).alias("value"),
        F.date_format("ts", _TS_FMT_SPARK).alias("valid_from"),
        F.date_format(F.lead("ts").over(w), _TS_FMT_SPARK).alias("valid_to"),
    )


SQL_SCD2 = f"""
SELECT user_id, event_type, round(value, 4) AS value,
       strftime(ts, '{_TS_FMT_DUCK}') AS valid_from,
       strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '{_TS_FMT_DUCK}') AS valid_to
FROM events WHERE ts IS NOT NULL
"""


# --------------------------------------------------------------------------
# value_histogram — fixed-width bucket histogram (width_bucket shape)
# --------------------------------------------------------------------------

def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values per event_type: 10 buckets of
    width 50, top bucket open-ended. Pure map-side bucket expression +
    one aggregation — the one-pass histogram any dashboard needs; at
    100 TB the bucket key is low-cardinality so partial aggregation
    collapses nearly all rows map-side. NULL values are excluded up
    front (the psi_value_drift rule): least(NULL, 9) skip-NULLs to the
    top bucket in current Spark AND DuckDB — a silent miscount that is
    also version-fragile (older DuckDB returns NULL instead)."""
    events = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bucket = F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("long")
    return (
        events.groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )


SQL_VALUE_HISTOGRAM = """
SELECT event_type, CAST(least(floor(value / 50), 9) AS BIGINT) AS bucket,
       count(*) AS n, round(min(value), 4) AS lo, round(max(value), 4) AS hi
FROM events WHERE value IS NOT NULL GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# unigram_logprob — corpus LM scoring (perplexity proxy per document)
# --------------------------------------------------------------------------

def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model score per doc: train token frequencies over
    the whole corpus (one aggregate), broadcast the tiny vocabulary back,
    and score each doc as the mean negative log-probability of its tokens
    — the classic cheap perplexity proxy used to filter training data.
    Two corpus passes, vocab-sized broadcast, no wide shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens_expr(F.col("text"))).alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("total"))
    scored = (
        tok.join(F.broadcast(vocab), "token")
        .crossJoin(F.broadcast(total))
        .withColumn("nll", -F.log(F.col("c") / F.col("total")))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("nll"), 4).alias("mean_nll"),
        )
    )


SQL_UNIGRAM_LOGPROB = f"""
WITH tok AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
), vocab AS (
  SELECT token, count(*) AS c FROM tok GROUP BY token
), total AS (
  SELECT CAST(sum(c) AS DOUBLE) AS total FROM vocab
)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(-ln(c / total)), 4) AS mean_nll
FROM tok JOIN vocab USING (token) CROSS JOIN total
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# topk_per_group — per-group top-k (window row_number pattern)
# --------------------------------------------------------------------------

def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 longest docs per source — the per-group top-k window shape
    (global top-k lives in join_topn_customers). One shuffle on the group
    key; rank state is O(k) per group under AQE."""
    # no key, no rank position: doc_id is the determinism tiebreak, and
    # a NULL id has none (the engines also disagree on NULL sort
    # position; two NULL-id ties would be unstable in BOTH)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("source", "rk", "doc_id", "n_chars")
    )


SQL_TOPK_PER_GROUP = """
SELECT source, CAST(rk AS INT) AS rk, doc_id, n_chars FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents WHERE doc_id IS NOT NULL
) WHERE rk <= 3
"""


# --------------------------------------------------------------------------
# robust_outliers — median/MAD outlier flags (anomaly-detection adjacent)
# --------------------------------------------------------------------------

def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts per event_type: median + MAD (median absolute
    deviation), outlier = deviation > 3*MAD (+1e-9 margin so a 1-ulp
    cross-engine difference in the interpolated medians can't flip a
    boundary row). Two grouped exact-percentile passes with broadcast
    joins back — the same two-pass agg+broadcast shape as T1 scaling; at
    100 TB swap exact percentile for approx_percentile and keep the plan.
    Thematically this is the reference's anomaly machinery (T4,
    main.py:606-641) inverted: detection instead of injection."""
    events = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(dev, 0.5)").alias("mad"))
    flagged = dev.join(F.broadcast(mad), "event_type")
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("dev") > 3 * F.col("mad") + 1e-9).cast("long")).alias("n_outliers"),
            F.round(F.first("med"), 4).alias("med"),
            F.round(F.first("mad"), 4).alias("mad"),
        )
    )


SQL_ROBUST_OUTLIERS = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_type, e.value, abs(e.value - m.med) AS dev, m.med
  FROM events e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_type, count(*) AS n_events,
       CAST(sum(CASE WHEN d.dev > 3 * m.mad + 1e-9 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(any_value(d.med), 4) AS med, round(any_value(m.mad), 4) AS mad
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
"""


# --------------------------------------------------------------------------
# grouping_sets_parts — explicit GROUPING SETS (completes rollup/cube trio)
# --------------------------------------------------------------------------

def q_grouping_sets_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by part brand, by part type, and grand total in ONE pass —
    explicit GROUPING SETS with grouping_id to tag each stratum (rollup
    and cube live in rollup_pricing / cube_events; this is the third
    member). part is broadcast into lineitem; the grouping-sets expand
    happens after the join, so lineitem is scanned once. First use of the
    driver's `part` table."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    j.createOrReplaceTempView("part_rev")
    return spark.sql("""
        SELECT p_brand, p_type, grouping__id AS gid,
               round(sum(rev), 2) AS revenue, count(*) AS n_items
        FROM part_rev
        GROUP BY GROUPING SETS ((p_brand), (p_type), ())
    """)


SQL_GROUPING_SETS = """
SELECT p_brand, p_type,
       CAST(grouping(p_brand) * 2 + grouping(p_type) AS BIGINT) AS gid,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY GROUPING SETS ((p_brand), (p_type), ())
-- pins the empty relation to Spark semantics (no grand-total row);
-- no-op on non-empty input — see SQL_CUBE_EVENTS
HAVING count(*) > 0
"""


# --------------------------------------------------------------------------
# interpolate_gaps — linear interpolation over missing time slots
# --------------------------------------------------------------------------

def q_interpolate_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap repair beyond the reference's zero-fill (T6): build a sparse
    per-type minute-slot series from events (only slots with traffic),
    expand to the full grid, and LINEARLY INTERPOLATE interior gaps from
    the nearest observed neighbors (edges hold the boundary value). Window
    functions only — running frames in both directions (see
    operators/interpolate.py) — so it shuffles once on the series key. At
    100 TB the grid join prunes to each series' own slot range first."""
    from amazon_macie_activity_generator_spark.operators.interpolate import (
        expand_grid,
        interpolate_linear,
    )

    events = load_table(spark, sf_dir, "events")
    slot = (F.unix_timestamp("ts") / 60).cast("long")
    # NB: no pre-round here — interpolating between 4-dp rationals lands
    # on exact .00005 boundaries where the engines' round modes disagree;
    # raw double sums interpolate boundary-free and round once at the end
    sparse = (
        events.groupBy(F.col("event_type").alias("series_id"), slot.alias("t"))
        .agg(F.sum("value").alias("value"))
    )
    filled = interpolate_linear(expand_grid(sparse))
    # round_fixed, NOT round(): interpolants between 2-decimal endpoints
    # land exactly on .xxxx5 where the engines' round() modes disagree;
    # the helper is the same IEEE arithmetic in both engines and guards
    # Spark floor()'s silent int64 saturation past |v| ~9.2e14.
    from amazon_macie_activity_generator_spark.functions.rounding import round_fixed

    return filled.select(
        "series_id", "t",
        round_fixed(F.col("value"), 4).alias("value"),
        "was_gap",
    )


SQL_INTERPOLATE = f"""
WITH sparse AS (
  SELECT event_type AS series_id,
         -- trunc twice, mirroring Spark exactly: unix_timestamp is
         -- trunc-toward-zero epoch seconds (NOT floor — they differ on
         -- pre-epoch fractional timestamps), then /60 cast long truncates
         CAST(trunc(trunc(epoch(ts)) / 60) AS BIGINT) AS t,
         sum(value) AS value
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT series_id, min(t) AS t0, max(t) AS t1 FROM sparse GROUP BY series_id
), grid AS (
  -- span cap mirrors operators/interpolate.py MAX_GRID_SLOTS: one
  -- corrupt far-future timestamp must not explode the per-series grid
  SELECT series_id, unnest(range(t0, least(t1, t0 + {MAX_GRID_SLOTS} - 1) + 1)) AS t FROM bounds
), full_grid AS (
  SELECT g.series_id, g.t, s.value FROM grid g
  LEFT JOIN sparse s ON g.series_id = s.series_id AND g.t = s.t
), neighbors AS (
  SELECT series_id, t, value,
    last_value(value IGNORE NULLS) OVER
      (PARTITION BY series_id ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    first_value(value IGNORE NULLS) OVER
      (PARTITION BY series_id ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    last_value(CASE WHEN value IS NOT NULL THEN t END IGNORE NULLS) OVER
      (PARTITION BY series_id ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
    first_value(CASE WHEN value IS NOT NULL THEN t END IGNORE NULLS) OVER
      (PARTITION BY series_id ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
  FROM full_grid
)
, interp AS (
  SELECT series_id, t,
         CASE WHEN value IS NOT NULL THEN value
              WHEN prev_v IS NULL THEN next_v
              WHEN next_v IS NULL THEN prev_v
              ELSE prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
         END AS raw,
         value IS NULL AS was_gap
  FROM neighbors
)
-- round_fixed twin: same IEEE floor arithmetic, same int64-saturation
-- guard as the Spark side (functions/rounding.py)
SELECT series_id, t,
       {sql_round_fixed('raw', 4)} AS value,
       was_gap
FROM interp
"""


# --------------------------------------------------------------------------
# streaming_join — watermarked stream-stream interval join
# --------------------------------------------------------------------------

def q_streaming_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with event-time bounds: clicks joined to
    the purchases that follow within 1 hour for the same user, both sides
    watermarked 2 hours so join state is GC-ed as event time advances —
    the canonical funnel join. The equality key (user_id) hash-partitions
    both streams; the time bound caps per-key state, so state size is
    O(events per user per watermark horizon) regardless of total volume.
    Oracle: the identical batch join in DuckDB (stream and batch engines
    must agree on the drained result)."""
    import os
    import shutil
    import tempfile
    import uuid

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="amag_ssjoin_")
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
        )
        name = "ssjoin_" + uuid.uuid4().hex[:8]
        q = (
            joined.select(
                F.col("c_user").alias("user_id"),
                F.col("c_id").alias("click_id"),
                F.col("p_id").alias("purchase_id"),
            )
            .writeStream.format("memory").queryName(name).outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(300)
        if q.isActive:
            q.stop()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.table(name)


SQL_STREAMING_JOIN = """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
"""


EXT2_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "contamination_ngram": (q_contamination_ngram, SQL_CONTAMINATION),
    "bm25_search": (q_bm25_search, SQL_BM25),
    "inverted_index": (q_inverted_index, SQL_INVERTED_INDEX),
    "repetition_ratio": (q_repetition_ratio, SQL_REPETITION),
    "kmeans_assign": (q_kmeans_assign, SQL_KMEANS_ASSIGN),
    "topk_recall_ivf": (q_topk_recall_ivf, SQL_TOPK_RECALL_IVF),
    "revenue_by_nation": (q_revenue_by_nation, SQL_REVENUE_BY_NATION),
    "dedup_latest_event": (q_dedup_latest_event, SQL_DEDUP_LATEST),
    "streaming_join": (q_streaming_join, SQL_STREAMING_JOIN),
    "semantic_dedup": (q_semantic_dedup, SQL_SEMANTIC_DEDUP),
    "grouping_sets_parts": (q_grouping_sets_parts, SQL_GROUPING_SETS),
    "interpolate_gaps": (q_interpolate_gaps, SQL_INTERPOLATE),
    "value_histogram": (q_value_histogram, SQL_VALUE_HISTOGRAM),
    "unigram_logprob": (q_unigram_logprob, SQL_UNIGRAM_LOGPROB),
    "topk_per_group": (q_topk_per_group, SQL_TOPK_PER_GROUP),
    "robust_outliers": (q_robust_outliers, SQL_ROBUST_OUTLIERS),
    "table_profile": (q_table_profile, SQL_TABLE_PROFILE),
    "scd2_intervals": (q_scd2_intervals, SQL_SCD2),
    "value_ranks": (q_value_ranks, SQL_VALUE_RANKS),
    "streaming_append_windows": (q_streaming_append_windows, SQL_STREAMING_APPEND),
}
