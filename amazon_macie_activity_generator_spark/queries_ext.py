"""Extension query catalog: dedup / similarity / text / multimodal /
sessionization (SURVEY.md §2.8) plus analytics-breadth queries (joins,
sort/limit, set ops — the §2.7 categories the reference lacks, expressed
through the same engine).

Same contract as queries.py: name -> (spark_builder, duckdb_sql | None).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amazon_macie_activity_generator_spark.cache import begin_scope, scoped_persist
from amazon_macie_activity_generator_spark.functions.jsonx import (
    extract_int_prop,
    sql_int_prop,
)
from amazon_macie_activity_generator_spark.operators.dedup import (
    dedup_exact,
    dedup_minhash_candidates,
    simhash64,
    simhash_near_pairs,
)
from amazon_macie_activity_generator_spark.operators.multimodal import (
    documents_as_media,
    extract_media_features,
)
from amazon_macie_activity_generator_spark.operators.sessionize import (
    sessionize,
    tumbling_counts,
)
from amazon_macie_activity_generator_spark.operators.similarity import (
    NONFINITE_COMPONENT_SQL,
    brute_force_topk,
    embedding_near_dup,
    lsh_bucket_topk,
)
from amazon_macie_activity_generator_spark.operators.text import (
    STOPWORDS,
    fingerprint_md5,
    lang_id_expr,
    quality_features,
)
from amazon_macie_activity_generator_spark.operators.dedup import JAVA_WS
from amazon_macie_activity_generator_spark.sources.tables import load_table, spread_small_scan

# DuckDB fragment: whitespace tokens of lowercased text — the single
# source is co-located with tokens_expr in operators.dedup.
from amazon_macie_activity_generator_spark.operators.dedup import (  # noqa: E402
    DUCK_TOKS_SQL as _DUCK_TOKS,
)


def _docs_aug(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents plus deterministic near-duplicate copies: every doc with
    doc_id % 100 == 0 reappears as doc_id+1000000 with two extra tokens.
    Gives the near-dup operators real positives on the driver's corpus
    (which is otherwise almost entirely unique)."""
    docs = load_table(spark, sf_dir, "documents")
    dup = docs.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" near duplicate")).alias("text"),
        "lang", "source", "n_chars",
    )
    out = docs.unionByName(dup)
    # small files arrive as 1-2 input splits; the downstream shingle/
    # signature projections are CPU-bound, so spread them across the
    # cluster (at real scale maxPartitionBytes provides the splits).
    return out.repartition(out.sparkSession.sparkContext.defaultParallelism, "doc_id")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings, spread across cores: the table arrives as one input
    split locally, and the SRP bucket/cosine projections are CPU-bound
    (at real scale maxPartitionBytes provides the splits)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.repartition(emb.sparkSession.sparkContext.defaultParallelism, "vec_id")


_DUCK_DOCS_AUG = """
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text || ' near duplicate' AS text,
         lang, source, n_chars
  FROM documents WHERE doc_id % 100 = 0
"""


# ------------------------------------------------------------------ dedup

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 — exact text dedup: canonical id + copy count per distinct text."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_exact(docs).select("doc_id", "n_copies")


SQL_DEDUP_EXACT = """
SELECT min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY text
"""


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — MinHash-LSH near-dup candidates (rows-only: xxhash64 minhash
    families are engine-local). Jaccard >= 0.7 verified pairs over the
    augmented corpus (planted near-dups)."""
    return dedup_minhash_candidates(_docs_aug(spark, sf_dir), jaccard_threshold=0.7)


def q_dedup_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 oracle bridge — the FULL MinHash-LSH pipeline (signature ->
    banding -> bucket join -> exact-Jaccard verify) value-hash-checked:
    md5-based signatures (operators/dedup.py:minhash_signature_md5) are
    byte-identical across engines, so unlike the xxhash64 family the
    candidate generation itself is oracle-verified, not just invariants.
    16 hashes x 4 bands over the augmented corpus, threshold 0.7."""
    from amazon_macie_activity_generator_spark.operators.dedup import (
        dedup_minhash_md5_pairs,
    )

    return dedup_minhash_md5_pairs(
        _docs_aug(spark, sf_dir), num_hashes=16, bands=4, jaccard_threshold=0.7
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard pairs: probe docs (doc_id % 50 == 0)
    against the augmented corpus (planted near-dups), threshold 0.2.

    Inverted-index set-similarity join (PPJoin-family, minus prefix
    pruning): explode distinct grams, equi-join on the gram, count shared
    grams per pair, then |A∪B| = |A|+|B|-|A∩B|. Exactly equivalent to the
    all-pairs crossJoin (a pair with zero shared grams cannot reach any
    positive threshold) but the join is keyed — no O(probe x corpus)
    nested loop, and the same plan scales out on gram hash instead of
    broadcasting the corpus."""
    docs = _docs_aug(spark, sf_dir)
    grams = docs.select(
        F.col("doc_id").alias("id"),
        F.array_distinct(_spark_3grams()).alias("grams"),
    ).withColumn("n_grams", F.size("grams"))
    # explode_OUTER (r13, guide §2.4/§4.4): plain explode lets
    # InferFiltersFromGenerate add `size(grams) > 0 AND isnotnull(grams)`
    # below the Generate, and predicate pushdown then inlines the whole
    # shingle expression into that filter — the corpus was tokenized
    # TWICE per row (measured in the plan: 10 inlined shingle subtrees
    # vs 2). The outer form infers no filter (it drops no rows), and is
    # semantically identical here: word_shingles_expr never yields an
    # empty or NULL array (zero-token text folds to ['']), and even if
    # it did, an outer NULL gram can never equi-join.
    base_ex = grams.select("id", "n_grams", F.explode_outer("grams").alias("gram"))
    # No probe persist (r13, the PageRank single-consumer lesson): the
    # probe side has exactly ONE consumer — the broadcast build below —
    # so the cache prevented no recompute and only added a cache-fill
    # write inside that job. The % 50 filter sits below the shingle
    # projection (it references only doc_id), so the broadcast build
    # tokenizes just the ~2% probe rows either way.
    probe_ex = base_ex.filter(F.col("id") % 50 == 0).withColumnsRenamed(
        {"id": "pid", "n_grams": "p_grams"}
    )
    inter = (
        base_ex.join(F.broadcast(probe_ex), on="gram")
        .filter(F.col("pid") < F.col("id"))
        .groupBy("pid", "id", "p_grams", "n_grams")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    union = F.col("p_grams") + F.col("n_grams") - F.col("inter")
    jac = F.round(F.col("inter") / union, 4)
    return (
        inter.select(F.col("pid").alias("id_a"), F.col("id").alias("id_b"), jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.2)
    )


def _spark_3grams():
    from amazon_macie_activity_generator_spark.operators.dedup import word_shingles_expr

    return word_shingles_expr(F.col("text"), 3)


# coalesce: DuckDB array_to_string([]) is NULL where Spark concat_ws is
# '' — a zero-token doc must yield the same [''] shingle set both sides
_DUCK_3GRAMS = (
    "list_distinct(list_transform("
    "range(0, greatest(len(toks) - 3, 0) + 1), "
    "i -> coalesce(array_to_string(toks[i + 1 : i + 3], ' '), '')))"
)

SQL_DEDUP_NGRAM = f"""
WITH docs_aug AS ({_DUCK_DOCS_AUG}),
tok AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM docs_aug
),
grams AS (
  SELECT doc_id, {_DUCK_3GRAMS} AS g FROM tok
),
ex AS MATERIALIZED (
  SELECT doc_id, len(g) AS n, unnest(g) AS gram FROM grams
),
inter AS (
  -- r10: inverted-index set-similarity join — the SAME spec the engine
  -- runs (a pair sharing zero grams has jaccard 0 < 0.2, so the gram
  -- equi-join is exactly equivalent to the all-pairs nested loop this
  -- oracle used through r9, which timed out at sf1 while Spark finished
  -- in 7 s). g is distinct per doc, so count(*) = |A n B| and
  -- |A u B| = n_a + n_b - i.
  SELECT p.doc_id AS id_a, e.doc_id AS id_b, p.n AS pn, e.n AS en,
         count(*) AS i
  FROM ex p JOIN ex e ON e.gram = p.gram
  WHERE p.doc_id % 50 = 0 AND p.doc_id < e.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b,
       round(CAST(i AS DOUBLE) / (pn + en - i), 4) AS jaccard
FROM inter
WHERE round(CAST(i AS DOUBLE) / (pn + en - i), 4) >= 0.2
"""


_DUCK_JAC = (
    "round(CASE WHEN len(list_distinct(list_concat(a.g, b2.g))) > 0 "
    "THEN CAST(len(list_intersect(a.g, b2.g)) AS DOUBLE) "
    "/ len(list_distinct(list_concat(a.g, b2.g))) ELSE 0.0 END, 4)"
)

SQL_DEDUP_MINHASH_MD5 = f"""
WITH docs_aug AS ({_DUCK_DOCS_AUG}),
tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM docs_aug),
sh AS (SELECT doc_id, {_DUCK_3GRAMS} AS g FROM tok),
sig AS (
  SELECT doc_id, g,
         list_transform(generate_series(0, 15),
           j -> list_aggregate(
                  list_transform(g, s -> md5(CAST(j AS VARCHAR) || ':' || s)),
                  'min')) AS sig
  FROM sh
),
bands AS (
  SELECT doc_id, b.b AS band,
         md5(array_to_string(sig[b.b * 4 + 1 : b.b * 4 + 4], '|')) AS bh
  FROM sig, range(0, 4) AS b(b)
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
)
SELECT c.id_a, c.id_b, {_DUCK_JAC} AS jaccard
FROM cand c
JOIN sh a  ON a.doc_id = c.id_a
JOIN sh b2 ON b2.doc_id = c.id_b
WHERE {_DUCK_JAC} >= 0.7
"""


def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup GROUP resolution: connected components over the exact
    ngram-Jaccard pairs — (doc_id, group_id = canonical min id). The
    pairs are deterministic, so the whole iterative algorithm
    oracle-checks against DuckDB's recursive CTE."""
    from amazon_macie_activity_generator_spark.operators.dedup import connected_components

    pairs = q_dedup_ngram_jaccard(spark, sf_dir)
    return connected_components(pairs).select(
        F.col("id").alias("doc_id"), "group_id"
    )


def _make_sql_dedup_groups(rounds: int = 24) -> str:
    """Connected-components oracle via UNROLLED min-label propagation
    with pointer jumping (r10) — replaces the r1-era recursive
    reachability CTE, whose working set is sum-of-component-size-squared
    (it enumerates every (node, reachable-label) pair) and which timed
    out at sf1. Each round takes, per node, the min label over
    self, neighbors, and label-of-label (the pointer jump); after
    round t every node's label is the min id within graph radius r_t
    where r_(t+1) >= 2*r_t + 1, so ``rounds=24`` converges for any
    component with diameter < 2^24 — far beyond the corpus size, and
    the per-round cost is one edge join + one self join over the
    node-sized label table (linear, the same shape the engine's
    label-propagation loop shuffles). An unconverged oracle cannot pass
    silently: the driver value-hashes the full result."""
    parts = [
        f"WITH pairs AS MATERIALIZED ({SQL_DEDUP_NGRAM}),",
        """edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM edges)""",
    ]
    for t in range(rounds):
        parts.append(f""", l{t + 1} AS MATERIALIZED (
  SELECT node, min(lbl) AS lbl FROM (
    SELECT node, lbl FROM l{t}
    UNION ALL
    SELECT e.dst AS node, l.lbl FROM edges e JOIN l{t} l ON l.node = e.src
    UNION ALL
    SELECT l.node, j.lbl FROM l{t} l JOIN l{t} j ON j.node = l.lbl
  ) GROUP BY node
)""")
    parts.append(
        f"\nSELECT node AS doc_id, lbl AS group_id FROM l{rounds}"
    )
    return "\n".join(parts)


SQL_DEDUP_GROUPS = _make_sql_dedup_groups()


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs over the augmented corpus, Hamming <= 3
    (rows-only: bit votes depend on engine hash). The lazy persist is the
    plan barrier: the InMemoryRelation keeps the signature expression
    from inlining into both banded self-join sides, and per-partition
    cache locking keeps the two branches from double-computing it at
    runtime — no eager count() needed, so the build phase stays
    action-free and the bench timer sees the real cost."""
    begin_scope("dedup_simhash", spark)
    sig = scoped_persist(simhash64(_docs_aug(spark, sf_dir)), "dedup_simhash")
    return simhash_near_pairs(sig, max_hamming=3)


def q_dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2b oracle bridge — the SAME banded Hamming-pair pipeline as
    ``dedup_simhash`` but over md5-derived 63-bit signatures
    (``simhash64_md5``), so the whole vote fold -> signature -> 16-bit
    bands -> candidate join -> Hamming filter replays in DuckDB and
    value-hash-matches. The xxhash64 entry stays the production/scale
    path; this one anchors its semantics (the X2f minhash-md5 move)."""
    from amazon_macie_activity_generator_spark.operators.dedup import simhash64_md5

    begin_scope("dedup_simhash_md5", spark)
    sig = scoped_persist(simhash64_md5(_docs_aug(spark, sf_dir)), "dedup_simhash_md5")
    return simhash_near_pairs(sig, max_hamming=3)


SQL_DEDUP_SIMHASH_MD5 = f"""
WITH docs_aug AS ({_DUCK_DOCS_AUG}),
tok AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS t FROM docs_aug),
bits AS (
  SELECT doc_id, b.b,
         ((strpos('0123456789abcdef', substr(md5(t), (b.b // 4) + 1, 1)) - 1)
          // ([8,4,2,1])[(b.b % 4) + 1]) % 2 AS bit
  FROM tok CROSS JOIN (SELECT unnest(range(63)) AS b) b
),
votes AS (SELECT doc_id, b, sum(2 * bit - 1) AS v FROM bits GROUP BY 1, 2),
sig0 AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY 1
),
sig AS (
  -- strict-majority vote rule (2*ones > n, the production fold):
  -- empty-token and null-text docs fold to signature 0, as in Spark
  SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash
  FROM docs_aug d LEFT JOIN sig0 s USING (doc_id)
),
bands AS (
  SELECT doc_id, c.c AS band, (simhash >> (c.c * 16)) & 65535 AS bh
  FROM sig CROSS JOIN (SELECT unnest(range(4)) AS c) c
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
)
SELECT c.id_a, c.id_b,
       CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INTEGER) AS hamming
FROM cand c JOIN sig sa ON sa.doc_id = c.id_a JOIN sig sb ON sb.doc_id = c.id_b
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
"""


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dups via SRP-LSH buckets. Fully
    oracle-checked: the 8 seeded Rademacher planes are deterministic
    literals, so the oracle embeds them as sign-bit masks and re-derives
    bucket ids, the bucket self-join, and the exact-cosine filter in
    DuckDB. Corpus is augmented with slightly-perturbed copies
    (vec_id+1000000, first component nudged) so near-dup pairs exist to
    find."""
    emb = _emb(spark, sf_dir)
    pert = emb.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.05)),
            F.slice("embedding", 2, 10000),
        ).alias("embedding"),
        "label",
    )
    # dim pinned to the corpus schema (64): the oracle's plane masks are
    # 64-dim literals already, and skipping _infer_dim drops an eager
    # full-corpus aggregation from every build (r14, guide §1.2)
    return embedding_near_dup(emb.unionByName(pert), threshold=0.9, planes=8, dim=64)


def _neardup_mask_values(dim: int = 64, planes: int = 8, salt: str = "srp") -> str:
    """The single-table SRP planes behind embedding_near_dup, as SQL
    VALUES rows (p, mask) — same seeded srp_planes the Spark path uses."""
    from amazon_macie_activity_generator_spark.operators.similarity import srp_planes

    mat = srp_planes(dim, planes, salt)
    return ", ".join(
        f"({p},{sum(1 << i for i, s in enumerate(row) if s > 0)})"
        for p, row in enumerate(mat)
    )


SQL_EMBEDDING_NEAR_DUP = f"""
WITH aug AS (
  -- pert flag keeps row identity even if vec_id + 1000000 ever collides
  -- with a native id (the Spark side keeps such rows distinct too)
  SELECT vec_id, 0 AS pert,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE embedding IS NOT NULL
  UNION ALL
  SELECT vec_id + 1000000, 1 AS pert,
         [CAST(embedding[1] AS DOUBLE) + 0.05]
           || list_transform(embedding[2:], x -> CAST(x AS DOUBLE))
  FROM embeddings WHERE vec_id % 20 = 0 AND embedding IS NOT NULL
), planes(p, mask) AS (VALUES {{masks}}),
b AS (
  SELECT a.vec_id, a.pert, any_value(a.v) AS v,
         CAST(sum(CASE WHEN list_sum(list_transform(range(64),
               i -> a.v[i + 1] *
                    (CASE WHEN ((pl.mask >> i) & 1) = 1 THEN 1.0 ELSE -1.0 END)
             )) >= 0 THEN (CAST(1 AS BIGINT) << pl.p) ELSE 0 END) AS BIGINT) AS bucket
  FROM aug a CROSS JOIN planes pl
  GROUP BY a.vec_id, a.pert
)
SELECT DISTINCT id_a, id_b, sim FROM (
  SELECT l.vec_id AS id_a, r.vec_id AS id_b,
         round(CASE WHEN sqrt(list_sum(list_transform(l.v, x -> x * x))) *
                         sqrt(list_sum(list_transform(r.v, x -> x * x))) = 0
               THEN 0.0
               ELSE list_sum(list_transform(list_zip(l.v, r.v), z -> z[1] * z[2])) /
                    (sqrt(list_sum(list_transform(l.v, x -> x * x))) *
                     sqrt(list_sum(list_transform(r.v, x -> x * x)))) END, 4) AS sim
  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
) WHERE sim >= 0.9
""".format(masks=_neardup_mask_values())


# -------------------------------------------------------------- similarity

def q_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 — exact cosine top-5 for query vectors vec_id < 5."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(emb, queries, k=5)


# zero-norm guard mirrors operators/similarity.cosine_expr: Spark maps a
# zero denominator to 0.0 where an unguarded DuckDB division yields NaN
# (which DuckDB then sorts ABOVE every real sim in ORDER BY ... DESC)
_DUCK_COS_DOT = (
    "list_aggregate(list_transform(list_zip(e.embedding, q.qv), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
)
_DUCK_COS_DEN = (
    "(sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) * "
    "sqrt(list_aggregate(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))"
)
_DUCK_COS = (
    f"round(CASE WHEN {_DUCK_COS_DEN} = 0 THEN 0.0 "
    f"ELSE {_DUCK_COS_DOT} / {_DUCK_COS_DEN} END, 4)"
)

SQL_TOPK_COSINE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv
  FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL
),
scored AS (
  SELECT q.query_id, e.vec_id, {_DUCK_COS} AS sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != q.query_id AND e.embedding IS NOT NULL
)
SELECT query_id, vec_id, sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS INT) AS rank
  FROM scored
) WHERE rank <= 5
"""


def q_topk_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path #2 — IVF-flat ANN top-5: k-means coarse quantizer +
    nprobe inverted-list search + exact re-rank (rows-only: approximate;
    recall vs brute force asserted in tests)."""
    from amazon_macie_activity_generator_spark.operators.similarity import ivf_topk

    # plain loader: the IVF path is Arrow/numpy-vectorized, where extra
    # partitions just multiply per-task Arrow overhead (unlike the
    # expression-bound paths behind _emb)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(emb, queries, k=5, nlist=16, nprobe=4, kmeans_iter=3)


def q_topk_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path — SRP-LSH bucketed ANN top-5. Fully oracle-checked:
    the Rademacher hyperplanes are deterministic seeded literals, so the
    oracle SQL embeds the SAME planes (as sign-bit masks) and re-derives
    buckets, Hamming-1 probes, the candidate join, and the exact-cosine
    re-rank in DuckDB."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_bucket_topk(emb, queries, k=5, planes=10, dim=64)


def _srp_mask_values(dim: int = 64, planes: int = 10, tables: int = 4) -> str:
    """The SRP planes as SQL VALUES rows (tbl, p, mask): bit i of mask set
    iff plane entry i is +1. Same seeded srp_planes the Spark path uses —
    the oracle replays the identical projection."""
    from amazon_macie_activity_generator_spark.operators.similarity import srp_planes

    rows = []
    for t in range(tables):
        mat = srp_planes(dim, planes, salt=f"srp{t}")
        for p, row in enumerate(mat):
            mask = sum(1 << i for i, s in enumerate(row) if s > 0)
            rows.append(f"({t},{p},{mask})")
    return ", ".join(rows)


# SRP dot against a ±1 plane encoded as a bitmask: +v[i] where bit i set,
# -v[i] otherwise. Sequential list_sum mirrors Spark's left-fold; the
# numpy matmul on the Spark side differs only in FP summation order,
# which can only matter for a dot exactly at the sign threshold.
_DUCK_SRP_LSH = f"""
planes(tbl, p, mask) AS (VALUES {{masks}}),
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
qb AS (SELECT vec_id AS query_id, tbl, bucket FROM bits WHERE vec_id < 5),
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
  SELECT c.query_id, c.vec_id, {_DUCK_COS} AS sim
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN (SELECT vec_id AS query_id, embedding AS qv
        FROM embeddings WHERE vec_id < 5) q ON q.query_id = c.query_id
),
lsh_topk AS (
  SELECT query_id, vec_id, sim, rank FROM (
    SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY sim DESC, vec_id) AS INT) AS rank
    FROM lsh_scored
  ) WHERE rank <= 5
)
"""

SQL_TOPK_COSINE_LSH = (
    "WITH " + _DUCK_SRP_LSH.format(masks=_srp_mask_values())
    + "\nSELECT query_id, vec_id, sim, rank FROM lsh_topk"
)


def _recall_at_5(exact: DataFrame, ann: DataFrame) -> DataFrame:
    """Per-query recall@5 of ``ann`` against ``exact`` (both (query_id,
    vec_id), duplicate-free by construction — ranked row_number <= k
    output).

    r14 (guide §2.4): ONE left join + ONE aggregation. The previous form
    — count exact per query, LEFT-SEMI exact against ann, count the
    overlap per query, LEFT-OUTER the two counts back together —
    consumed the exact top-k subtree TWICE (its brute-force cross +
    window re-ran for each consumer) and paid two extra joins. A left
    join against duplicate-free ann preserves every exact row exactly
    once (n_exact = count(*)) and marks the matched ones
    (n_overlap = count(match)); a query with zero ANN hits gets
    n_overlap = 0 from the ungrouped count, which is what the old
    coalesce(0) produced."""
    marked = ann.select("query_id", "vec_id", F.lit(1).alias("__m"))
    return (
        exact.join(marked, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_exact"), F.count("__m").alias("n_overlap"))
        .select(
            "query_id",
            "n_exact",
            "n_overlap",
            F.round(F.col("n_overlap") / F.col("n_exact"), 4).alias("recall_at_5"),
        )
    )


def q_topk_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality measurement as a first-class query: recall@5 of the
    SRP-LSH top-k against exact brute-force top-k, per query vector.
    Deterministic end-to-end (seeded planes, tie-break on vec_id), so the
    oracle recomputes BOTH pipelines in SQL and must agree exactly."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=5).select("query_id", "vec_id")
    ann = lsh_bucket_topk(emb, queries, k=5, planes=10, dim=64).select("query_id", "vec_id")
    return _recall_at_5(exact, ann)


SQL_TOPK_RECALL_LSH = (
    "WITH " + _DUCK_SRP_LSH.format(masks=_srp_mask_values())
    + f""",
exact_scored AS (
  SELECT q.query_id, e.vec_id, {_DUCK_COS} AS sim
  FROM embeddings e
  CROSS JOIN (SELECT vec_id AS query_id, embedding AS qv
              FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL) q
  WHERE e.vec_id != q.query_id AND e.embedding IS NOT NULL
),
exact_topk AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
    FROM exact_scored
  ) WHERE rank <= 5
)
SELECT x.query_id,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(l.vec_id) AS BIGINT) AS n_overlap,
       round(count(l.vec_id) / CAST(count(*) AS DOUBLE), 4) AS recall_at_5
FROM exact_topk x
LEFT JOIN lsh_topk l ON l.query_id = x.query_id AND l.vec_id = x.vec_id
GROUP BY x.query_id
"""
)


# -------------------------------------------------------------------- text

def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — per-language corpus stats over whitespace tokens."""
    from amazon_macie_activity_generator_spark.operators.text import token_count_ws

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select("lang", token_count_ws(F.col("text")).alias("n_tok"), "n_chars")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.sum("n_tok").alias("total_tokens"),
    )


SQL_TEXT_TOKEN_STATS = f"""
WITH tok AS (
  SELECT lang, len({_DUCK_TOKS}) AS n_tok, n_chars FROM documents
)
SELECT lang, count(*) AS n_docs,
       round(avg(n_tok), 4) AS avg_tokens,
       round(avg(n_chars), 4) AS avg_chars,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens
FROM tok GROUP BY lang
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — per-doc quality features + composite score. Map-only; the
    scan is conditionally spread (r13) because the local single-row-
    group file otherwise pins the whole tokenize to one task."""
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    return quality_features(docs).select(
        "doc_id", "n_tokens", "n_bpe_tokens", "mean_token_len",
        "punct_ratio", "stopword_ratio", "quality_score",
    )


_DUCK_EN_STOP = "['" + "', '".join(STOPWORDS["en"]) + "']"

SQL_TEXT_QUALITY = f"""
WITH base AS (
  SELECT doc_id, text, length(text) AS n_chars,
         {_DUCK_TOKS} AS toks,
         length(regexp_replace(text, '[a-zA-Z0-9{JAVA_WS}]', '', 'g')) AS punct
  FROM documents
),
feat AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         len(regexp_extract_all(lower(text), '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9{JAVA_WS}]')) AS n_bpe_tokens,
         CASE WHEN len(toks) > 0 THEN CAST(n_chars AS DOUBLE) / len(toks) ELSE 0.0 END AS mean_token_len,
         CASE WHEN n_chars > 0 THEN CAST(punct AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio,
         CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks, t -> list_contains({_DUCK_EN_STOP}, t))) AS DOUBLE) / len(toks)
              ELSE 0.0 END AS stopword_ratio
  FROM base
)
SELECT doc_id, n_tokens, n_bpe_tokens,
       round(mean_token_len, 4) AS mean_token_len,
       round(punct_ratio, 4) AS punct_ratio,
       round(stopword_ratio, 4) AS stopword_ratio,
       round(
         (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 1.0 ELSE 0.3 END)
         * (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 1.0 - punct_ratio END)
         * (0.5 + 0.5 * least(stopword_ratio * 5, 1.0)), 4) AS quality_score
FROM feat
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — heuristic stopword-vote language ID. Map-only; scan spread
    conditionally (r13, see spread_small_scan)."""
    docs = spread_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    return docs.select("doc_id", "lang", lang_id_expr(F.col("text")).alias("lang_pred"))


def _duck_hits(lang: str) -> str:
    stop = "['" + "', '".join(STOPWORDS[lang]) + "']"
    return f"len(list_filter(toks, t -> list_contains({stop}, t)))"


SQL_LANG_ID = f"""
WITH tok AS (
  SELECT doc_id, lang, {_DUCK_TOKS} AS toks FROM documents
),
scored AS (
  SELECT doc_id, lang,
         list_sort([
           struct_pack(hits := {_duck_hits('de')}, lang := 'de'),
           struct_pack(hits := {_duck_hits('en')}, lang := 'en'),
           struct_pack(hits := {_duck_hits('es')}, lang := 'es'),
           struct_pack(hits := {_duck_hits('fr')}, lang := 'fr'),
           struct_pack(hits := {_duck_hits('zh')}, lang := 'zh')
         ])[-1] AS best
  FROM tok
)
SELECT doc_id, lang,
       CASE WHEN best.hits > 0 THEN best.lang ELSE 'und' END AS lang_pred
FROM scored
"""


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact over documents with deterministically planted
    sensitive strings (SSN / email / AWS key formats — the very formats
    the K6 fake providers emit). Counts and the redacted fingerprint both
    oracle-check: detection finds exactly the plants, redaction removes
    them all."""
    from amazon_macie_activity_generator_spark.operators.text import (
        pii_counts,
        pii_redact,
    )

    docs = spread_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    # coalesce(doc_id, 0) in the plant arithmetic: Spark format_string
    # renders a NULL int as the string 'null' (and would then COUNT the
    # 'usernull@example.com' plant) while DuckDB printf nulls the whole
    # row — a NULL-id doc gets doc-0's plants in BOTH engines instead
    did = F.coalesce(F.col("doc_id"), F.lit(0))
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.format_string(
                " ssn %03d-%02d-%04d contact user%d@example.com key AKIA",
                F.pmod(did, F.lit(899)) + 1,
                F.pmod(did, F.lit(99)) + 1,
                F.pmod(did, F.lit(9999)) + 1,
                did,
            ),
            F.repeat(F.lit("Q"), 16),
        ).alias("text"),
    )
    c = pii_counts(F.col("text"))
    return planted.select(
        "doc_id",
        c["ssn"].cast("long").alias("n_ssn"),
        c["email"].cast("long").alias("n_email"),
        c["aws_key"].cast("long").alias("n_aws"),
        F.md5(pii_redact(F.col("text"))).alias("redacted_md5"),
    )


# the SAME pattern strings the Spark operators compile — single source
# (operators/text.py) so the bounded-quantifier fix and any future tweak
# reach both engines atomically
from amazon_macie_activity_generator_spark.operators.text import (  # noqa: E402
    PII_PATTERNS as _PII_RE,
)

_DUCK_REDACT = "text2"
for _pat in _PII_RE.values():
    _DUCK_REDACT = f"regexp_replace({_DUCK_REDACT}, '{_pat}', '[REDACTED]', 'g')"

SQL_PII_REDACT = f"""
WITH planted AS (
  SELECT doc_id,
         text || printf(' ssn %03d-%02d-%04d contact user%d@example.com key AKIA',
                        coalesce(doc_id, 0) % 899 + 1, coalesce(doc_id, 0) % 99 + 1,
                        coalesce(doc_id, 0) % 9999 + 1, coalesce(doc_id, 0))
              || repeat('Q', 16) AS text2
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text2, '{_PII_RE["ssn"]}')) AS n_ssn,
       len(regexp_extract_all(text2, '{_PII_RE["email"]}')) AS n_email,
       len(regexp_extract_all(text2, '{_PII_RE["aws_key"]}')) AS n_aws,
       md5({_DUCK_REDACT}) AS redacted_md5
FROM planted
"""


def q_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — context-window chunking (operators/text.py:chunk_docs):
    50-token chunks, 10-token overlap; md5 of each chunk text hashes the
    exact split points cross-engine."""
    from amazon_macie_activity_generator_spark.operators.text import chunk_docs

    docs = load_table(spark, sf_dir, "documents")
    out = chunk_docs(docs, chunk_tokens=50, overlap=10)
    return out.select(
        F.col("id").alias("doc_id"), "chunk_idx",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.md5("chunk_text").alias("chunk_md5"),
    )


SQL_DOC_CHUNK = f"""
WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, greatest(len(toks) - 1, 0), 40)) AS s
  FROM tok
)
SELECT doc_id, s // 40 AS chunk_idx,
       CAST(len(list_slice(toks, s + 1, s + 50)) AS BIGINT) AS n_tok,
       md5(coalesce(array_to_string(list_slice(toks, s + 1, s + 50), ' '), '')) AS chunk_md5
FROM s
"""


_PACK_LEN = 512


def q_doc_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the concat-and-chunk layout LLM pretraining
    uses: per language, documents concatenate in doc_id order and split
    into fixed 512-token training sequences; a document may straddle a
    boundary and contribute tokens to two (or more) sequences. One
    window cumsum gives each doc its token offset, a sequence explode
    fans a doc to every training sequence it touches, and a groupBy
    rolls up per-sequence fill stats. At 100 TB the partition key is
    (lang, input shard) so each window partition is one shard — the
    layout then matches how packing actually runs, shard-local with no
    global sort. Output: per (lang, seq_id) doc count, token fill, and
    doc-id span; every sequence except each language's last must be
    exactly full (asserted by the fill column both engines compute)."""
    from pyspark.sql import Window

    from amazon_macie_activity_generator_spark.operators.text import token_count_ws

    docs = load_table(spark, sf_dir, "documents")
    # no key, no pack position: the layout is doc_id-ordered, and a NULL
    # id has no deterministic place in it (the engines also disagree on
    # NULL sort position — Spark NULLS FIRST, DuckDB NULLS LAST)
    toks = docs.select(
        "doc_id", "lang", token_count_ws(F.col("text")).alias("n_tok")
    ).filter((F.col("n_tok") > 0) & F.col("doc_id").isNotNull())
    w = Window.partitionBy("lang").orderBy("doc_id")
    with_off = toks.withColumn(
        "off", F.sum("n_tok").over(w) - F.col("n_tok")
    )
    L = F.lit(_PACK_LEN)
    spans = with_off.select(
        "doc_id", "lang", "n_tok", "off",
        F.explode(
            F.sequence(
                (F.col("off") / L).cast("long"),
                ((F.col("off") + F.col("n_tok") - 1) / L).cast("long"),
            )
        ).alias("seq_id"),
    )
    tok_in_seq = (
        F.least((F.col("seq_id") + 1) * L, F.col("off") + F.col("n_tok"))
        - F.greatest(F.col("seq_id") * L, F.col("off"))
    )
    return (
        spans.withColumn("tok_in_seq", tok_in_seq)
        .groupBy("lang", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok_in_seq").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


SQL_DOC_PACK = f"""
WITH toks AS (
  -- no key, no pack position (mirrors the Spark-side NULL-id filter)
  SELECT * FROM (
    SELECT doc_id, lang, len({_DUCK_TOKS}) AS n_tok FROM documents
  ) WHERE n_tok > 0 AND doc_id IS NOT NULL
), with_off AS (
  SELECT doc_id, lang, n_tok,
         CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS off
  FROM toks
), spans AS (
  SELECT doc_id, lang, n_tok, off,
         unnest(range(off // {_PACK_LEN}, (off + n_tok - 1) // {_PACK_LEN} + 1)) AS seq_id
  FROM with_off
)
SELECT lang, seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(least((seq_id + 1) * {_PACK_LEN}, off + n_tok)
                - greatest(seq_id * {_PACK_LEN}, off)) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM spans
GROUP BY lang, seq_id
"""


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — TF-IDF: term frequency per doc x ln(N/df), top-3 terms per
    doc for doc_id < 20 with deterministic (score desc, token asc)
    tiebreak. The df table is a narrow token-keyed agg broadcast back —
    same two-pass discipline as the scaling stats."""
    from amazon_macie_activity_generator_spark.operators.dedup import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    tf = (
        docs.select(F.col("doc_id"), F.explode(tokens_expr(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    scored = (
        tf.filter(F.col("doc_id") < 20)
        .join(F.broadcast(dfreq), on="token")
        .withColumn("score", F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "score", F.col("rank").cast("long").alias("rank"))
    )


SQL_TFIDF = f"""
WITH tok AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 4) AS score
  FROM tf JOIN dfreq USING (token), n
  WHERE tf.doc_id < 20
)
SELECT doc_id, token, score, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rank
  FROM scored
) WHERE rank <= 3
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — canonical-form md5 fingerprint (cross-engine-stable)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint_md5(F.col("text")).alias("fingerprint"))


SQL_DOC_FINGERPRINT = """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
FROM documents
"""

# -------------------------------------------------------------- multimodal

def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: docs-as-binary-media through the Arrow-batched
    mapInPandas decode stage; sha256 + byte counts oracle-check."""
    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs, kind="image")
    feats = extract_media_features(media, decode_stub=True)
    return feats.select("media_id", "kind", "n_bytes", "content_hash")


SQL_MULTIMODAL = """
SELECT doc_id AS media_id, 'image' AS kind,
       octet_length(encode(coalesce(text, ''))) AS n_bytes,
       sha256(coalesce(text, '')) AS content_hash
FROM documents
"""


def q_multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full stub decode incl. fake dimensions. Oracle-checked: the fake
    width/height derive from the sha256 hex prefix, which the oracle
    re-derives with a positional hex-digit sum; duration_ms (NULL for
    images) is pinned to -1 in both engines so the all-null column can't
    dtype-drift between pandas and DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs, kind="image")
    out = extract_media_features(media, decode_stub=True)
    return out.select(
        "media_id", "kind", "n_bytes", "width", "height",
        F.coalesce("duration_ms", F.lit(-1)).alias("duration_ms"),
        "content_hash",
    )


SQL_MULTIMODAL_DECODE = """
WITH d AS (
  SELECT doc_id AS media_id, 'image' AS kind,
         CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
         sha256(coalesce(text, '')) AS content_hash
  FROM documents
), h AS (
  SELECT *, CAST(list_sum(list_transform(range(8),
        i -> CAST(strpos('0123456789abcdef', substr(content_hash, i + 1, 1)) - 1 AS BIGINT)
             * CAST(power(16, 7 - i) AS BIGINT))) AS BIGINT) AS h16
  FROM d
)
SELECT media_id, kind, n_bytes,
       (h16 % 1920) + 1 AS width,
       ((h16 // 1920) % 1080) + 1 AS height,
       CAST(-1 AS BIGINT) AS duration_ms,
       content_hash
FROM h
"""


def q_multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL (non-stub) header decode: deterministic well-formed BMP/WAV
    payloads are generated from doc_id (operators/multimodal.py
    synthetic_media), then decode_stub=False actually parses the bytes —
    BMP dims from the BITMAPINFOHEADER, WAV duration from the RIFF chunk
    walk. Because payload construction is id-parameterized, the oracle
    predicts every decoded value arithmetically: the hash check proves
    the parser read real bytes correctly. NULL-by-kind fields pinned to
    -1 (same dtype-drift convention as multimodal_decode_stub)."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        synthetic_media,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    media = synthetic_media(docs.select("doc_id"))
    out = extract_media_features(media, decode_stub=False)
    return out.select(
        "media_id", "kind", "n_bytes",
        F.coalesce("width", F.lit(-1)).alias("width"),
        F.coalesce("height", F.lit(-1)).alias("height"),
        F.coalesce("duration_ms", F.lit(-1)).alias("duration_ms"),
    )


SQL_MULTIMODAL_DECODE_REAL = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
       CAST(CASE WHEN doc_id % 2 = 0
            THEN 54 + (((1 + doc_id % 64) * 3 + 3) // 4 * 4) * (1 + doc_id % 48)
            ELSE 44 + 2 * (100 + doc_id % 400) END AS BIGINT) AS n_bytes,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 64 ELSE -1 END AS BIGINT) AS width,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 48 ELSE -1 END AS BIGINT) AS height,
       CAST(CASE WHEN doc_id % 2 = 1
            THEN (100 + doc_id % 400) * 1000 // 8000 ELSE -1 END AS BIGINT) AS duration_ms
FROM documents WHERE doc_id < 300
"""


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize normalization stage over binary media. Fully
    oracle-checked (upgraded from rows-only): the stub emits a
    deterministic payload — sha256(input payload) repeated to
    width*height//64 bytes — so the oracle re-derives the byte length
    arithmetically AND the first 32 payload bytes as sha256(coalesce(text, '')),
    proving the mapInPandas stage transformed the real input bytes."""
    from amazon_macie_activity_generator_spark.operators.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs, kind="image")
    out = resize_images(media, width=224, height=224)
    return out.select(
        "media_id", "width", "height",
        F.length("payload").cast("long").alias("n_bytes"),
        F.lower(F.hex(F.expr("substring(payload, 1, 32)"))).alias("head_hash"),
    )


SQL_MULTIMODAL_RESIZE = """
SELECT doc_id AS media_id,
       CAST(224 AS BIGINT) AS width,
       CAST(224 AS BIGINT) AS height,
       CAST(224 * 224 // 64 AS BIGINT) AS n_bytes,
       sha256(coalesce(text, '')) AS head_hash
FROM documents
"""


# byte sum of a decoded frame payload, JVM-side (hex-pair fold): the
# pixel-level evidence column shared by the real-decode frame routes;
# frames are <= 105 bytes (GIF grammar) / <= 576 bytes (AVI grammar)
_FRAME_SUM_EXPR = (
    "aggregate(transform("
    " sequence(1, cast(length(frame_payload) as int)),"
    " i -> cast(conv(substring(hex(frame_payload), 2*i-1, 2),"
    "               16, 10) as bigint)),"
    " 0L, (a, x) -> a + x)"
)


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling flat-map stage — three routes since round
    12. doc_id % 4 != 3 rides the deterministic stub (frame count from
    the sha256-derived fake duration, frame_sum pinned -1); NULL
    doc_ids fall in NO route — ``NULL % k`` is NULL in Spark and DuckDB
    alike, so NULL-id corpora are excluded from this entry in both
    engines (they produced stub rows before r11; documented exclusion).
    doc_id % 8 == 3 routes REAL animated-GIF bytes (the
    ``synthetic_gif_media`` grammar — feature parities re-keyed to
    id//8 / id//16 in r12, since under the %8==3 route the old (id//4)
    interlace parity was constant-false) through
    ``sample_frames(decode_stub=False)``: the oracle re-derives the
    sampled frame timeline (500 ms GCE delays -> even frame indices
    below n_frames) AND each sampled frame's RGB byte sum arithmetically
    through LZW decode, the 16-color table, GCE timestamps, and (for odd
    id//16 files) REAL COMPOSITING WITH TRANSPARENCY — partial
    interior-column frames with GCE-transparent index 0 over a
    disposal-1 kept screen, so each interior position shows its LAST
    opaque frame's pixel (else frame 0's) and the predicted sum is
    unreproducible without an actual transparency-aware compositor.
    Because the transparency holes of an interlaced patch are
    row-dependent, odd id//8 (interlaced) composite files make the
    four-pass descatter OBSERVABLE in these sums — closing the r11
    review's note that whole-frame sums of opaque frames are
    row-permutation-invariant. doc_id % 8 == 7 routes REAL MJPEG-in-AVI
    bytes (round 12,
    the ``synthetic_avi_media`` grammar): the oracle predicts each
    sampled frame's byte sum through the AVI RIFF walk, per-frame JPEG
    Huffman+IDCT decode, and the fixed-point YCbCr->RGB conversion
    (dcY/dcCb/dcCr arithmetic, the ``multimodal_pixels_jpeg`` formula),
    plus the dwMicroSecPerFrame timeline. Late round 13: odd id//8
    files on the AVI slice are UNCOMPRESSED DIB AVIs (fccHandler
    'DIB ', BI_RGB bottom-up BGR frames) — the second real video
    codec — whose frame sums are direct arithmetic over the raw fill,
    so the oracle also proves the DIB row-unpadding and
    bottom-up/BGR flips. A hash match therefore proves real
    multi-frame pixel decode across both container families and both
    AVI codecs, not container sniffing."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        sample_frames,
        synthetic_avi_media,
        synthetic_gif_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    # r13: every route's encode+decode is Python CPU behind mapInPandas,
    # and the table arrives as ONE input split locally — unspread, the
    # whole LZW/JPEG/DIB per-frame decode ran on a single core (measured
    # 4 tasks total). An id-sized repartition is the cheapest possible
    # spread (the heavy bytes are GENERATED after the exchange).
    par = spark.sparkContext.defaultParallelism
    stub_media = documents_as_media(
        docs.filter(F.col("doc_id") % 4 != 3).repartition(par, "doc_id"),
        kind="video")
    stub = sample_frames(stub_media, every_ms=1000, max_frames=8).select(
        "media_id", "frame_idx", "ts_ms",
        F.lit(-1).cast("long").alias("frame_sum"),
    )
    gif_media = synthetic_gif_media(
        docs.filter(F.col("doc_id") % 8 == 3).select("doc_id")
        .repartition(par, "doc_id"))
    real_gif = sample_frames(
        gif_media, every_ms=1000, max_frames=8, decode_stub=False,
    ).select(
        "media_id", "frame_idx", "ts_ms",
        F.expr(_FRAME_SUM_EXPR).alias("frame_sum"),
    )
    avi_media = synthetic_avi_media(
        docs.filter(F.col("doc_id") % 8 == 7).select("doc_id")
        .repartition(par, "doc_id"))
    real_avi = sample_frames(
        avi_media, every_ms=1000, max_frames=8, decode_stub=False,
    ).select(
        "media_id", "frame_idx", "ts_ms",
        F.expr(_FRAME_SUM_EXPR).alias("frame_sum"),
    )
    return stub.unionByName(real_gif).unionByName(real_avi)


SQL_MULTIMODAL_FRAMES = """
WITH h AS (
  SELECT doc_id AS media_id,
         CAST(list_sum(list_transform(range(8),
           i -> CAST(strpos('0123456789abcdef', substr(sha256(coalesce(text, '')), i + 1, 1)) - 1 AS BIGINT)
                * CAST(power(16, 7 - i) AS BIGINT))) AS BIGINT) % 600000 AS duration_ms
  FROM documents WHERE doc_id % 4 <> 3
), f AS (
  SELECT media_id,
         unnest(range(least(8, greatest(1, duration_ms // 1000)))) AS frame_idx
  FROM h
), stub AS (
  SELECT media_id, frame_idx, frame_idx * 1000 AS ts_ms,
         CAST(-1 AS BIGINT) AS frame_sum
  FROM f
), g AS (
  SELECT doc_id AS i, 3 + doc_id % 5 AS w, 2 + doc_id % 4 AS h,
         1 + doc_id % 6 AS nf
  FROM documents WHERE doc_id % 8 = 3
), rf AS (
  SELECT i, w, h, nf, unnest([0, 2, 4]) AS f FROM g
), realgif AS (
  -- even id//16: full-frame opaque pixels (i + 3f + j) % 16.
  -- odd id//16: frame 0 full-frame; frames f >= 1 partial INTERIOR
  -- rects (left=1, top=1, iw=w-2, ih=max(1,h-2)) composited over the
  -- KEPT screen (disposal 1) with GCE-transparent index 0 — border
  -- columns AND the top/bottom border rows carry frame 0's pixels,
  -- and an interior position (patch index j' = (r-1)*(w-2) + (c-1))
  -- shows its LAST frame f' <= f whose patch pixel there is a nonzero
  -- index, else frame 0's pixel. The partial HEIGHT is what makes
  -- interlace descatter observable: patch (h-2 rows) and screen
  -- (h rows) scatter under different permutations, so misplaced
  -- transparency holes show through the wrong frame-0 rows.
  SELECT i AS media_id, CAST(f AS BIGINT) AS frame_idx,
         CAST(500 * f AS BIGINT) AS ts_ms,
         CAST(6 * list_sum(list_transform(range(w * h),
              j -> CASE
                     WHEN (i // 16) % 2 = 0 OR f = 0
                       THEN (i + 3 * f + j) % 16
                     WHEN (j % w) = 0 OR (j % w) = w - 1
                          OR (j // w) = 0
                          OR (j // w) >= 1 + GREATEST(1, h - 2)
                       THEN (i + j) % 16
                     ELSE COALESCE(
                       (i + 3 * list_max(list_filter(range(1, f + 1),
                          ff -> (i + 3 * ff + ((j // w - 1) * (w - 2)
                                               + (j % w) - 1)) % 16 != 0))
                          + ((j // w - 1) * (w - 2) + (j % w) - 1)) % 16,
                       (i + j) % 16)
                   END)) AS BIGINT) AS frame_sum
  FROM rf WHERE f < nf
), av AS (
  SELECT doc_id AS i, 1 + doc_id % 3 AS nb, 1 + doc_id % 6 AS nf
  FROM documents WHERE doc_id % 8 = 7
), avf AS (
  SELECT i, nb, nf, unnest([0, 2, 4]) AS f FROM av
), avb AS (
  -- even i//8 files are MJPEG; odd are the DIB route below
  SELECT i, f, unnest(range(nb)) AS bk
  FROM avf WHERE f < nf AND (i // 8) % 2 = 0
), avc AS (
  -- MJPEG-in-AVI route: DC-only 4:4:4 blocks with flat q=8, so every
  -- decoded sample of block bk is the fixed-point YCbCr->RGB image of
  -- (128 + dcY, dcCb, dcCr) — the multimodal_pixels_jpeg arithmetic
  SELECT i, f,
         128 + (i + 3 * f + 7 * bk) % 64 - 32 AS y,
         (2 * i + 5 * f + 11 * bk) % 64 - 32 AS cb1,
         (3 * i + 7 * f + 13 * bk) % 64 - 32 AS cr1
  FROM avb
), realavi AS (
  SELECT i AS media_id, CAST(f AS BIGINT) AS frame_idx,
         CAST(500 * f AS BIGINT) AS ts_ms,
         CAST(64 * sum(
             GREATEST(0, LEAST(255, y + CAST(floor((91881 * cr1 + 32768) / 65536.0) AS BIGINT)))
           + GREATEST(0, LEAST(255, y - CAST(floor((22554 * cb1 + 46802 * cr1 + 32768) / 65536.0) AS BIGINT)))
           + GREATEST(0, LEAST(255, y + CAST(floor((116130 * cb1 + 32768) / 65536.0) AS BIGINT)))
         ) AS BIGINT) AS frame_sum
  FROM avc GROUP BY i, f
), realavidib AS (
  -- uncompressed DIB route (late r13, odd i//8): frame f's top-down
  -- RGB byte j is (i + 3f + j) % 256 — no codec replay, the sum is
  -- direct arithmetic over the frame's w*h*3 = nb*192 bytes; a hash
  -- match proves the RIFF walk + DIB unpadding + bottom-up/BGR flips
  SELECT i AS media_id, CAST(f AS BIGINT) AS frame_idx,
         CAST(500 * f AS BIGINT) AS ts_ms,
         CAST(list_sum(list_transform(range(nb * 192),
              j -> (i + 3 * f + j) % 256)) AS BIGINT) AS frame_sum
  FROM avf WHERE f < nf AND (i // 8) % 2 = 1
)
SELECT * FROM stub
UNION ALL SELECT * FROM realgif
UNION ALL SELECT * FROM realavi
UNION ALL SELECT * FROM realavidib
"""


# ------------------------------------------------------------ json / time

def q_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — JSON property extraction from events.props.

    Uses the pinned cross-engine contract in ``functions/jsonx.py``: the
    old ``get_json_object(..).cast('long')`` THREW under Spark 4's
    default ANSI mode on any non-integral ``$.k`` (one malformed crawl
    row = dead job), and plain TRY_CAST twins diverge because DuckDB
    rounds decimal text and parses hex (see module docstring there).
    """
    events = spread_small_scan(load_table(spark, sf_dir, "events"), "event_id")
    return events.select(
        "event_id",
        extract_int_prop("props", "$.k").alias("k"),
    )


SQL_JSON_EXTRACT = f"""
SELECT event_id,
       {sql_int_prop('props', '$.k')} AS k
FROM events
"""


def q_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — hourly tumbling counts per event_type."""
    events = load_table(spark, sf_dir, "events")
    out = tumbling_counts(events, bucket="hour")
    return out.select(
        F.col("bucket").cast("string").alias("bucket"),
        "event_type", "n_events", "sum_value",
    )


SQL_TUMBLING = """
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS bucket, event_type,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — 30-min-gap sessionization per user (gaps-and-islands)."""
    events = load_table(spark, sf_dir, "events")
    return sessionize(events, gap_minutes=30)


SQL_SESSIONIZE = """
WITH marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS brk
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, count(*) AS n_events,
       min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
FROM sess GROUP BY user_id, session_id
"""

# ----------------------------------------- fake content / sinks / pipeline

def q_fake_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F12/K6 — deterministic fake-document generation keyed by event_id
    (rows-only: content is hash-derived, format asserted in tests)."""
    from amazon_macie_activity_generator_spark.functions.fake import fake_document

    events = spread_small_scan(load_table(spark, sf_dir, "events"), "event_id")
    doc = fake_document(
        F.col("event_id"),
        fake_types=["ssn", "itin", "email", "sentence", "phone_number"],
        fake_counts=2,
        prefix="sensitive/",
    )
    return events.select("event_id", doc.alias("d")).select(
        "event_id", "d.object_key", "d.provider", "d.content"
    )


def q_s3_put_activities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 — one fake S3 object row per unit of datapoint value (rows-only;
    count/shape asserted in tests; T9 zero-skip folded in)."""
    from amazon_macie_activity_generator_spark.sinks.local import s3_put_activity_rows
    from amazon_macie_activity_generator_spark.sources.tables import spread_small_scan

    # spread the one-input-split scan (r13, the _docs rule): the
    # explode + per-row fake-document generation is the CPU cost and
    # otherwise runs entirely on the scan's single task
    events = spread_small_scan(load_table(spark, sf_dir, "events"), "event_id")
    dp = events.select(
        "event_id", (F.pmod(F.col("value").cast("long"), F.lit(4))).alias("value")
    )
    target = {"prefix": "acts/", "fake_types": ["ssn", "itin"], "fake_counts": 1,
              "content_types": ["text/plain", "text/html"], "acls": ["private", "public-read"]}
    return s3_put_activity_rows(dp, target, key_cols=("event_id",))


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): every click event picks up the
    latest purchase value at-or-before its timestamp for the same user.
    Oracle = DuckDB's native ASOF LEFT JOIN — Spark has no built-in, the
    union+running-last composition IS the operator. No-match rows surface
    -1.0 (null-free hashing). NULL-ts events are excluded on BOTH sides
    (no time, no as-of position — a NULL-ts purchase would sort NULLS
    FIRST into Spark's running-last window and become the "earliest"
    value, while DuckDB's ASOF c.ts >= NULL never matches)."""
    from amazon_macie_activity_generator_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 4).alias("value"))
    )
    out = asof_join(clicks, purchases, ts_col="ts", by=["user_id"], value_col="value")
    return out.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.coalesce(F.col("asof_value"), F.lit(-1.0)).alias("asof_value"),
    )


SQL_ASOF_JOIN = """
WITH clicks AS (
  SELECT user_id, ts, event_id FROM events
  WHERE event_type = 'click' AND ts IS NOT NULL
),
p AS (
  SELECT user_id, ts, round(max(value), 4) AS value
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL GROUP BY 1, 2
)
SELECT c.user_id, epoch_us(c.ts) AS ts_us, c.event_id,
       coalesce(p.value, -1.0) AS asof_value
FROM clicks c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join (operators/interval.py): 8 fixed 90-minute
    windows (every 3h from the corpus day start) x all events, joined via
    time-bucket discretization — no nested loop. Counts + value sums per
    window; DuckDB twin is the plain range join."""
    from amazon_macie_activity_generator_spark.operators.interval import interval_join

    events = load_table(spark, sf_dir, "events")
    day0 = events.agg(F.date_trunc("day", F.min("ts")).alias("d0"))
    intervals = (
        day0.select(F.explode(F.sequence(F.lit(0), F.lit(7))).alias("k"), "d0")
        .select(
            "k",
            (F.col("d0") + F.make_interval(hours=F.col("k") * 3)).alias("start_ts"),
            (F.col("d0") + F.make_interval(hours=F.col("k") * 3, mins=F.lit(90))).alias("end_ts"),
        )
    )
    hits = interval_join(events, intervals, ts_col="ts", bucket_minutes=30)
    return hits.groupBy(F.col("k").cast("long").alias("k")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


SQL_INTERVAL_JOIN = """
WITH d0 AS (SELECT date_trunc('day', min(ts)) AS d FROM events),
iv AS (
  SELECT k, d + k * INTERVAL 3 HOUR AS s,
         d + k * INTERVAL 3 HOUR + INTERVAL 90 MINUTE AS e
  FROM d0, range(0, 8) AS r(k)
)
SELECT iv.k, count(*) AS n_events, round(sum(ev.value), 4) AS sum_value
FROM events ev JOIN iv ON ev.ts >= iv.s AND ev.ts <= iv.e
GROUP BY iv.k
"""


def q_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets breadth (§2.7 gap coverage): CUBE over
    (event_type, hour-of-day) with grouping_id — all four aggregation
    granularities in one shuffle."""
    events = load_table(spark, sf_dir, "events")
    hod = F.hour("ts").alias("hod")
    return (
        events.cube(F.col("event_type"), hod)
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("hod").cast("long"), F.lit(-1)).alias("hod"),
            "gid", "n_events", "sum_value",
        )
    )


SQL_CUBE_EVENTS = """
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(CAST(hod AS BIGINT), -1) AS hod,
       CAST(grouping(event_type) * 2 + grouping(hod) AS BIGINT) AS gid,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM (SELECT event_type, hour(ts) AS hod, value FROM events)
GROUP BY CUBE (event_type, hod)
-- empty-relation semantics: Spark's cube emits NO rows for an empty
-- input, SQL emits the grand-total grouping set (count 0). Every
-- grouping-set row over a non-empty input aggregates >= 1 row, so this
-- filter only pins the empty case to Spark's behavior.
HAVING count(*) > 0
"""


def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal exact dedup: md5 over the opaque BINARY payload column
    (operators/multimodal.py schema) — the dedup key a media pipeline
    uses when bytes are all it has. Payloads here are utf-8 text bytes,
    so the oracle digests the text: identical bytes, identical md5."""
    from amazon_macie_activity_generator_spark.operators.multimodal import (
        documents_as_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    return (
        media.groupBy(F.md5("payload").alias("payload_md5"))
        .agg(F.min("media_id").alias("media_id"), F.count(F.lit(1)).alias("n_copies"))
    )


SQL_MEDIA_DEDUP = """
SELECT md5(coalesce(text, '')) AS payload_md5,
       min(doc_id) AS media_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group selection (eval-set picking): order each
    user's events by a hash of the event id and keep the first 2 — stable
    under any partitioning, exact membership oracle-checks."""
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit("ps:"), F.col("event_id").cast("string")))
    w = Window.partitionBy("user_id").orderBy(h.asc(), F.col("event_id").asc())
    return (
        events.filter(F.col("user_id") < 30)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
        .select("user_id", "event_id", F.col("rank").cast("long").alias("rank"))
    )


SQL_PER_GROUP_SAMPLE = """
SELECT user_id, event_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT user_id, event_id,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY md5('ps:' || CAST(event_id AS VARCHAR)) ASC, event_id ASC
         ) AS rank
  FROM events WHERE user_id < 30
) WHERE rank <= 2
"""


def q_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 — 2-hour windows hopping every hour (each event in 2 windows).
    Spark's native window(ts, '2 hours', '1 hour'); the oracle expands the
    window membership with a generate_series cross join."""
    from amazon_macie_activity_generator_spark.operators.sessionize import sliding_counts

    events = load_table(spark, sf_dir, "events")
    return sliding_counts(events, window_hours=2, slide_hours=1)


SQL_SLIDING = """
SELECT CAST(date_trunc('hour', ts) - k.k * INTERVAL 1 HOUR AS VARCHAR) AS win_start,
       event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events, range(0, 2) AS k(k)
WHERE ts IS NOT NULL
GROUP BY 1, 2
"""


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/holdout split (operators/sampling.py): bucket =
    md5 prefix vs hex threshold — engine-stable, so the exact membership
    (not just the ratio) oracle-checks. Per-lang counts prove stratified
    stability."""
    from amazon_macie_activity_generator_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id", train_fraction=0.9)
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


from amazon_macie_activity_generator_spark.operators.sampling import (  # noqa: E402
    split_threshold_hex,
)

SQL_HASH_SPLIT = f"""
SELECT lang,
       CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 6)
                 < '{split_threshold_hex(0.9)}'
            THEN 'train' ELSE 'holdout' END AS split,
       count(*) AS n_docs, min(doc_id) AS min_doc_id
FROM documents GROUP BY 1, 2
"""


_STRAT_FRACTIONS = {"en": 0.25, "zh": 0.5}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rebalancing: cap en to 25% and zh to 50%, keep the rest —
    deterministic per-stratum membership (operators/sampling.py), so the
    exact surviving doc set oracle-checks."""
    from amazon_macie_activity_generator_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_sample(docs, "doc_id", "lang", _STRAT_FRACTIONS)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


SQL_STRATIFIED_SAMPLE = f"""
SELECT lang, count(*) AS n_docs, min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM documents
WHERE substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 6)
      < CASE lang WHEN 'en' THEN '{split_threshold_hex(0.25)}'
                  WHEN 'zh' THEN '{split_threshold_hex(0.5)}'
                  ELSE 'g' END
GROUP BY lang
"""


def q_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — corpus token-frequency table (the wordcount of training-data
    curation: stopword lists, vocab pruning). Explode whitespace tokens,
    one agg; top 20 with deterministic (count desc, token asc) tiebreak."""
    from amazon_macie_activity_generator_spark.operators.dedup import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens_expr(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


SQL_TOKEN_FREQ = f"""
SELECT tok AS token, count(*) AS n
FROM (SELECT unnest({_DUCK_TOKS}) AS tok FROM documents)
GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 20
"""


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding int8 quantization (operators/similarity.py
    with_quantize_int8 — the hoisted form; the captured-expression Column
    form re-evaluates the O(dim) scale tree per element, 5.4x slower):
    per-vector scale, integer checksum of the quantized codes (exact
    cross-engine), and L2 reconstruction error (round 4)."""
    from amazon_macie_activity_generator_spark.operators.similarity import (
        dequant_error,
        with_quantize_int8,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = with_quantize_int8(emb).select("vec_id", "qz", "embedding")
    return out.select(
        "vec_id",
        F.round(F.col("qz.scale"), 6).alias("scale6"),
        F.aggregate(F.col("qz.q"), F.lit(0).cast("long"), lambda a, b: a + b).alias("q_sum"),
        F.round(dequant_error(F.col("embedding"), F.col("qz")), 4).alias("err4"),
    )


SQL_EMBEDDING_QUANTIZE = f"""
WITH qz AS (
  SELECT vec_id, embedding,
         -- non-finite component => no quantization (scale NULL cascades
         -- to NULL codes/err below), mirroring quantize_int8's guard
         CASE WHEN len(list_filter(embedding, x -> {NONFINITE_COMPONENT_SQL})) > 0 THEN NULL
              ELSE list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
         END AS scale
  FROM embeddings
),
q AS (
  SELECT vec_id, embedding, scale,
         list_transform(embedding,
           x -> CASE WHEN scale = 0 THEN 0
                ELSE CAST(round(CAST(x AS DOUBLE) / scale, 0) AS INT) END) AS codes
  FROM qz
)
SELECT vec_id, round(scale, 6) AS scale6,
       -- empty-list sums are 0, not NULL (Spark's aggregate() has an
       -- explicit 0 init; DuckDB's list_aggregate gives NULL on [])
       CAST(CASE WHEN len(codes) = 0 THEN 0
                 ELSE list_aggregate(codes, 'sum') END AS BIGINT) AS q_sum,
       round(sqrt(CASE WHEN len(codes) = 0 THEN 0.0
                       ELSE list_aggregate(
         list_transform(list_zip(embedding, codes),
           p -> pow(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) * scale, 2.0)),
         'sum') END), 4) AS err4
FROM q
"""


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/X1 streaming — the events table written TWICE into the source
    (guaranteed duplicates), streamed through watermark-bounded
    dropDuplicatesWithinWatermark, appended to a memory sink, then counted
    per type. Dedup is deterministic, so the result value-hash-matches the
    batch DISTINCT oracle: streaming and batch dedup agree."""
    import os
    import tempfile
    import uuid

    from amazon_macie_activity_generator_spark.streaming.replay import streaming_dedup

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="amag_sdedup_")
    src = os.path.join(work, "src")
    events.write.parquet(src)
    events.write.mode("append").parquet(src)  # plant exact duplicates
    stream = spark.readStream.schema(events.schema).parquet(src)
    name = "dedup_" + uuid.uuid4().hex[:8]
    q = (
        streaming_dedup(stream, watermark="2 hours", keys=["event_id"])
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.count_distinct(F.col("event_id")).alias("n_ids"))
    )


SQL_STREAMING_DEDUP = """
SELECT event_type, count(DISTINCT event_id) AS n_events,
       count(DISTINCT event_id) AS n_ids
FROM events WHERE ts IS NOT NULL GROUP BY 1
"""


def q_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2/X6 streaming — watermarked tumbling-window counts via Structured
    Streaming (availableNow drain, complete mode), value-matching the same
    DuckDB oracle as the batch query: the streaming and batch engines agree."""
    import os
    import tempfile
    import uuid

    from amazon_macie_activity_generator_spark.streaming.replay import (
        streaming_tumbling_counts,
    )

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="amag_stream_")
    src = os.path.join(work, "src")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    name = "tumbling_" + uuid.uuid4().hex[:8]
    q = (
        streaming_tumbling_counts(stream, "1 hour", "2 hours")
        .writeStream.format("memory").queryName(name).outputMode("complete")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    return spark.table(name).select(
        F.col("bucket").cast("string").alias("bucket"),
        "event_type", "n_events", "sum_value",
    )


def q_streaming_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/K2 — full queue round-trip: generate a blueprint cycle, enqueue
    slot rows (twice — dedup ids must absorb the duplicate), replay with
    availableNow, return delivered slot rows (rows-only: side-effecting)."""
    import os
    import tempfile

    from amazon_macie_activity_generator_spark.config import parse_blueprint
    from amazon_macie_activity_generator_spark.operators.reshape import slot_row_json
    from amazon_macie_activity_generator_spark.plans.generate import generate
    from amazon_macie_activity_generator_spark.sinks.local import write_queue
    from amazon_macie_activity_generator_spark.streaming.replay import replay_to_table

    bp = parse_blueprint({
        "commons": {"num_points": 60, "signal_min": 1, "signal_max": 10},
        "generators": [
            {"id": "g1", "shape": "sinusoidal", "config": {"frequency": 0.1}},
            {"id": "g2", "shape": "square",
             "config": {"high_value": 9, "low_value": 2, "high_width": 3, "low_width": 7}},
        ],
        "targets": [],
    })
    fact = generate(spark, bp, run_id="replayrun", anomaly_mode="stride")
    slot_rows = slot_row_json(fact).withColumn("run_id", F.lit("replayrun"))
    work = tempfile.mkdtemp(prefix="amag_replay_")
    qpath = os.path.join(work, "queue")
    write_queue(slot_rows, qpath)
    write_queue(slot_rows, qpath)
    schema = spark.read.parquet(qpath).schema
    # r14 (VERDICT item 7, guide §6): this entry is a BULK drain
    # (availableNow), so it uses the documented bulk mode —
    # max_files_per_trigger=128 folds the ~64 queue files (two
    # repartition(t) writes) into one micro-batch instead of ~64, each
    # of which paid a checkpoint/state commit (~9 s of build per rep
    # measured; ~0.8 s after). The delivered row SET is identical:
    # dropDuplicatesWithinWatermark keys on (run_id, t) regardless of
    # batch boundaries and the result projects only (run_id, t, body) —
    # hash-verified before/after (cd94e466, 60 rows). The
    # one-file-per-tick default stays for processing-time cadence
    # callers (the reference's pacing).
    sq = replay_to_table(
        spark, qpath, schema, os.path.join(work, "delivered"),
        os.path.join(work, "ckpt"), available_now=True,
        max_files_per_trigger=128,
    )
    sq.awaitTermination(300)
    return spark.read.parquet(os.path.join(work, "delivered")).select("run_id", "t", "body")


def q_blueprint_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP1-EP3 — full blueprint lifecycle (generate -> queue -> dispatch ->
    all three sink types, local mode); returns the CloudWatch metrics table
    (rows-only: run dirs + hash-derived content)."""
    import tempfile

    from amazon_macie_activity_generator_spark.config import parse_blueprint
    from amazon_macie_activity_generator_spark.plans.pipeline import run_blueprint

    bp = parse_blueprint({
        "commons": {"num_points": 50, "signal_min": 1, "signal_max": 8},
        "generators": [
            {"id": "ts1", "shape": "sinusoidal", "config": {"frequency": 0.25}},
            {"id": "ts2", "shape": "constant", "config": {"num_points": 25, "constant": 5}},
            {"id": "ts6", "shape": "custom", "config": {"formula": "t * 2"}},
        ],
        "targets": [
            {"type": "s3", "prefix": "sensitive/", "action": "put",
             "generators": ["ts2"], "fake_types": ["ssn", "itin"], "fake_counts": 1},
            {"type": "s3", "action": "get", "slice_size": 3, "generators": ["ts1"]},
            {"type": "lambda", "function": "test", "generators": ["ts1"], "group_datapoints": True},
            {"type": "cloudwatch", "namespace": "Test/TS",
             "generators": ["ts1", "ts2", "ts6"], "group_datapoints": True},
        ],
    })
    work = tempfile.mkdtemp(prefix="amag_e2e_")
    out = run_blueprint(spark, bp, work, run_id="e2erun", anomaly_mode="stride")
    cw = next(t for t in out["targets"] if t["type"] == "cloudwatch")
    return spark.read.parquet(cw["metrics"]).select(
        "dim_id", "dim_shape", "timestamp", "value"
    )


# -------------------------------------------- analytics breadth (§2.7 gaps)

def q_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 inverse — pivot the event series wide, then unpivot back to the
    long fact shape (zero-filled slots surface as explicit 0 rows)."""
    from amazon_macie_activity_generator_spark.operators.reshape import (
        pivot_slot_rows,
        unpivot_slot_rows,
    )
    from amazon_macie_activity_generator_spark.queries import EVENT_TYPES, _events
    from amazon_macie_activity_generator_spark.sources.real_series import events_as_series

    s = events_as_series(_events(spark, sf_dir)).filter(F.col("t") < 1500)
    wide = pivot_slot_rows(s, series_ids=EVENT_TYPES, agg="max")
    long = unpivot_slot_rows(wide, series_ids=EVENT_TYPES)
    return long.select("t", "series_id", F.round("value", 4).alias("value"))


SQL_UNPIVOT = """
WITH s AS (
  SELECT event_type AS series_id,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS t,
         value
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
),
grid AS (SELECT DISTINCT t FROM s WHERE t < 1500),
series AS (SELECT unnest(['click','error','purchase','signup','view']) AS series_id)
SELECT g.t, se.series_id, round(coalesce(s.value, 0), 4) AS value
FROM grid g CROSS JOIN series se
LEFT JOIN s ON s.t = g.t AND s.series_id = se.series_id
"""


def q_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions (absent in the reference, §2.7): per-event-type
    10-row moving average + running count over event time."""
    from pyspark.sql import Window

    from amazon_macie_activity_generator_spark.functions.rounding import round_fixed

    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # no time, no timeline: NULL-ts events are excluded (oracle mirrors)
    # round_fixed, not round(): a moving average can land exactly on a
    # .xxxx5 half boundary where the engines' round() modes disagree
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return events.select(
        "event_id", "event_type",
        round_fixed(F.avg("value").over(w.rowsBetween(-9, 0)), 4).alias("moving_avg"),
        F.count(F.lit(1)).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("running_n"),
    )


from amazon_macie_activity_generator_spark.functions.rounding import sql_round_fixed  # noqa: E402

_MAVG = ("avg(value) OVER (PARTITION BY event_type ORDER BY ts, event_id "
         "ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)")
SQL_ROLLING = f"""
SELECT event_id, event_type,
       {sql_round_fixed(_MAVG, 4)} AS moving_avg,
       count(*) OVER (PARTITION BY event_type ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS running_n
FROM events WHERE ts IS NOT NULL
"""


def q_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets / ROLLUP (absent in the reference, §2.7): subtotals
    and grand total over the pricing summary."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").try_cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "sum_qty", "n_rows",
        )
    )


SQL_ROLLUP = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       CAST(sum(CASE WHEN isnan(l_quantity) THEN NULL ELSE TRY_CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
-- pins the empty relation to Spark semantics (no grand-total row);
-- no-op on non-empty input — see SQL_CUBE_EVENTS
HAVING count(*) > 0
"""


def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-data pipeline: quality filter -> canonical-form
    dedup (md5 fingerprint, keep min doc_id) -> drop language-unidentified
    docs -> per-language survivor stats. The full chain oracle-checks."""
    from amazon_macie_activity_generator_spark.operators.text import (
        fingerprint_md5,
        lang_id_expr,
        quality_features,
    )
    from pyspark.sql import Window

    docs = spread_small_scan(load_table(spark, sf_dir, "documents"), "doc_id")
    # no key, no canonical identity: the pick-one window orders by
    # doc_id, and the engines disagree on NULL sort position — a NULL-id
    # duplicate would be kept by Spark (NULLS FIRST) and dropped by the
    # oracle (NULLS LAST). Same rule as doc_pack/inverted_index.
    feat = quality_features(docs.filter(F.col("doc_id").isNotNull())).filter(
        (F.col("n_tokens") >= 10) & (F.col("punct_ratio") <= 0.3)
    )
    with_fp = feat.select(
        "doc_id", "lang", "n_tokens", "quality_score",
        fingerprint_md5(F.col("text")).alias("fp"),
        lang_id_expr(F.col("text")).alias("lang_pred"),
    )
    canon = with_fp.withColumn(
        "rk", F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
    ).filter(F.col("rk") == 1)
    kept = canon.filter(F.col("lang_pred") != "und")
    return kept.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.avg("quality_score"), 4).alias("avg_quality"),
    )


SQL_CORPUS_CLEAN = f"""
WITH tok AS (
  -- no key, no canonical identity (mirrors the Spark-side NULL-id filter)
  SELECT doc_id, text, lang, length(text) AS n_chars, {_DUCK_TOKS} AS toks,
         length(regexp_replace(text, '[a-zA-Z0-9{JAVA_WS}]', '', 'g')) AS punct
  FROM documents WHERE doc_id IS NOT NULL
),
feat AS (
  SELECT doc_id, text, toks, len(toks) AS n_tokens,
         CASE WHEN n_chars > 0 THEN CAST(punct AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio,
         CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks, t -> list_contains({_DUCK_EN_STOP}, t))) AS DOUBLE) / len(toks)
              ELSE 0.0 END AS stopword_ratio
  FROM tok
),
scored AS (
  SELECT *,
         round((CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 1.0 ELSE 0.3 END)
         * (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 1.0 - punct_ratio END)
         * (0.5 + 0.5 * least(stopword_ratio * 5, 1.0)), 4) AS quality_score,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
         list_sort([
           struct_pack(hits := {_duck_hits('de')}, lang := 'de'),
           struct_pack(hits := {_duck_hits('en')}, lang := 'en'),
           struct_pack(hits := {_duck_hits('es')}, lang := 'es'),
           struct_pack(hits := {_duck_hits('fr')}, lang := 'fr'),
           struct_pack(hits := {_duck_hits('zh')}, lang := 'zh')
         ])[-1] AS best
  FROM feat
  WHERE n_tokens >= 10 AND round(punct_ratio, 4) <= 0.3
),
canon AS (
  SELECT *, CASE WHEN best.hits > 0 THEN best.lang ELSE 'und' END AS lang_pred,
         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rk
  FROM scored
)
SELECT lang_pred, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(quality_score), 4) AS avg_quality
FROM canon WHERE rk = 1 AND lang_pred <> 'und'
GROUP BY lang_pred
"""

def q_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    session state across micro-batches. The MECHANISM is not
    SQL-expressible, but with availableNow (one batch) the RESULT is
    deterministic — every closed session, i.e. the batch gaps-and-islands
    sessionization minus each user's final (still-open) session — so the
    entry carries a full value-hash oracle (round 4; was rows-only)."""
    import os
    import tempfile
    import uuid

    from amazon_macie_activity_generator_spark.operators.sessionize import (
        sessionize_stateful,
    )

    events = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="amag_state_")
    src = os.path.join(work, "src")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    name = "sess_state_" + uuid.uuid4().hex[:8]
    q = (
        sessionize_stateful(stream, gap_minutes=30)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    return spark.table(name)


# the stateful emitter's exact contract: the batch sessionization minus
# each user's max session_id (the session still open in state)
SQL_SESSIONIZE_STATEFUL = """
WITH marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS brk
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM marked
),
agg AS (
  SELECT user_id, session_id, count(*) AS n_events,
         min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id, session_id, n_events, start_us, end_us
FROM agg
WHERE session_id < (SELECT max(a2.session_id) FROM agg a2
                    WHERE a2.user_id = agg.user_id)
"""


def q_doc_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin-Karp rolling-hash fingerprint over the token stream
    (rows-only: engine-local hash; md5 variant is the oracle-checked one)."""
    from amazon_macie_activity_generator_spark.operators.text import fingerprint_rolling

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint_rolling(F.col("text")).alias("fingerprint"))


def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregation over the main fact table (decimal sums for
    cross-engine exactness; filters push to the parquet scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).try_cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_AGG_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CASE WHEN isnan(l_quantity) THEN NULL ELSE TRY_CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_qty,
       CAST(sum(CASE WHEN isnan(l_extendedprice) THEN NULL ELSE TRY_CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_base_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_join_topn_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + sort/limit: top-10 customers by order value; dimension side
    broadcast (no shuffle of the fact table beyond the agg)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").try_cast("decimal(18,2)")).cast("double").alias("total_spend"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    joined = spend.join(F.broadcast(customer), spend.o_custkey == customer.c_custkey)
    return (
        joined.select("c_custkey", "c_name", "total_spend", "n_orders")
        .orderBy(F.desc("total_spend"), "c_custkey")
        .limit(10)
    )


SQL_JOIN_TOPN = """
SELECT c_custkey, c_name, total_spend, n_orders
FROM (
  SELECT o_custkey, CAST(sum(CASE WHEN isnan(o_totalprice) THEN NULL ELSE TRY_CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS total_spend,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey
) s JOIN customer ON s.o_custkey = c_custkey
ORDER BY total_spend DESC, c_custkey LIMIT 10
"""


def q_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join / NOT EXISTS (§2.7 gap): customers with no big-ticket
    order (> 300k) — the filter pushes below the anti join."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


SQL_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000
)
"""


def q_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event_type (median/p90/p99) —
    Spark percentile() and DuckDB quantile_cont share linear
    interpolation; round(4) absorbs FP accumulation order."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


SQL_PERCENTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type
"""


def q_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct per day (the expensive one — two-level agg;
    approx_count_distinct is the rows-only scale alternative)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    ).select(F.col("day").cast("string").alias("day"), "n_users", "n_events")


SQL_DISTINCT_DAILY = """
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY 1
"""


def q_salted_agg_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage aggregation (operators/skew.py): per-user sums
    through a salted partial stage — result identical to the plain
    groupBy, which is exactly what the oracle checks."""
    from amazon_macie_activity_generator_spark.operators.skew import salted_agg

    events = load_table(spark, sf_dir, "events")
    out = salted_agg(events.select("user_id", "value"), key="user_id", value_col="value", salt=8)
    return out.select("user_id", F.round("sum_value", 4).alias("sum_value"), "n_rows")


SQL_SALTED_AGG = """
SELECT user_id, round(sum(value), 4) AS sum_value, count(*) AS n_rows
FROM events GROUP BY user_id
"""


def q_approx_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approximate distinct per day (rows-only: sketch values
    are engine-local; the exact twin is distinct_users_daily). The 100 TB
    path — one pass, bounded sketch memory, no per-key exact state."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(F.to_date("ts").alias("day")).agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
    ).select(F.col("day").cast("string").alias("day"), "approx_users")


def q_set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: purchasers who clicked but never errored
    (INTERSECT + EXCEPT)."""
    events = load_table(spark, sf_dir, "events")
    u = lambda t: events.filter(F.col("event_type") == t).select("user_id").distinct()  # noqa: E731
    return u("purchase").intersect(u("click")).exceptAll(u("error"))


SQL_SET_OPS = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error'
"""


EXT_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_minhash": (q_dedup_minhash, None),
    "dedup_minhash_md5": (q_dedup_minhash_md5, SQL_DEDUP_MINHASH_MD5),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, SQL_DEDUP_NGRAM),
    "dedup_groups": (q_dedup_groups, SQL_DEDUP_GROUPS),
    "dedup_simhash": (q_dedup_simhash, None),
    "dedup_simhash_md5": (q_dedup_simhash_md5, SQL_DEDUP_SIMHASH_MD5),
    "embedding_near_dup": (q_embedding_near_dup, SQL_EMBEDDING_NEAR_DUP),
    "topk_cosine": (q_topk_cosine, SQL_TOPK_COSINE),
    "topk_cosine_lsh": (q_topk_cosine_lsh, SQL_TOPK_COSINE_LSH),
    "topk_recall_lsh": (q_topk_recall_lsh, SQL_TOPK_RECALL_LSH),
    "topk_cosine_ivf": (q_topk_cosine_ivf, None),
    "text_token_stats": (q_text_token_stats, SQL_TEXT_TOKEN_STATS),
    "text_quality": (q_text_quality, SQL_TEXT_QUALITY),
    "lang_id": (q_lang_id, SQL_LANG_ID),
    "doc_fingerprint": (q_doc_fingerprint, SQL_DOC_FINGERPRINT),
    "doc_chunk": (q_doc_chunk, SQL_DOC_CHUNK),
    "doc_pack": (q_doc_pack, SQL_DOC_PACK),
    "tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF),
    "pii_redact": (q_pii_redact, SQL_PII_REDACT),
    "multimodal_features": (q_multimodal_features, SQL_MULTIMODAL),
    "media_dedup": (q_media_dedup, SQL_MEDIA_DEDUP),
    "per_group_sample": (q_per_group_sample, SQL_PER_GROUP_SAMPLE),
    "multimodal_decode_stub": (q_multimodal_decode_stub, SQL_MULTIMODAL_DECODE),
    "multimodal_decode_real": (q_multimodal_decode_real, SQL_MULTIMODAL_DECODE_REAL),
    "multimodal_resize": (q_multimodal_resize, SQL_MULTIMODAL_RESIZE),
    "multimodal_frames": (q_multimodal_frames, SQL_MULTIMODAL_FRAMES),
    "json_extract_props": (q_json_extract_props, SQL_JSON_EXTRACT),
    "tumbling_counts": (q_tumbling_counts, SQL_TUMBLING),
    "sliding_counts": (q_sliding_counts, SQL_SLIDING),
    "asof_join": (q_asof_join, SQL_ASOF_JOIN),
    "interval_join": (q_interval_join, SQL_INTERVAL_JOIN),
    "cube_events": (q_cube_events, SQL_CUBE_EVENTS),
    "hash_split": (q_hash_split, SQL_HASH_SPLIT),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "token_freq": (q_token_freq, SQL_TOKEN_FREQ),
    "embedding_quantize": (q_embedding_quantize, SQL_EMBEDDING_QUANTIZE),
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    "sessionize_stateful": (q_sessionize_stateful, SQL_SESSIONIZE_STATEFUL),
    "doc_fingerprint_rolling": (q_doc_fingerprint_rolling, None),
    "fake_content": (q_fake_content, None),
    "s3_put_activities": (q_s3_put_activities, None),
    "streaming_tumbling": (q_streaming_tumbling, SQL_TUMBLING),
    "streaming_dedup": (q_streaming_dedup, SQL_STREAMING_DEDUP),
    "streaming_replay": (q_streaming_replay, None),
    "blueprint_e2e": (q_blueprint_e2e, None),
    "unpivot_roundtrip": (q_unpivot_roundtrip, SQL_UNPIVOT),
    "rolling_stats": (q_rolling_stats, SQL_ROLLING),
    "rollup_pricing": (q_rollup_pricing, SQL_ROLLUP),
    "corpus_clean": (q_corpus_clean, SQL_CORPUS_CLEAN),
    "agg_pricing_summary": (q_agg_pricing_summary, SQL_AGG_PRICING),
    "join_topn_customers": (q_join_topn_customers, SQL_JOIN_TOPN),
    "set_ops_users": (q_set_ops_users, SQL_SET_OPS),
    "anti_join_customers": (q_anti_join_customers, SQL_ANTI_JOIN),
    "percentiles_by_type": (q_percentiles_by_type, SQL_PERCENTILES),
    "distinct_users_daily": (q_distinct_users_daily, SQL_DISTINCT_DAILY),
    "salted_agg_users": (q_salted_agg_users, SQL_SALTED_AGG),
    "approx_distinct_daily": (q_approx_distinct_daily, None),
}
