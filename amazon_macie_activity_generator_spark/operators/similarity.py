"""X3 — similarity search over embedding columns (array<float>).

Two paths:
- ``brute_force_topk``: exact cosine top-k. Query side broadcast, cosine
  as a pure zip_with/aggregate expression (JVM codegen), per-query top-k
  via a window over the query key — the window partitions by query id,
  so no global sort. The right baseline, and exact.
- ``lsh_bucket_topk``: the scale path — random-hyperplane LSH (Charikar
  '02 SRP): deterministic Rademacher planes from xxhash64, bucket id =
  sign-bit string, candidates = bucket collisions under multi-probe
  (all Hamming-1 neighbors), exact cosine re-rank within candidates.
  At 100 TB: corpus bucketing is one narrow pass; queries join only
  their probe buckets instead of the full corpus.

Cosine accumulates in float64 in deterministic index order (matters for
cross-engine oracle parity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from amazon_macie_activity_generator_spark.functions.rng import hash_long


def _dvec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double."""
    return F.aggregate(
        F.zip_with(_dvec(a), _dvec(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(_dvec(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot_expr(a, b) / denom)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k: (query_id, vec_id, sim) — k rows per query.

    Ties broken by rounded sim desc then vec_id asc, so results are
    fully deterministic (and cross-engine stable)."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    joined = corpus.crossJoin(F.broadcast(q)).filter(F.col(query_id_col) != F.col(id_col))
    sim = F.round(cosine_expr(F.col(vec_col), F.col("__qvec")), 4)
    scored = joined.select(query_id_col, id_col, sim.alias("sim"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )


# ------------------------------------------------------------- LSH / ANN

def srp_bucket_expr(vec: Column, planes: int = 12, salt: str = "srp") -> Column:
    """Signed-random-projection bucket id (long). Plane p is a Rademacher
    vector: component i = ±1 from hash(p, i). dot(v, plane_p) >= 0 sets
    bit p. Pure expression; identical planes everywhere by construction."""
    def plane_dot(p: int) -> Column:
        idx = F.sequence(F.lit(0), F.size(vec) - 1)
        signed = F.zip_with(
            _dvec(vec),
            idx,
            lambda x, i: F.when(
                F.pmod(hash_long(F.lit(p), i, salt=salt), F.lit(2)) == 0, x
            ).otherwise(-x),
        )
        return F.aggregate(signed, F.lit(0.0), lambda acc, x: acc + x)

    bucket = F.lit(0).cast("long")
    for p in range(planes):
        bucket = bucket + F.when(plane_dot(p) >= 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 12,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN top-k with standard AND-OR amplification: ``tables``
    independent hash tables of ``planes`` sign bits each (AND within a
    table, OR across tables), plus Hamming-1 multi-probe on the query
    side. Exact-cosine re-rank of candidates. Recall/cost tunes with
    (planes, tables): fewer planes or more tables = bigger candidate
    sets = higher recall.

    The corpus pass is one narrow projection (id, vec, table, bucket);
    the join key (table, bucket) shuffles candidates only."""
    def table_buckets(vec: Column, probe: bool) -> Column:
        entries = []
        for t in range(tables):
            b = srp_bucket_expr(vec, planes, salt=f"srp{t}")
            entries.append(F.struct(F.lit(t).alias("tbl"), b.alias("bucket")))
            if probe:
                entries.extend(
                    F.struct(
                        F.lit(t).alias("tbl"),
                        b.bitwiseXOR(F.lit(1 << p)).cast("long").alias("bucket"),
                    )
                    for p in range(planes)
                )
        return F.array(*entries)

    c = corpus.select(
        F.col(id_col), F.col(vec_col),
        F.explode(table_buckets(F.col(vec_col), probe=False)).alias("tb"),
    ).select(id_col, vec_col, F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec"),
        F.explode(table_buckets(F.col(vec_col), probe=True)).alias("tb"),
    ).select(query_id_col, "__qvec", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))

    cand = c.join(q, on=["tbl", "bucket"]).filter(F.col(query_id_col) != F.col(id_col))
    sim = F.round(cosine_expr(F.col(vec_col), F.col("__qvec")), 4)
    scored = cand.select(query_id_col, id_col, sim.alias("sim")).dropDuplicates(
        [query_id_col, id_col]
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )


def embedding_near_dup(
    df: DataFrame,
    threshold: float = 0.95,
    planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via SRP bucket self-join +
    exact cosine filter. Returns (id_a, id_b, sim)."""
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        srp_bucket_expr(F.col(vec_col), planes).alias("bucket"),
    )
    l, r = base.alias("l"), base.alias("r")
    pairs = l.join(r, on=[F.col("l.bucket") == F.col("r.bucket"), F.col("l.id") < F.col("r.id")])
    sim = F.round(cosine_expr(F.col("l.v"), F.col("r.v")), 4)
    return (
        pairs.select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"), sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )
