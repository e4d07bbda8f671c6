"""Partition-invariance: the repo's determinism claim is that results
do not depend on how the data is partitioned (README "Deterministic
randomness, partition-stable"). On a cluster, partition counts change
with executors, AQE, and input splits — any hidden dependence on
partition order (F.first on a non-constant group, unsorted
collect_list, FP summation drift, rand()) shows up as nondeterminism.
Run a cross-section of order-sensitive entries under two very different
shuffle settings and require identical results."""

from __future__ import annotations

import pytest

from amazon_macie_activity_generator_spark.queries import QUERIES

# Entries chosen for order-sensitivity risk: salted aggregation, LSH
# band joins, FP accumulation across iterations, window cumsums, global
# top-k with ties, array building.
SENSITIVE = [
    "salted_agg_users",
    "dedup_minhash_md5",
    "dedup_containment",
    "pagerank_copurchase",
    "doc_pack",
    "topk_cosine",
    "markov_transitions",
    "winnowing_fingerprint",
    "bpe_pair_counts",
    "table_profile",
    # round-5 entries: md5 vote fold + banded join, bucketed candidate
    # argmax with struct-max ties, cumulative-window ECDF max
    "dedup_simhash_md5",
    "hard_negatives_lsh",
    "ks_value_drift",
]


def _run_sorted(fn, spark, sf_dir):
    pdf = fn(spark, sf_dir).toPandas()
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(by=cols, ignore_index=True)


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_partitioning(name, spark, sf_dir):
    fn, _sql = QUERIES[name]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _run_sorted(fn, spark, sf_dir)
        spark.catalog.clearCache()
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = _run_sorted(fn, spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
        spark.catalog.clearCache()
    assert a.shape == b.shape, f"{name}: {a.shape} != {b.shape}"
    assert a.equals(b), f"{name}: results differ across partitionings"
