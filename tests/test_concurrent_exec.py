"""Concurrent catalog execution on a shared session (round 8).

A real deployment runs many queries against one SparkSession (thread
pools, notebook servers, schedulers). Spark itself is thread-safe, but
this engine adds session-scoped state on top — ``cache.scoped_persist``
reuses persisted bases across plan branches with per-partition locking,
and several entries collect KB-sized model state at build time. Probed
green first (round-8 probe: 3 trials x 12 entries x 6 threads), pinned
here: concurrent results must be identical to sequential ones,
including every scoped_persist user in the dedup family.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import __spark_entry__ as entrymod
from _cross_engine import canon

NAMES = [
    # every scoped_persist user in the md5-LSH family + a mixed workload
    "dedup_minhash_md5", "dedup_incremental", "dedup_simhash_md5",
    "dedup_groups", "dedup_keep_best", "topk_cosine", "tumbling_counts",
    "dedup_exact", "multimodal_pixels", "embedding_quantize",
    "contamination_ngram", "split_leakage",
]


def test_concurrent_execution_matches_sequential(spark, sf_dir):
    qs = entrymod.queries()
    sequential = {n: canon(qs[n](spark, sf_dir).toPandas()) for n in NAMES}
    spark.catalog.clearCache()

    def run(name):
        return name, canon(qs[name](spark, sf_dir).toPandas())

    with ThreadPoolExecutor(max_workers=6) as ex:
        for name, df in ex.map(run, NAMES):
            assert df.astype(str).equals(sequential[name].astype(str)), (
                f"{name}: concurrent result differs from sequential"
            )
    spark.catalog.clearCache()
