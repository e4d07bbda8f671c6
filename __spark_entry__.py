"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` — operator catalog; see
``amazon_macie_activity_generator_spark/queries.py`` for the implementations and the
DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amazon_macie_activity_generator_spark.queries import QUERIES  # noqa: E402

# --------------------------------------------------------------------------
# Driver-verification rotation.
#
# The correctness harness checks the first ~50 entries of queries() in
# insertion order each round. Round 1's artifact (CORRECTNESS_r01.json)
# covered the catalog's natural head — these 50 names — leaving the
# ext2/ext3/streaming/sink entries without a driver row. Rotate them to
# the front so round 2's window lands on the unchecked set (oracle-backed
# entries first: they produce the strong hash-match signal; rows-only
# entries after; the previously-checked head goes last).
# --------------------------------------------------------------------------
_R1_CHECKED = frozenset({
    "gen_constant", "gen_square", "gen_sinusoidal", "gen_custom_formula",
    "gen_custom_recurrence", "gen_random_uniform", "gen_random_counter",
    "gen_random_expo", "gen_random_pareto", "gen_random_weibull",
    "gen_random_triangular", "noise_counter", "fake_formats_counter",
    "real_replay_pad", "scale_minmax", "noise_bounded",
    "anomaly_inject_stride", "align_zero_fill", "slice_explode",
    "chunk_rows", "pivot_slot_row", "group_collect", "payload_json",
    "dedup_exact", "dedup_minhash_md5", "dedup_minhash",
    "dedup_simhash", "dedup_ngram_jaccard", "embedding_near_dup",
    "dedup_groups", "topk_cosine", "topk_cosine_lsh", "topk_cosine_ivf",
    "text_token_stats", "text_quality", "lang_id", "doc_fingerprint",
    "doc_chunk", "tfidf_top_terms", "pii_redact", "multimodal_features",
    "media_dedup", "per_group_sample", "multimodal_decode_stub",
    "multimodal_resize", "multimodal_frames", "json_extract_props",
    "tumbling_counts", "sliding_counts", "asof_join",
})


# Entries added after round 1 — they also lack a driver row, but the r1
# backlog goes first (the verdict's explicit ask); whatever overflows the
# ~50-entry window rotates in next round. Order = check priority.
_NEW_R2 = (
    "topk_recall_lsh", "topk_recall_ivf", "doc_pack",
    "bpe_pair_counts", "mix_sampling_weights", "winnowing_fingerprint",
    "event_funnel", "retention_cohorts", "dedup_keep_best",
    "dedup_incremental",
)


def _rotation_order() -> list[str]:
    unchecked = [n for n in QUERIES if n not in _R1_CHECKED]
    front = [n for n in unchecked if QUERIES[n][1] is not None and n not in _NEW_R2]
    front += [n for n in _NEW_R2 if n in QUERIES]
    front += [n for n in unchecked if QUERIES[n][1] is None]
    return front + [n for n in QUERIES if n in _R1_CHECKED]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: replay the sf0.001 events table as 5 series through
    the full reference pipeline — align (zero-fill) -> signal-scale ->
    stride anomaly injection -> wide slot rows (the queue-entry shape,
    main.py:667-709)."""
    from pyspark.sql import functions as F

    from amazon_macie_activity_generator_spark.operators.align import zero_fill
    from amazon_macie_activity_generator_spark.operators.anomalies import apply_anomalies
    from amazon_macie_activity_generator_spark.operators.reshape import pivot_slot_rows
    from amazon_macie_activity_generator_spark.operators.scaling import scale_minmax
    from amazon_macie_activity_generator_spark.queries import EVENT_TYPES
    from amazon_macie_activity_generator_spark.sources.real_series import events_as_series
    from amazon_macie_activity_generator_spark.sources.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    series = events_as_series(events).select("series_id", "t", "value")
    aligned = zero_fill(spark, series)
    scaled = scale_minmax(aligned, value_col="value", lo=1, hi=20, by=["series_id"])
    with_anomalies = apply_anomalies(
        scaled.withColumn("value", F.col("value").cast("double")),
        [{"start": 10, "end": 100, "counts": 5}],
        n_points=101,
        mode="stride",
    )
    final = with_anomalies.withColumn("value", F.col("value").cast("long"))
    return pivot_slot_rows(final, series_ids=EVENT_TYPES, agg="max").orderBy("t")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name][0] for name in _rotation_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: QUERIES[name][1]
        for name in _rotation_order()
        if QUERIES[name][1] is not None
    }
