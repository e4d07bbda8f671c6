"""VERDICT r7 ask #3 — hostile KEY DISTRIBUTION sweeps (the degenerate
sweeps cover hostile values; this covers hostile volume-per-key):

- events: a hub user owning ~30% of all rows AND one event_type series
  owning ~90% — the bot-user / dominant-series shape;
- documents: a 150-copy exact-duplicate cluster (the boilerplate page)
  plus one source owning ~80% of the corpus;
- documents (mega): a 10,000-copy cluster swept through the LINEAR
  dedup paths (hash-groupBy census; no pair formation) with a wall
  bound — the paths a 100 TB pipeline must route mega-clusters through;
- embeddings: 300 bit-identical vectors (one LSH bucket / kmeans cell
  swallowing the corpus) — the salted-bucket paths' worst case;
- lineitem: one hot part in ~30% of line items — a hub node in the
  co-purchase graph for the pagerank/triangle/pair census family.

Every oracle-backed family entry must AGREE cross-engine on these
corpora (ties under massive key collision are where pick-one windows
silently diverge), and the plan-shape assertions pin the two structural
reasons a hub key stays cheap at scale: map-side partial aggregation
(reducer input is bounded by #map-tasks x #groups, not hub row count)
and the salted/banded pair paths (no unsalted self-join on a heavy
bucket). Measured skew-vs-uniform wall-clock lives in SCALE.md
(scripts/skew_stress.py).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import duckdb
import pytest

import __spark_entry__ as entrymod
from _cross_engine import assert_agree as _assert_agree

# the skew RECIPES are single-sourced in scripts/skew_stress.py (this
# sweep validates correctness on the same corpus shapes the SCALE.md
# wall-clock numbers are measured on — shared builders keep the two from
# de-syncing), imported here at smaller copy counts
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))
from skew_stress import (  # noqa: E402
    write_dup_cluster_docs,
    write_hot_part_lineitem,
    write_hub_user_events,
    write_identical_vec_emb,
)

SRC = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _clone(tmp_path_factory, name: str, skip: set[str]) -> str:
    d = tmp_path_factory.mktemp(name)
    for t in TABLES:
        if t not in skip:
            shutil.copy(f"{SRC}/{t}.parquet", str(d / f"{t}.parquet"))
    return str(d)


def _duck_for(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# ------------------------------------------------------------ events hub

@pytest.fixture(scope="module")
def skew_ev_dir(tmp_path_factory):
    d = _clone(tmp_path_factory, "skew_ev", skip={"events"})
    write_hub_user_events(SRC, f"{d}/events.parquet")
    return d


@pytest.fixture(scope="module")
def skew_ev_duck(skew_ev_dir):
    con = _duck_for(skew_ev_dir)
    yield con
    con.close()


_EV_FAMILY = [
    "tumbling_counts", "sliding_counts", "rolling_stats",
    "rolling_time_window", "hourly_activity_spine", "event_gaps",
    "interpolate_gaps", "event_funnel", "retention_cohorts",
    "markov_transitions", "session_paths", "dedup_latest_event",
    "sessionize", "event_id_dedup_gate", "events_time_gate",
    "events_value_gate", "distinct_users_daily", "salted_agg_users",
]
EV_ENTRIES = sorted(set(_EV_FAMILY) & set(entrymod.oracle_sql()))


def test_ev_family_is_covered():
    # the sweep list can't silently rot: every named entry exists, and
    # at least a dozen are oracle-backed (hash-comparable) right now
    missing = [n for n in _EV_FAMILY if n not in entrymod.queries()]
    assert not missing, f"unknown entries in skew sweep: {missing}"
    assert len(EV_ENTRIES) >= 12


@pytest.mark.parametrize("name", EV_ENTRIES)
def test_engines_agree_on_hub_user_events(name, spark, skew_ev_dir, skew_ev_duck):
    _assert_agree(name, spark, skew_ev_dir, skew_ev_duck, what="hub-user/hot-series events")


def test_hub_key_aggregation_is_partial(spark, skew_ev_dir):
    """The structural reason a 30%-of-rows key stays cheap: map-side
    partial aggregation. The reducer owning the hub key receives one
    pre-aggregated row per map task, not the hub's raw rows."""
    df = entrymod.queries()["tumbling_counts"](spark, skew_ev_dir)
    plan = df._jdf.queryExecution().executedPlan().toString().lower()
    assert "partial" in plan, "no map-side partial aggregation in the plan"


# --------------------------------------------------------- documents dup

@pytest.fixture(scope="module")
def skew_doc_dir(tmp_path_factory):
    d = _clone(tmp_path_factory, "skew_doc", skip={"documents"})
    write_dup_cluster_docs(SRC, f"{d}/documents.parquet", n_copies=150,
                           id_start=50_001, hub_source_frac=8,
                           alternate_cluster_sources=True)
    return d


@pytest.fixture(scope="module")
def skew_doc_duck(skew_doc_dir):
    con = _duck_for(skew_doc_dir)
    yield con
    con.close()


_DOC_FAMILY = [
    "dedup_exact", "dedup_minhash_md5", "dedup_simhash_md5",
    "dedup_ngram_jaccard", "dedup_groups", "dedup_keep_best",
    "dedup_containment", "dedup_chunk_exact", "dedup_incremental",
    "split_leakage", "doc_fingerprint", "winnowing_fingerprint",
    "source_overlap", "doc_id_dedup_gate", "contamination_ngram",
]
DOC_ENTRIES = sorted(set(_DOC_FAMILY) & set(entrymod.oracle_sql()))


def test_doc_family_is_covered():
    missing = [n for n in _DOC_FAMILY if n not in entrymod.queries()]
    assert not missing, f"unknown entries in skew sweep: {missing}"
    assert len(DOC_ENTRIES) >= 10


@pytest.mark.parametrize("name", DOC_ENTRIES)
def test_engines_agree_on_duplicate_cluster(name, spark, skew_doc_dir, skew_doc_duck):
    _assert_agree(name, spark, skew_doc_dir, skew_doc_duck, what="150-copy dup cluster")


# --------------------------------------------------- mega duplicate cluster

@pytest.fixture(scope="module")
def mega_doc_dir(tmp_path_factory):
    d = _clone(tmp_path_factory, "mega_doc", skip={"documents"})
    write_dup_cluster_docs(SRC, f"{d}/documents.parquet", n_copies=10_000,
                           id_start=100_001)
    return d


@pytest.fixture(scope="module")
def mega_doc_duck(mega_doc_dir):
    con = _duck_for(mega_doc_dir)
    yield con
    con.close()


# the LINEAR paths only: census/groupBy/fingerprint — the ones a real
# pipeline routes a 10k-copy cluster through. Pair-emitting near-dup
# entries are deliberately NOT swept here; their output on a 10k clique
# is ~50M pairs BY DEFINITION (covered at 150 copies above, and by the
# scale probe's --stress bounded-task check).
MEGA_ENTRIES = sorted(
    {"dedup_exact", "dedup_chunk_exact", "doc_fingerprint", "doc_id_dedup_gate"}
    & set(entrymod.oracle_sql())
)


@pytest.mark.parametrize("name", MEGA_ENTRIES)
def test_linear_paths_absorb_mega_cluster(name, spark, mega_doc_dir, mega_doc_duck):
    start = time.monotonic()
    _assert_agree(name, spark, mega_doc_dir, mega_doc_duck, what="10k-copy dup cluster")
    # generous wall bound: a quadratic path on a 10k clique would not
    # come back in minutes, a hash-groupBy census returns in seconds
    assert time.monotonic() - start < 120


# ----------------------------------------------------- embeddings bucket

@pytest.fixture(scope="module")
def skew_emb_dir(tmp_path_factory):
    d = _clone(tmp_path_factory, "skew_emb", skip={"embeddings"})
    write_identical_vec_emb(SRC, f"{d}/embeddings.parquet", n_clones=300,
                            id_start=90_001)
    return d


@pytest.fixture(scope="module")
def skew_emb_duck(skew_emb_dir):
    con = _duck_for(skew_emb_dir)
    yield con
    con.close()


_EMB_FAMILY = [
    "embedding_near_dup", "semantic_dedup", "topk_cosine", "topk_cosine_lsh",
    "knn_classify", "vec_id_unique_audit", "embedding_finite_gate",
    "embedding_quantize",
]
EMB_ENTRIES = sorted(set(_EMB_FAMILY) & set(entrymod.oracle_sql()))


def test_emb_family_is_covered():
    missing = [n for n in _EMB_FAMILY if n not in entrymod.queries()]
    assert not missing, f"unknown entries in skew sweep: {missing}"
    assert len(EMB_ENTRIES) >= 6


@pytest.mark.parametrize("name", EMB_ENTRIES)
def test_engines_agree_on_identical_vector_bucket(name, spark, skew_emb_dir, skew_emb_duck):
    _assert_agree(name, spark, skew_emb_dir, skew_emb_duck, what="300 identical vectors")


# -------------------------------------------------------- graph hub node

@pytest.fixture(scope="module")
def skew_li_dir(tmp_path_factory):
    d = _clone(tmp_path_factory, "skew_li", skip={"lineitem"})
    write_hot_part_lineitem(SRC, f"{d}/lineitem.parquet")
    return d


@pytest.fixture(scope="module")
def skew_li_duck(skew_li_dir):
    con = _duck_for(skew_li_dir)
    yield con
    con.close()


GRAPH_ENTRIES = sorted(
    {"copurchase_pairs", "pagerank_copurchase", "triangle_count"}
    & set(entrymod.oracle_sql())
)


def test_graph_family_is_covered():
    assert len(GRAPH_ENTRIES) == 3


@pytest.mark.parametrize("name", GRAPH_ENTRIES)
def test_engines_agree_on_hub_node_graph(name, spark, skew_li_dir, skew_li_duck):
    _assert_agree(name, spark, skew_li_dir, skew_li_duck, what="hub part in 30% of lineitem")
