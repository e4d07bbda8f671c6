"""hard_negatives_lsh — the triplet miner over the SRP-LSH candidate
generator must agree with the exact miner where their candidate sets
overlap, and keep the exact miner's aggregation shape (struct-max
argmax, no window over the scored stream)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_macie_activity_generator_spark.queries_ext5 import (
    q_hard_negatives,
    q_hard_negatives_lsh,
)


def _by_anchor(df):
    return {r.query_id: r for r in df.collect()}


def test_lsh_miner_agrees_with_exact(spark, sf_dir):
    exact = _by_anchor(q_hard_negatives(spark, sf_dir))
    lsh = _by_anchor(q_hard_negatives_lsh(spark, sf_dir))
    assert len(lsh) > 0
    # every LSH anchor exists in the exact result (exact covers all
    # anchors that have any candidate at all)
    assert set(lsh) <= set(exact)
    # LSH candidates are a subset of the corpus, so the hardest LSH
    # positive/negative can never beat the exact one
    for qid, r in lsh.items():
        e = exact[qid]
        assert r.label == e.label
        assert r.pos_sim <= e.pos_sim
        assert r.neg_sim <= e.neg_sim
    # coverage: almost every anchor keeps both a positive and a negative
    # candidate through the bucket pipeline (89/100 at sf0.001)
    assert len(lsh) / len(exact) >= 0.8
    # recall: the multi-probe buckets find the exact hardest negative for
    # a nonzero share of anchors (13/89 at sf0.001, 29/93 at sf0.01 —
    # i.i.d. 64-dim embeddings are LSH's worst case; real clustered
    # corpora collide much harder), and the hardest IN-BUCKET negative
    # tracks the exact one closely in similarity (median gap 0.056,
    # max 0.22 at sf0.001)
    same_neg = sum(1 for qid, r in lsh.items() if r.neg_id == exact[qid].neg_id)
    assert same_neg / len(lsh) >= 0.10
    gaps = sorted(exact[qid].neg_sim - r.neg_sim for qid, r in lsh.items())
    assert gaps[len(gaps) // 2] <= 0.10  # median
    assert gaps[-1] <= 0.35  # worst anchor
    # and where both ids match, the sims (and margin) match exactly
    for qid, r in lsh.items():
        e = exact[qid]
        if r.pos_id == e.pos_id and r.neg_id == e.neg_id:
            assert (r.pos_sim, r.neg_sim, r.margin) == (e.pos_sim, e.neg_sim, e.margin)


def test_lsh_miner_plan_shape(spark, sf_dir):
    """Candidates form via the (table, bucket)-keyed join — never a
    cartesian product — and the argmax is a partial-aggregable struct
    max, not a window over the scored stream."""
    df = q_hard_negatives_lsh(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_max" in plan  # map-side combinable argmax
    assert "Window" not in plan
