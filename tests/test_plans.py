"""Physical-plan assertions: the scale properties README.md claims —
pushdown, pruning, broadcast joins, no unpartitioned windows — pinned so
a refactor that silently degrades the plan fails CI, not the cluster."""

from __future__ import annotations

from amazon_macie_activity_generator_spark.queries import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_agg_pricing_pushdown_and_pruning(spark, sf_dir):
    fn, _ = QUERIES["agg_pricing_summary"]
    plan = _plan(fn(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # pruned scan: only the 5 referenced columns reach the reader
    read_schema = next(ln for ln in plan.splitlines() if "ReadSchema" in ln)
    assert "l_quantity" in read_schema and "l_comment" not in read_schema
    assert read_schema.count(":") <= 6


def test_join_topn_broadcasts_dimension(spark, sf_dir):
    fn, _ = QUERIES["join_topn_customers"]
    plan = _plan(fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_scale_minmax_no_unpartitioned_window(spark, sf_dir):
    """Per-series min/max must be two-pass agg + broadcast join — an
    unpartitioned window would single-thread the whole table at scale."""
    fn, _ = QUERIES["scale_minmax"]
    plan = _plan(fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_generation_stays_expression_only(spark):
    """The generation DAG: no Python UDFs anywhere (BatchEvalPython would
    mean a per-row Python round trip in the hot path)."""
    from amazon_macie_activity_generator_spark.config import parse_blueprint
    from amazon_macie_activity_generator_spark.plans.generate import generate

    bp = parse_blueprint({
        "commons": {"num_points": 50},
        "generators": [
            {"id": "a", "shape": "sinusoidal", "config": {"frequency": 0.2}},
            {"id": "b", "shape": "random", "config": {"type": "gammavariate", "alpha": 2.0}},
            {"id": "c", "shape": "custom",
             "config": {"formula": "t * 2 + 1", "anomalies": {"start": 5, "end": 20, "counts": 3}}},
        ],
        "targets": [],
    })
    plan = _plan(generate(spark, bp, run_id="plantest"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
