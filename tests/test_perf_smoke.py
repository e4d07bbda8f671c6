"""VERDICT r5 ask #6 — pin the measured Arrow-vs-expression simhash
choice so a pandas/pyarrow upgrade can't silently invert it. The Arrow
kernel (whole-batch ``np.add.reduceat`` segment sum) was measured ~10x
the expression fold; ``simhash64(use_arrow=True)`` is the default on
that basis. This smoke times both at sf0.01, records the numbers into
``PERF_SMOKE.json`` (untracked — the test must not mutate the committed
``BENCH_DETAIL.json`` ledger, whose canonical single-line format
bench.py owns), and fails only on a gross inversion (expression path
beating Arrow by 2x) — a loose bound on a noisy box, tight enough to
catch a regressed kernel.

Skipped by default (perf tests don't belong in the correctness wall);
run with ``SPARK_GRAFT_PERF_SMOKE=1 pytest tests/test_perf_smoke.py``.
"""

from __future__ import annotations

import json
import os
import time

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_PERF_SMOKE"),
    reason="perf smoke: set SPARK_GRAFT_PERF_SMOKE=1 to run",
)

_DETAIL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "PERF_SMOKE.json")


def test_simhash_arrow_beats_expression(spark):
    from amazon_macie_activity_generator_spark.operators.dedup import simhash64
    from amazon_macie_activity_generator_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    times = {}
    for label, use_arrow in (("arrow", True), ("expression", False)):
        best = float("inf")
        for _ in range(2):  # min-of-2, same discipline as bench.py
            t0 = time.time()
            simhash64(docs, use_arrow=use_arrow).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        times[label] = round(best, 3)

    detail = {}
    if os.path.exists(_DETAIL):
        with open(_DETAIL) as f:
            detail = json.load(f)
    detail["simhash_arrow_s"] = times["arrow"]
    detail["simhash_expression_s"] = times["expression"]
    with open(_DETAIL, "w") as f:
        json.dump(detail, f, indent=1)

    assert times["arrow"] <= times["expression"] * 2.0, (
        f"Arrow simhash kernel regressed past the expression fold: {times} — "
        "re-measure and flip the simhash64 default if this reproduces"
    )
