"""Blueprint config semantics (S1): merge, overrides, validation."""

from __future__ import annotations

import pytest

from amazon_macie_activity_generator_spark.config import (
    BlueprintError,
    merge_commons,
    parse_blueprint,
)


def test_commons_merge_generator_wins():
    # main.py:1087-1093 / README.md:20
    commons = {"num_points": 500, "signal_max": 50}
    g = {"config": {"num_points": 10}}
    merged = merge_commons(commons, g)
    assert merged["num_points"] == 10
    assert merged["signal_max"] == 50


def test_generator_anomalies_replace_commons():
    # README.md:96 — replace, not merge
    commons = {"anomalies": [{"start": 0, "end": 9, "counts": 1}]}
    g = {"config": {"anomalies": [{"start": 5, "end": 6, "counts": 2}]}}
    merged = merge_commons(commons, g)
    assert merged["anomalies"] == [{"start": 5, "end": 6, "counts": 2}]


def test_anomaly_dict_normalized_to_list():
    # main.py:617-619
    bp = parse_blueprint({
        "generators": [{"id": "g", "shape": "constant",
                        "config": {"anomalies": {"start": 1, "end": 2, "counts": 1}}}],
    })
    assert bp.generators[0].anomalies == [{"start": 1, "end": 2, "counts": 1}]


def test_default_bucket_patch():
    # main.py:1096-1098
    bp = parse_blueprint({
        "generators": [{"id": "g", "shape": "constant"}],
        "targets": [{"type": "s3"}, {"type": "s3", "bucket": "mine"}],
    }, default_bucket="default-bkt")
    assert bp.targets[0].config["bucket"] == "default-bkt"
    assert bp.targets[1].config["bucket"] == "mine"


def test_grid_length_is_max_series_length():
    # B2 intent
    bp = parse_blueprint({
        "generators": [
            {"id": "a", "shape": "constant", "config": {"num_points": 10}},
            {"id": "b", "shape": "constant", "config": {"num_points": 30}},
        ],
    })
    assert bp.num_points == 30


def test_num_points_capped_at_14_days():
    bp = parse_blueprint({
        "generators": [{"id": "a", "shape": "constant", "config": {"num_points": 10 ** 9}}],
    })
    assert bp.num_points == 20160  # README.md:41


@pytest.mark.parametrize("doc,msg", [
    ({"generators": []}, "no generators"),
    ({"generators": [{"shape": "constant"}]}, "missing 'id'"),
    ({"generators": [{"id": "a", "shape": "nope"}]}, "unknown shape"),
    ({"generators": [{"id": "a", "shape": "constant"}, {"id": "a", "shape": "constant"}]}, "duplicate"),
    ({"generators": [{"id": "a", "shape": "custom"}]}, "formula"),
    ({"generators": [{"id": "a", "shape": "random", "config": {"type": "zipf"}}]}, "unknown random type"),
    ({"generators": [{"id": "a", "shape": "constant"}], "targets": [{"type": "kafka"}]}, "unknown target"),
])
def test_validation_errors(doc, msg):
    with pytest.raises(BlueprintError, match=msg):
        parse_blueprint(doc)


@pytest.mark.parametrize("commons", [
    {"num_points": 1},                                   # single-slot series
    {"num_points": 5, "signal_min": 7, "signal_max": 7}, # degenerate scale range
    {"num_points": 5, "signal_min": 9, "signal_max": 1}, # inverted scale range
    {"num_points": 5, "anomalies": {"start": 1, "end": 2, "counts": 50}},  # counts >> width
    {"num_points": 4, "noise_min": -1000000, "noise_max": 1000000},        # huge noise
])
def test_generate_total_on_degenerate_commons(spark, commons):
    """Adversarial-but-valid blueprints must generate (right row count,
    no crash) — the config analogue of the degenerate-corpus sweeps."""
    from amazon_macie_activity_generator_spark.plans.generate import generate

    bp = parse_blueprint({
        "commons": commons,
        "generators": [{"id": "a", "shape": "constant", "config": {"constant": 2}}],
        "targets": [],
    })
    assert generate(spark, bp, run_id="degen").count() == commons["num_points"]


# ------------------------------------------- SPARK_GRAFT_EXTRA_CONF seam

class _FakeBuilder:
    """Records .config() calls; no Spark needed to test the parser."""

    def __init__(self):
        self.confs: dict[str, str] = {}

    def config(self, k, v):
        self.confs[k] = v
        return self


@pytest.mark.parametrize("raw,expected", [
    ("a.b=1;c.d=2", {"a.b": "1", "c.d": "2"}),
    ("  a.b = 1 ; ; c.d = x=y ", {"a.b": "1", "c.d": "x=y"}),  # ws trim, empty entry skipped, '=' kept in value
    ("", {}),
    ("a.b=", {"a.b": ""}),  # explicit empty value is legal
])
def test_apply_extra_conf_parses(monkeypatch, raw, expected):
    from amazon_macie_activity_generator_spark.session import _apply_extra_conf

    monkeypatch.setenv("SPARK_GRAFT_EXTRA_CONF", raw)
    b = _FakeBuilder()
    assert _apply_extra_conf(b) is b
    assert b.confs == expected


@pytest.mark.parametrize("raw", [
    "a.b",        # no separator: a typo'd entry must not become conf['a.b'] = ''
    "=v",         # empty key
    "a.b=1;oops", # malformed entry hiding behind a valid one
])
def test_apply_extra_conf_rejects_malformed(monkeypatch, raw):
    from amazon_macie_activity_generator_spark.session import _apply_extra_conf

    monkeypatch.setenv("SPARK_GRAFT_EXTRA_CONF", raw)
    with pytest.raises(ValueError, match="SPARK_GRAFT_EXTRA_CONF"):
        _apply_extra_conf(_FakeBuilder())
