"""Blueprint config layer (S1) — typed, validated, analyze-time errors.

Reference loader: ``build_blueprint`` (main.py:1071-1100) fetches JSON
from S3 and merges ``commons`` into each generator config with
dict.update — generator keys win (main.py:1087-1093, README.md:20); a
generator-level ``anomalies`` REPLACES the commons list (README.md:96);
S3 targets without a bucket get the stack default (main.py:1096-1098).

The reference's schema is implicit in ``.get`` defaults; here it is an
explicit dataclass layer so bad blueprints fail at analyze time, not as
a KeyError mid-run (SURVEY.md §1.3).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from amazon_macie_activity_generator_spark.operators.anomalies import normalize_anomaly_specs
from amazon_macie_activity_generator_spark.operators.generators import (
    DEFAULT_NUM_POINTS,
    MAX_NUM_POINTS,
)

KNOWN_SHAPES = {"constant", "square", "sinusoidal", "random", "custom", "real"}
KNOWN_TARGET_TYPES = {"s3", "cloudwatch", "lambda"}
KNOWN_RANDOM_TYPES = {
    "uniform", "triangular", "betavariate", "gammavariate", "weibullvariate",
    "gauss", "normalvariate", "lognormvariate", "expovariate",
    "vonmisesvariate", "paretovariate",
}


class BlueprintError(ValueError):
    pass


@dataclass
class GeneratorSpec:
    id: str
    shape: str
    config: dict[str, Any] = field(default_factory=dict)

    @property
    def num_points(self) -> int:
        n = int(self.config.get("num_points", DEFAULT_NUM_POINTS))
        if n < 1:
            raise BlueprintError(f"generator {self.id!r}: num_points must be >= 1")
        return min(n, MAX_NUM_POINTS)

    @property
    def anomalies(self) -> list[dict]:
        return normalize_anomaly_specs(self.config.get("anomalies"))


@dataclass
class TargetSpec:
    type: str
    config: dict[str, Any] = field(default_factory=dict)

    @property
    def generators(self) -> list[str] | None:
        return self.config.get("generators")

    @property
    def slice_size(self) -> int | None:
        s = self.config.get("slice_size")
        return int(s) if s is not None else None


@dataclass
class Blueprint:
    generators: list[GeneratorSpec]
    targets: list[TargetSpec]
    commons: dict[str, Any] = field(default_factory=dict)

    @property
    def num_points(self) -> int:
        """Grid length = max series length (B2 intent, README.md:137)."""
        return max(g.num_points for g in self.generators)

    def series_ids(self) -> list[str]:
        return [g.id for g in self.generators]


def merge_commons(commons: dict, generator: dict) -> dict:
    """commons copied then update()-ed; generator keys win (main.py:1087-1093).

    Note this is shallow: a generator-level ``anomalies`` replaces the
    commons list entirely (README.md:96) — exactly dict.update semantics.
    """
    merged = dict(commons)
    merged.update(generator.get("config", {}))
    return merged


def parse_blueprint(doc: dict, default_bucket: str | None = None) -> Blueprint:
    commons = doc.get("commons", {})
    gens: list[GeneratorSpec] = []
    seen_ids: set[str] = set()
    for g in doc.get("generators", []):
        gid = g.get("id")
        shape = g.get("shape")
        if not gid:
            raise BlueprintError("generator missing 'id'")
        if gid in seen_ids:
            raise BlueprintError(f"duplicate generator id {gid!r}")
        seen_ids.add(gid)
        if shape not in KNOWN_SHAPES:
            raise BlueprintError(f"generator {gid!r}: unknown shape {shape!r}")
        cfg = merge_commons(commons, g)
        if shape == "random":
            rtype = cfg.get("type", "uniform")
            if rtype not in KNOWN_RANDOM_TYPES:
                raise BlueprintError(f"generator {gid!r}: unknown random type {rtype!r}")
        if shape == "custom" and "formula" not in cfg:
            raise BlueprintError(f"generator {gid!r}: custom shape requires 'formula'")
        if shape == "real" and "key" not in cfg and "path" not in cfg:
            raise BlueprintError(f"generator {gid!r}: real shape requires 'key' or 'path'")
        gens.append(GeneratorSpec(id=gid, shape=shape, config=cfg))
    if not gens:
        raise BlueprintError("blueprint has no generators")

    targets: list[TargetSpec] = []
    for tdoc in doc.get("targets", []):
        ttype = tdoc.get("type")
        if ttype not in KNOWN_TARGET_TYPES:
            raise BlueprintError(f"unknown target type {ttype!r}")
        tcfg = dict(tdoc)
        # default-bucket patch for S3 targets (main.py:1096-1098)
        if ttype == "s3" and default_bucket and not tcfg.get("bucket"):
            tcfg["bucket"] = default_bucket
        targets.append(TargetSpec(type=ttype, config=tcfg))

    return Blueprint(generators=gens, targets=targets, commons=commons)


def load_blueprint(path: str | Path, default_bucket: str | None = None) -> Blueprint:
    """Local-file loader; the S3 fetch of the reference is an environment
    detail, not engine semantics — any JSON byte source works."""
    with open(path) as f:
        return parse_blueprint(json.load(f), default_bucket=default_bucket)
