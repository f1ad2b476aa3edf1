"""YAML round-trip for ExperimentConfig.

The reference ships YAML configs that were never wired into training
(``Thesis/07_Configuration_Files/README.md:30-40``; ``model_config_Maze5.yaml:23`` even
has a syntax error). Here YAML is a first-class, loadable representation of the same
typed tree.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Type

import yaml

from adfmsl.config.base import (
    ArchitectureConfig,
    DataConfig,
    ExperimentConfig,
    FMSLConfig,
    FrontendConfig,
    LossConfig,
    MeshConfig,
    ModelConfig,
    OptimizerConfig,
    SpecAugmentConfig,
    TrainConfig,
    Wav2Vec2Config,
)


def _from_dict(cls: Type, d: Dict[str, Any]):
    if d is None:
        return None
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(d) - names
    if unknown:
        # a typo'd/stale key silently falling back to the default is exactly
        # the failure class this package's verifier exists to catch
        import logging

        logging.getLogger(__name__).warning(
            "%s: ignoring unknown config key(s) %s", cls.__name__,
            sorted(unknown))
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        sub = _NESTED.get((cls, f.name))
        kwargs[f.name] = _from_dict(sub, v) if sub is not None else v
    return cls(**kwargs)


_NESTED = {
    (ExperimentConfig, "model"): ModelConfig,
    (ExperimentConfig, "data"): DataConfig,
    (ExperimentConfig, "train"): TrainConfig,
    (ExperimentConfig, "mesh"): MeshConfig,
    (ModelConfig, "architecture"): ArchitectureConfig,
    (ModelConfig, "wav2vec2"): Wav2Vec2Config,
    (ModelConfig, "fmsl"): FMSLConfig,
    (ModelConfig, "spec_augment"): SpecAugmentConfig,
    (ModelConfig, "frontend"): FrontendConfig,
    (TrainConfig, "optimizer"): OptimizerConfig,
    (TrainConfig, "loss"): LossConfig,
}


def save_yaml(cfg: ExperimentConfig, path: str) -> None:
    with open(path, "w") as fh:
        yaml.safe_dump(dataclasses.asdict(cfg), fh, sort_keys=False)


def load_yaml(path: str) -> ExperimentConfig:
    with open(path) as fh:
        d = yaml.safe_load(fh)
    if not isinstance(d, dict):
        raise ValueError(
            f"{path}: expected a YAML mapping of ExperimentConfig fields, got "
            f"{type(d).__name__} (empty file?)")
    return _from_dict(ExperimentConfig, d)
