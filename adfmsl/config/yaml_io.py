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


# ---------------------------------------------------------------------------------
# Reference-YAML compatibility loader (07_Configuration_Files/model_config_*.yaml)
# ---------------------------------------------------------------------------------

# flat reference key -> dotted ExperimentConfig path. Keys in the reference
# files that configure sub-module details adfmsl fixes per MazeSpec
# (transformer_*, attn_pool_hidden_dim, projected_dim, gru_node, blocks,
# in_channels, res_pool_stride_w2v2, amsgrad) are reported as ignored.
_REF_KEY_MAP = {
    # model block
    "nb_samp": "data.cut",
    "first_conv": "model.architecture.first_conv",
    "filts": "model.architecture.filts",
    "nb_fc_node": "model.architecture.nb_fc_node",
    "nb_gru_layer": "model.architecture.nb_gru_layer",
    "nb_classes": "model.architecture.nb_classes",
    "fc_dropout": "model.architecture.fc_dropout",
    "dropout_rate": "model.architecture.dropout_rate",
    "transformer_dropout": "model.architecture.transformer_dropout",
    "wav2vec2_model_name": "model.wav2vec2.model_name",
    "wav2vec2_output_dim": "model.wav2vec2.output_dim",
    "wav2vec2_freeze": "model.wav2vec2.freeze",
    "wav2vec2_unfrozen_transformers": "model.wav2vec2.unfreeze_last_n",
    "use_spec_augment_w2v2": "model.spec_augment.enabled",
    "use_spec_augment_raw": "model.spec_augment.enabled",
    "spec_aug_freq_mask_param_w2v2": "model.spec_augment.freq_mask_param",
    "spec_aug_n_freq_masks_w2v2": "model.spec_augment.n_freq_masks",
    "spec_aug_time_mask_param_w2v2": "model.spec_augment.time_mask_param",
    "spec_aug_n_time_masks_w2v2": "model.spec_augment.n_time_masks",
    "spec_aug_freq_mask_param_raw": "model.spec_augment.freq_mask_param",
    "spec_aug_n_freq_masks_raw": "model.spec_augment.n_freq_masks",
    "spec_aug_time_mask_param_raw": "model.spec_augment.time_mask_param",
    "spec_aug_n_time_masks_raw": "model.spec_augment.n_time_masks",
    # training block
    "num_epochs": "train.num_epochs",
    "batch_size": "train.batch_size",
    "seed": "train.seed",
    "learning_rate": "train.optimizer.lr",
    "weight_decay": "train.optimizer.weight_decay",
    "grad_clip_norm": "train.optimizer.grad_clip_norm",
    "database_path": "data.database_path",
    "protocols_path": "data.protocols_path",
    "track": "data.track",
    # top-level focal knobs (model_config_Model4.yaml:38-39)
    "focal_loss_alpha": "train.loss.focal_alpha",
    "focal_loss_gamma": "train.loss.focal_gamma",
}


def _set_dotted(exp: ExperimentConfig, dotted: str, value: Any) -> None:
    obj = exp
    parts = dotted.split(".")
    for q in parts[:-1]:
        obj = getattr(obj, q)
    setattr(obj, parts[-1], value)


def _repair_reference_yaml_text(text: str) -> str:
    """model_config_Maze5.yaml:23 reads ``filts: filts: [...]`` — a duplicated
    key token that is a YAML syntax error. Repair by dropping the stutter."""
    out = []
    for line in text.splitlines():
        stripped = line.lstrip()
        if stripped.startswith("filts: filts:"):
            line = line.replace("filts: filts:", "filts:", 1)
        out.append(line)
    return "\n".join(out)


def load_reference_yaml(path: str, base_model: str = None):
    """Ingest a literal ``07_Configuration_Files/model_config_*.yaml``.

    The reference never wired these files into training
    (``07_Configuration_Files/README.md:30-40``) — except main.py, which DOES
    read model_config_RawNet.yaml's ``model`` block (main.py:145-182). This
    loader honors the named contract anyway: every recognised key lands on the
    typed tree; unrecognised keys are returned for inspection instead of
    silently dropped.

    Returns ``(ExperimentConfig, ignored: dict)``. ``base_model``: registry
    name to start from (default: inferred — ``main`` for RawNet-style files
    with ``nb_samp``/``gru_node``, ``maze6`` for wav2vec2-style files).
    """
    from adfmsl.config.standardized import make_experiment

    with open(path) as fh:
        text = fh.read()
    d = yaml.safe_load(_repair_reference_yaml_text(text))
    if not isinstance(d, dict):
        raise ValueError(f"{path}: not a YAML mapping")

    flat: Dict[str, Any] = {}
    for block in ("model", "training"):
        sub = d.get(block)
        if isinstance(sub, dict):
            flat.update(sub)
    for k, v in d.items():
        if k not in ("model", "training"):
            flat[k] = v

    if base_model is None:
        base_model = "main" if ("gru_node" in flat or "nb_samp" in flat) else "maze6"
    exp = make_experiment(base_model)

    ignored: Dict[str, Any] = {}
    for k, v in flat.items():
        if k == "optimizer":               # top-level 'optimizer: Adam'
            exp.train.optimizer.name = str(v).strip().lower()
            continue
        if k == "loss":                    # training block 'loss: focal'
            exp.train.loss.name = ("focal_ce" if str(v).startswith("focal")
                                   else "weighted_ce")
            continue
        if k == "learning_rate_wav2vec2":  # differential LR -> backbone scale
            lr = flat.get("learning_rate", exp.train.optimizer.lr)
            exp.train.optimizer.backbone_lr_scale = float(v) / float(lr)
            continue
        if k == "wav2vec2_freeze_cnn":
            exp.model.wav2vec2.unfreeze_feature_extractor = not bool(v)
            continue
        if k == "wav2vec2_output_layers":
            layers = list(v) if isinstance(v, (list, tuple)) else [v]
            exp.model.wav2vec2.fusion_layers = (layers if len(layers) > 1
                                                else None)
            continue
        dotted = _REF_KEY_MAP.get(k)
        if dotted is None:
            ignored[k] = v
            continue
        _set_dotted(exp, dotted, v)
    # freeze is DERIVED in the reference (maze6.py:110-130): frozen unless some
    # transformer layers or the CNN extractor are explicitly unfrozen
    if "wav2vec2_unfrozen_transformers" in flat or "wav2vec2_freeze_cnn" in flat:
        exp.model.wav2vec2.freeze = (
            int(flat.get("wav2vec2_unfrozen_transformers", 0)) == 0
            and bool(flat.get("wav2vec2_freeze_cnn", True)))
    return exp, ignored
