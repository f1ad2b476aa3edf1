"""Optax optimizer/scheduler factories.

Replaces the reference's per-file optimizer code: Adam (main.py:187), AdamW with
differential LR groups for wav2vec2 params (maze6.py:666-678, maze3.py:283-324), SGD
option (maze3.py:283), global-norm clipping to grad_clip_norm (maze2_fmsl_
standardized.py:535-546), and the scheduler factory (CosineAnnealingLR / StepLR /
ReduceLROnPlateau / lambda-warmup, maze3.py:327-374, maze6.py:691-694).

Freezing is expressed here too: ``frozen`` label-fn routes Wav2Vec2 params to
``optax.set_to_zero`` when cfg.wav2vec2.freeze (optimizer-level guarantee on top of
the model's stop_gradient), and partial unfreezing (maze6's last-N encoder layers)
routes only those layers to the trainable group.
"""
from __future__ import annotations

from typing import Callable, Optional

import optax

from adfmsl.config.base import ExperimentConfig, OptimizerConfig


def make_schedule(cfg: OptimizerConfig, steps_per_epoch: int, num_epochs: int):
    total = max(steps_per_epoch * num_epochs, 1)
    if cfg.scheduler == "constant":
        return optax.constant_schedule(cfg.lr)
    if cfg.scheduler == "cosine":
        # CosineAnnealingLR(T_max=num_epochs, eta_min=min_lr) analog
        # (maze6.py:691-694, eta_min=args.min_lr=1e-7). Decays per STEP (smooth)
        # rather than torch's per-epoch staircase — same endpoints, no recompile.
        alpha = (cfg.min_lr / cfg.lr) if cfg.lr else 0.0
        return optax.cosine_decay_schedule(cfg.lr, decay_steps=total, alpha=alpha)
    if cfg.scheduler == "step":
        # StepLR(step_size, gamma) analog
        bounds = {
            steps_per_epoch * cfg.step_size * (i + 1): cfg.step_gamma
            for i in range(max(num_epochs // max(cfg.step_size, 1), 1))
        }
        return optax.piecewise_constant_schedule(cfg.lr, bounds)
    if cfg.scheduler == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.lr, warmup_steps=max(cfg.warmup_steps, 1), decay_steps=total)
    if cfg.scheduler == "plateau":
        # ReduceLROnPlateau analog: constant base LR; the epoch loop consults a
        # PlateauTracker and rewrites the plateau-scale leaf in opt_state (see
        # _plateau_scale / set_plateau_scale) — no recompile on LR drops.
        return optax.constant_schedule(cfg.lr)
    raise ValueError(f"unknown scheduler {cfg.scheduler!r}")


def _plateau_scale() -> optax.GradientTransformation:
    """Final update-scaling stage whose factor is a device scalar in opt_state.

    Scaling the post-Adam UPDATES is exactly an LR multiplier; keeping the factor
    as state (not a closure constant) means the Trainer can drop the LR between
    epochs without changing the compiled step (maze3.py:327-374's
    ReduceLROnPlateau, TPU-native form)."""
    import jax
    import jax.numpy as jnp

    def init(_params):
        return jnp.asarray(1.0, dtype=jnp.float32)

    def update(updates, state, params=None):
        del params
        return jax.tree_util.tree_map(lambda u: u * state, updates), state

    return optax.GradientTransformation(init, update)


def set_plateau_scale(opt_state, scale: float):
    """Rewrite the plateau-scale leaf (the chain's last stage state)."""
    import jax.numpy as jnp

    return tuple(opt_state[:-1]) + (jnp.asarray(scale, dtype=jnp.float32),)


def get_plateau_scale(opt_state) -> float:
    return float(opt_state[-1])


def _base_optimizer(cfg: OptimizerConfig, schedule) -> optax.GradientTransformation:
    if cfg.name == "adam":
        # torch.optim.Adam(weight_decay=wd) is COUPLED L2: wd*p is added to the
        # GRADIENT before the moment updates (main.py:187, maze2.py:437,
        # maze3.py:317 — all pass wd=1e-4). optax.adam has no decay; build the
        # torch-equivalent chain explicitly.
        stages = []
        if cfg.weight_decay:
            stages.append(optax.add_decayed_weights(cfg.weight_decay))
        stages += [optax.scale_by_adam(), optax.scale_by_learning_rate(schedule)]
        return optax.chain(*stages)
    if cfg.name == "adamw":
        # torch.optim.AdamW: DEcoupled decay, applied with the group lr —
        # optax.adamw matches (maze4.py:482 etc.)
        return optax.adamw(schedule, weight_decay=cfg.weight_decay)
    if cfg.name == "sgd":
        # torch SGD weight_decay is likewise coupled L2 (maze3.py:320)
        stages = []
        if cfg.weight_decay:
            stages.append(optax.add_decayed_weights(cfg.weight_decay))
        stages.append(optax.sgd(schedule, momentum=cfg.momentum))
        return optax.chain(*stages)
    raise ValueError(f"unknown optimizer {cfg.name!r}")


def _param_label_fn(exp: ExperimentConfig,
                    unfrozen_layers: Optional[set] = None) -> Callable:
    """Label params: 'frozen' (zeroed), 'backbone' (scaled LR), 'main'.

    ``unfrozen_layers`` (the last-N encoder layer key names) is derived from the
    actual param tree in ``param_labels`` so the numbering is correct for any
    encoder depth; when None, falls back to output_dim-based 12/24-layer numbering.
    """
    w = exp.model.wav2vec2
    if unfrozen_layers is None:
        unfrozen_layers = set()
        if w.unfreeze_last_n > 0:
            # maze6-style: the LAST N transformer layers train at backbone LR
            n_layers = 24 if w.output_dim >= 1024 else 12
            unfrozen_layers = {f"layers_{i}" for i in
                               range(n_layers - w.unfreeze_last_n, n_layers)}

    def label(path, _leaf):
        keys = [getattr(p, "key", None) for p in path]
        if "wav2vec2" not in keys:
            return "main"
        if unfrozen_layers:
            # partial-unfreezing mode (maze6.py:103-165): ONLY the last-N encoder
            # layers (+ optionally the conv feature extractor) train, at backbone LR
            if set(keys) & unfrozen_layers:
                return "backbone"
            if w.unfreeze_feature_extractor and "feature_extractor" in keys:
                return "backbone"
            return "frozen"
        return "frozen" if w.freeze else "backbone"

    return label


def param_labels(exp: ExperimentConfig, params):
    """Build the multi_transform label tree from the REAL param tree: the last-N
    unfrozen encoder layers are picked from the layer indices actually present
    (robust to any encoder depth — tiny test archs included)."""
    import jax

    w = exp.model.wav2vec2
    unfrozen: Optional[set] = None
    if w.unfreeze_last_n > 0:
        idxs = set()

        def collect(path, _leaf):
            keys = [getattr(p, "key", None) for p in path]
            if "wav2vec2" in keys:
                for k in keys:
                    if isinstance(k, str) and k.startswith("layers_"):
                        try:
                            idxs.add(int(k.split("_", 1)[1]))
                        except ValueError:
                            pass
            return 0

        jax.tree_util.tree_map_with_path(collect, params)
        unfrozen = {f"layers_{i}" for i in sorted(idxs)[-w.unfreeze_last_n:]}
    label_fn = _param_label_fn(exp, unfrozen)
    return jax.tree_util.tree_map_with_path(label_fn, params)


def make_optimizer(exp: ExperimentConfig, steps_per_epoch: int):
    """Full optax chain: clip-by-global-norm -> {frozen: zero, backbone: scaled-LR,
    main: base}. Returns (tx, schedule)."""
    ocfg = exp.train.optimizer
    schedule = make_schedule(ocfg, steps_per_epoch, exp.train.num_epochs)

    def scaled(s):
        return lambda step: s(step) * ocfg.backbone_lr_scale

    # main/maze2/maze3 and main_fmsl never clip gradients (their train_epochs
    # have no clip_grad_norm_ call); grad_clip_norm<=0 disables the stage so the
    # chain matches the reference construction per model
    stages = [
        optax.clip_by_global_norm(ocfg.grad_clip_norm)
        if ocfg.grad_clip_norm and ocfg.grad_clip_norm > 0 else optax.identity(),
        optax.multi_transform(
            {
                "main": _base_optimizer(ocfg, schedule),
                "backbone": _base_optimizer(ocfg, scaled(schedule)),
                "frozen": optax.set_to_zero(),
            },
            lambda params: param_labels(exp, params),
        ),
    ]
    if ocfg.scheduler == "plateau":
        stages.append(_plateau_scale())
    return optax.chain(*stages), schedule


class PlateauTracker:
    """ReduceLROnPlateau analog (maze3.py:327-374): the epoch loop consults this and
    scales an LR multiplier that the schedule closure reads."""

    def __init__(self, patience: int = 2, factor: float = 0.5, mode: str = "min",
                 min_delta: float = 0.0):
        self.patience, self.factor, self.mode = patience, factor, mode
        self.min_delta = min_delta
        self.best: Optional[float] = None
        self.bad = 0
        self.scale = 1.0

    def update(self, value: float) -> float:
        better = (self.best is None
                  or (self.mode == "min" and value < self.best - self.min_delta)
                  or (self.mode == "max" and value > self.best + self.min_delta))
        if better:
            self.best, self.bad = value, 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.scale *= self.factor
                self.bad = 0
        return self.scale
