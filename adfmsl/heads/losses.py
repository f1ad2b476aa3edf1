"""Classification losses.

Reference variants reproduced (SURVEY.md 2.2):
- weighted CE: weights [0.1,0.9] (main.py:66) / [0.3,0.7] (maze6.py:685)
- focal CE form: alpha*(1-pt)^gamma * CE, alpha=0.25 gamma=2.0 (maze2.py:195-207)
- focal BCE form: alpha=1 gamma=2 over sigmoid probs (maze3.py:79-98)
All take raw logits (B, C) and integer labels (B,), return per-example losses; an
optional validity mask supports padded batches. Reduction happens in the caller so
psum-based cross-device averaging stays correct.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def cross_entropy(logits, labels, class_weights=None):
    ce = _ce(logits, labels)
    if class_weights is not None:
        w = jnp.asarray(class_weights, dtype=logits.dtype)
        ce = ce * jnp.take(w, labels)
    return ce


def focal_ce(logits, labels, alpha: float = 0.25, gamma: float = 2.0):
    """CE-form focal loss (maze2.py:195-207): alpha*(1-exp(-ce))^gamma * ce."""
    ce = _ce(logits, labels)
    pt = jnp.exp(-ce)
    return alpha * (1.0 - pt) ** gamma * ce


def focal_bce(logits, labels, alpha: float = 1.0, gamma: float = 2.0):
    """BCE-form focal loss (maze3.py:79-98): binary on the class-1 logit margin."""
    z = logits[:, 1] - logits[:, 0]
    y = labels.astype(logits.dtype)
    p = jax.nn.sigmoid(z)
    pt = y * p + (1.0 - y) * (1.0 - p)
    bce = -(y * jnp.log(jnp.clip(p, 1e-7, 1.0)) +
            (1 - y) * jnp.log(jnp.clip(1 - p, 1e-7, 1.0)))
    return alpha * (1.0 - pt) ** gamma * bce


def masked_mean(values: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(values)
    m = mask.astype(values.dtype)
    return jnp.sum(values * m) / jnp.maximum(jnp.sum(m), 1.0)


def loss_parts(name: str, logits, labels, *, class_weights=None,
               focal_alpha=0.25, focal_gamma=2.0, mask=None):
    """(numerator_sum, denominator_sum) such that loss == num/denom.

    Separating the reduction lets a data-parallel shard psum the two sums and
    recover the EXACT single-device loss (ratio of global sums), where a
    mean-of-per-shard-ratios would drift whenever shards carry different label
    mixes (weighted CE divides by the shard's target-weight sum)."""
    if name == "weighted_ce" and class_weights is not None:
        # torch nn.CrossEntropyLoss(weight=w, reduction='mean') divides by the
        # SUM OF TARGET WEIGHTS, not the batch size: sum(w_yi*ce_i)/sum(w_yi)
        # (main.py:66-67's criterion). Dividing by N instead rescales the loss
        # ~2x on a balanced batch with [0.1,0.9] — a silent lr change.
        w = jnp.take(jnp.asarray(class_weights, dtype=logits.dtype), labels)
        per = _ce(logits, labels) * w
        denom_w = w
    elif name in ("ce", "weighted_ce"):
        per = cross_entropy(logits, labels, None)
        denom_w = jnp.ones_like(per)
    elif name == "focal_ce":
        per = focal_ce(logits, labels, focal_alpha, focal_gamma)
        denom_w = jnp.ones_like(per)
    elif name == "focal_bce":
        per = focal_bce(logits, labels, focal_alpha, focal_gamma)
        denom_w = jnp.ones_like(per)
    elif name == "fmsl":
        # FMSL models normally return their own loss; reaching here means the model
        # didn't (e.g. labels routed but head bypassed) — fall back to plain CE
        # rather than silently training on nothing.
        per = cross_entropy(logits, labels)
        denom_w = jnp.ones_like(per)
    else:
        raise ValueError(f"unknown loss {name!r}")
    m = jnp.ones_like(per) if mask is None else mask.astype(per.dtype)
    return jnp.sum(per * m), jnp.sum(denom_w * m)


def compute_loss(name: str, logits, labels, *, class_weights=None,
                 focal_alpha=0.25, focal_gamma=2.0, mask=None):
    """Dispatch by LossConfig.name; returns a scalar."""
    num, denom = loss_parts(name, logits, labels, class_weights=class_weights,
                            focal_alpha=focal_alpha, focal_gamma=focal_gamma,
                            mask=mask)
    return num / jnp.maximum(denom, 1e-8)
