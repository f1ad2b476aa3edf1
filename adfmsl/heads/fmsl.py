"""FMSL geometric classification head (the reference's core novel component).

Re-design of ``Thesis/06_Utilities/fmsl_advanced.py`` (AdvancedFMSLSystem, :103-359):
projection MLP -> optional latent-space augmentation -> L2 hypersphere normalisation,
with AM-Softmax angular-margin logits against a normalised class-weight matrix and
cosine similarities to learnable spoof prototypes.

Contract fix (deliberate, documented — SURVEY.md 2.3 "latent defects"): the reference's
forward returns 'logits' only when ``use_integrated_loss`` and NEVER returns 'loss',
so Mode B/C wrappers KeyError at train time. Here the head ALWAYS returns
{'logits', 'loss', 'embeddings', 'prototype_similarity'}; the three integration modes
(refine / replace / integrated) choose how the wrapping model uses them.

Label polarity: canonical bonafide=1 / spoof=0; the prototype-matching loss pulls
spoof samples (label 0) toward their nearest prototype, matching the reference's
'0 is spoof' assumption (fmsl_advanced.py:346).
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from adfmsl.config.base import FMSLConfig
from adfmsl.heads.losses import cross_entropy, masked_mean


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    # rsqrt(sum(x^2)+eps) instead of x/max(norm, eps): the norm's VJP at an
    # exactly-zero vector is NaN even though the forward is guarded (a dead-ReLU
    # projection row would poison the whole batch gradient via the mean loss)
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


def am_softmax_logits(embeddings: jnp.ndarray, weight: jnp.ndarray, s: float, m: float,
                      labels: Optional[jnp.ndarray] = None,
                      train: bool = False) -> jnp.ndarray:
    """cos(theta) against normalised class weights; additive-ANGLE margin on the
    target class during training: cos(theta+m) = cos cos m - sin sin m
    (fmsl_advanced.py:190-237), scaled by s."""
    cosine = embeddings @ l2_normalize(weight, axis=-1).T
    if train and labels is not None:
        # floor keeps sqrt' finite at |cos|=1 — AM-softmax actively drives the
        # target cosine toward 1, and an exactly-aligned embedding would emit
        # inf/NaN gradients that leak through one_hot*phi into every class
        sine = jnp.sqrt(jnp.clip(1.0 - cosine**2, min=1e-8, max=1.0))
        phi = cosine * math.cos(m) - sine * math.sin(m)
        one_hot = jax.nn.one_hot(labels, cosine.shape[-1], dtype=cosine.dtype)
        cosine = one_hot * phi + (1.0 - one_hot) * cosine
    return s * cosine


class FMSLHead(nn.Module):
    """input (B, D) features -> dict. Parameters mirror fmsl_advanced.py:103-150:
    projection Linear(D,D)+BN+ReLU+Dropout(0.1), Xavier prototypes (P, D) and class
    weights (C, D), learnable scalar temperature."""

    cfg: FMSLConfig
    input_dim: int
    n_classes: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, labels: Optional[jnp.ndarray] = None,
                 train: bool = False, mask: Optional[jnp.ndarray] = None):
        d = self.input_dim
        h = nn.Dense(d, name="proj")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="proj_bn")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.cfg.proj_dropout, deterministic=not train)(h)

        if self.cfg.enable_lsa and train:
            noise = jax.random.normal(self.make_rng("lsa"), h.shape, h.dtype)
            h = h + self.cfg.lsa_strength * noise

        emb = l2_normalize(h)

        prototypes = self.param(
            "prototypes", nn.initializers.xavier_uniform(),
            (self.cfg.n_prototypes, d))
        weight = self.param(
            "weight", nn.initializers.xavier_uniform(), (self.n_classes, d))
        temperature = self.param("temperature", nn.initializers.ones, ())

        proto_sim = emb @ l2_normalize(prototypes, axis=-1).T
        proto_sim = proto_sim / jnp.maximum(temperature, 0.01)

        logits = am_softmax_logits(emb, weight, self.cfg.s, self.cfg.m, labels, train)

        out = {
            "logits": logits,
            "embeddings": emb,
            "prototype_similarity": proto_sim,
        }
        if labels is not None:
            ce = cross_entropy(logits, labels)
            # prototype-matching: pull each SPOOF sample toward its best prototype
            # (fmsl_advanced.py:320-359; weight 0.1)
            best = jnp.max(proto_sim, axis=-1)
            spoof = (labels == 0).astype(logits.dtype)
            if mask is not None:
                spoof = spoof * mask.astype(logits.dtype)
            # exactly fmsl_advanced.py:346-353: -mean over spoof of the best
            # prototype similarity (0 when the batch has no spoof — the +1e-8
            # denominator makes the single formula cover that branch)
            proto_loss = -jnp.sum(best * spoof) / (jnp.sum(spoof) + 1e-8)
            out["ce_loss"] = masked_mean(ce, mask)
            out["proto_loss"] = proto_loss
            # Mode B consumers take ce_loss (reference applies external CE and never
            # calls compute_fmsl_loss); Mode C takes the integrated sum.
            out["loss"] = out["ce_loss"] + self.cfg.prototype_loss_weight * proto_loss
        return out
