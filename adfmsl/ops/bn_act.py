"""Fused train-mode BatchNorm + activation (round-4 VERDICT item 1).

The train step's BN->act glue is where the sinc/LFCC zoo's train MFU floor
lived: plain autodiff of ``flax BatchNorm -> act`` saves the pre-activation
``z = x*a + b`` as a residual — a full (B, T, C) HBM write in the forward and
read in the backward (263 MB each at maze5 block0, b16) — and applies the
normalize in the trunk dtype. This module:

- computes batch statistics in plain XLA (one fused two-accumulator reduction
  pass; their VJP contributes the standard BN backward terms automatically);
- folds (mean, var, scale, bias) into per-channel f32 affines a = scale*rstd,
  b = bias - mean*a (the train-time analog of the eval folding in
  ops/pallas/resblock_fused.py);
- applies ``act(x*a + b)`` through a custom_vjp whose backward RECOMPUTES z
  from x (already alive for the conv's backward-filter) instead of loading a
  saved residual, and emits dx plus the (C,) reductions for da/db in one
  multi-output fusion.

Matches flax ``nn.BatchNorm(momentum, epsilon)`` semantics (biased variance,
running = m*running + (1-m)*batch, f32 stats) with the normalize applied as
f32 affines on an f32 upcast before narrowing to the trunk dtype — the same
rounding contract as the folded eval path (resblock_eval_xla).

Reference: the torch blocks normalize via nn.BatchNorm1d (maze4.py:105-147);
this is the TPU-native training formulation, not a translation.
"""
from __future__ import annotations

from functools import lru_cache

import flax.linen as nn
import jax
import jax.numpy as jnp

_SELU_LAMBDA = 1.0507009873554805
_SELU_ALPHA = 1.6732632423543772


def _act_fwd(z, act):
    if act == "relu":
        return jnp.maximum(z, 0.0)
    if act == "leaky":
        return jnp.maximum(z, 0.3 * z)
    if act == "selu":
        return _SELU_LAMBDA * jnp.where(
            z > 0, z, _SELU_ALPHA * jnp.expm1(z))
    raise ValueError(f"unknown act {act!r}")


def _act_grad(z, act):
    if act == "relu":
        return (z > 0).astype(z.dtype)
    if act == "leaky":
        return jnp.where(z > 0, 1.0, 0.3).astype(z.dtype)
    if act == "selu":
        return _SELU_LAMBDA * jnp.where(
            z > 0, 1.0, _SELU_ALPHA * jnp.exp(z)).astype(z.dtype)
    raise ValueError(f"unknown act {act!r}")


@lru_cache(maxsize=8)
def _norm_act(act: str):
    """y = act(x * a + b) with a hand-written VJP. x: (..., C) any float dtype;
    a, b: (C,) f32. The affine+act runs on an f32 upcast and narrows to
    x.dtype; the backward recomputes z instead of saving it."""

    def prim(x, a, b):
        z = x.astype(jnp.float32) * a + b
        return _act_fwd(z, act).astype(x.dtype)

    f = jax.custom_vjp(prim)

    def fwd(x, a, b):
        return prim(x, a, b), (x, a, b)

    def bwd(res, dy):
        x, a, b = res
        xf = x.astype(jnp.float32)
        z = xf * a + b                               # recomputed, fuses
        dz = dy.astype(jnp.float32) * _act_grad(z, act)
        red = tuple(range(x.ndim - 1))
        dx = (dz * a).astype(x.dtype)
        da = jnp.sum(dz * xf, axis=red)              # (C,)
        db = jnp.sum(dz, axis=red)                   # (C,)
        return dx, da, db

    f.defvjp(fwd, bwd)
    return f


def norm_act(x, a, b, act: str = "relu"):
    return _norm_act(act)(x, a.astype(jnp.float32), b.astype(jnp.float32))


class BNAct(nn.Module):
    """Drop-in replacement for ``nn.BatchNorm(momentum=0.9) -> act`` on
    (B, T, C) trunks. Parameter/variable tree is byte-compatible with flax
    BatchNorm (params scale/bias, batch_stats mean/var), so checkpoints are
    interchangeable with the plain path."""

    channels: int
    act: str = "relu"
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.channels,))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.channels,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.channels,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.channels,)))
        if train:
            red = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=red)
            mean2 = jnp.mean(xf * xf, axis=red)      # fuses with the mean pass
            var = mean2 - mean * mean
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (m * ra_mean.value
                                 + (1 - m) * jax.lax.stop_gradient(mean))
                ra_var.value = (m * ra_var.value
                                + (1 - m) * jax.lax.stop_gradient(var))
        else:
            mean, var = ra_mean.value, ra_var.value
        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        y = norm_act(x if x.dtype == self.dtype else x.astype(self.dtype),
                     a, b, self.act)
        return y
