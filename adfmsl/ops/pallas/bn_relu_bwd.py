"""Pallas BN(train)+ReLU backward — the VERDICT-r4 item-3 experiment.

Round 4's corrected block decomposition (docs/PERF.md "Block-level
decomposition") localised the b128 train-glue cost to the BACKWARD of the
BN->relu stages: ~8.7 ms/block0 over the two BNs, against an ideal ~3-pass
floor of ~5 ms. Two XLA-level fusions (ops/bn_act.py custom-VJP affine fold,
ops/dropout.py regenerate-in-backward) measured as washes, leaving one
untested hypothesis: a hand-scheduled Pallas backward that fuses the stat
cotangent reductions, the relu mask recompute, and the dx recombination into
exactly two passes over the saved bf16 activations.

This module IS that kernel. ``bn_relu_train(x, gamma, beta)`` is a drop-in
train-mode BatchNorm(momentum handled by caller)+ReLU with a custom VJP whose
backward runs two pallas_call passes over (rows, C) tiles:

  pass 1 (reduce):  dy = dz * mask(x̂);  partial dgamma += dy*x̂, dbeta += dy
  pass 2 (dx):      dx = (gamma*rstd/N) * (N*dy - dbeta - x̂*dgamma)

x̂ and the relu mask are recomputed from the saved bf16 x (no f32 residuals).
Reference capability: torch BatchNorm1d train-mode backward semantics
(maze4.py:105-147 block glue). Numerics: reductions in f32; dx emitted at
x.dtype.

Measured on v5e (round 5, block0 b128 shapes (128,21450,128) bf16,
BN->relu->conv fwd+vjp serial-scan timing — see docs/PERF.md round-5 section
for the verdict recorded alongside the other fusion attempts).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_ROWS = 2048        # row-tile (8-aligned); C rides the 128 lanes


def _reduce_kernel(x_ref, dz_ref, stats_ref, partial_ref, *, rows_total):
    """Per-tile partial (dgamma, dbeta) with in-kernel x̂/mask recompute.

    stats_ref: (8, C) f32 — rows 0..3 = gamma, beta, mu, rstd (replicated pad
    to the 8-row sublane tile). partial_ref: (8, C) f32 block per tile — row 0
    dgamma, row 1 dbeta (rows 2-7 padding)."""
    i = pl.program_id(0)
    rows = x_ref.shape[0]
    gamma = stats_ref[0, :]
    beta = stats_ref[1, :]
    mu = stats_ref[2, :]
    rstd = stats_ref[3, :]

    x = x_ref[...].astype(jnp.float32)
    dz = dz_ref[...].astype(jnp.float32)
    # rows past the real tail are zero-padded by the caller; x̂ there is
    # -mu*rstd which feeds a garbage dy — mask them off explicitly
    r0 = i * rows
    valid = (r0 + jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)) < rows_total
    xhat = (x - mu[None, :]) * rstd[None, :]
    y = gamma[None, :] * xhat + beta[None, :]
    dy = jnp.where((y > 0) & valid, dz, 0.0)
    partial_ref[0, :] = jnp.sum(dy * xhat, axis=0)
    partial_ref[1, :] = jnp.sum(dy, axis=0)
    partial_ref[2:, :] = jnp.zeros_like(partial_ref[2:, :])


def _dx_kernel(x_ref, dz_ref, stats_ref, dx_ref, *, n_valid, rows_total):
    """dx = (gamma*rstd/N) * (N*dy - dbeta - x̂*dgamma).

    stats_ref rows: 0 gamma, 1 beta, 2 mu, 3 rstd, 4 dgamma, 5 dbeta."""
    i = pl.program_id(0)
    rows = x_ref.shape[0]
    gamma = stats_ref[0, :]
    beta = stats_ref[1, :]
    mu = stats_ref[2, :]
    rstd = stats_ref[3, :]
    dgamma = stats_ref[4, :]
    dbeta = stats_ref[5, :]

    x = x_ref[...].astype(jnp.float32)
    dz = dz_ref[...].astype(jnp.float32)
    r0 = i * rows
    valid = (r0 + jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)) < rows_total
    xhat = (x - mu[None, :]) * rstd[None, :]
    y = gamma[None, :] * xhat + beta[None, :]
    dy = jnp.where((y > 0) & valid, dz, 0.0)
    scale = (gamma * rstd) * (1.0 / n_valid)
    dx = scale[None, :] * (n_valid * dy - dbeta[None, :] - xhat * dgamma[None, :])
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _pad_rows(a, rows):
    n = a.shape[0]
    pad = (-n) % rows
    if pad:
        a = jnp.pad(a, ((0, pad), (0, 0)))
    return a


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_relu_train(x, gamma, beta, eps: float = 1e-5, interpret: bool = False):
    """relu(batchnorm_train(x)) over (B, T, C); stats over (B, T)."""
    y, _ = _fwd(x, gamma, beta, eps, interpret)
    return y


def _fwd(x, gamma, beta, eps, interpret):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(0, 1))
    var = jnp.mean(jnp.square(xf), axis=(0, 1)) - jnp.square(mu)
    rstd = jax.lax.rsqrt(var + eps)
    y = jnp.maximum(gamma * (xf - mu) * rstd + beta, 0.0).astype(x.dtype)
    return y, (x, gamma, beta, mu, rstd)


def _bwd(eps, interpret, res, dz):
    x, gamma, beta, mu, rstd = res
    B, T, C = x.shape
    n = B * T
    x2 = _pad_rows(x.reshape(n, C), _ROWS)
    dz2 = _pad_rows(dz.reshape(n, C).astype(x.dtype), _ROWS)
    tiles = x2.shape[0] // _ROWS

    stats = jnp.zeros((8, C), jnp.float32)
    stats = stats.at[0].set(gamma.astype(jnp.float32))
    stats = stats.at[1].set(beta.astype(jnp.float32))
    stats = stats.at[2].set(mu)
    stats = stats.at[3].set(rstd)

    partials = pl.pallas_call(
        functools.partial(_reduce_kernel, rows_total=n),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((_ROWS, C), lambda i: (i, 0)),
            pl.BlockSpec((_ROWS, C), lambda i: (i, 0)),
            pl.BlockSpec((8, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((tiles * 8, C), jnp.float32),
        interpret=interpret,
    )(x2, dz2, stats)
    part = partials.reshape(tiles, 8, C)
    dgamma = jnp.sum(part[:, 0, :], axis=0)
    dbeta = jnp.sum(part[:, 1, :], axis=0)

    stats2 = stats.at[4].set(dgamma).at[5].set(dbeta)
    dx2 = pl.pallas_call(
        functools.partial(_dx_kernel, n_valid=float(n), rows_total=n),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((_ROWS, C), lambda i: (i, 0)),
            pl.BlockSpec((_ROWS, C), lambda i: (i, 0)),
            pl.BlockSpec((8, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_ROWS, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=interpret,
    )(x2, dz2, stats2)
    dx = dx2[:n].reshape(B, T, C)
    return dx, dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype)


bn_relu_train.defvjp(lambda x, g, b, eps, interp: _fwd(x, g, b, eps, interp),
                     _bwd)
