"""Recompute-from-key dropout: eliminates the mask's HBM residual.

Plain autodiff of ``flax nn.Dropout`` saves the boolean keep-mask as a
residual — one full (B, T, C) HBM write in the forward and read in the
backward, per dropout site. The round-4 maze5 train ablation measured the
surviving dropout cost at ~3.4 ms/step (b16) after bit generation moved to
the TPU's hardware RngBitGenerator (train/steps.py:fast_bits_key).

``recompute_dropout`` applies the identical mask through a ``custom_vjp``
whose backward REGENERATES the bernoulli draw from the saved PRNG key (a
few words) instead of loading the saved mask. Bit-identical to
``nn.Dropout``: same ``random.bernoulli(rng, keep_prob, shape)`` draw on the
same ``make_rng('dropout')`` stream, same ``x / keep_prob`` scaling — so the
swap changes no training trajectory, only the autodiff residual set.

Reference: the torch blocks use nn.Dropout(0.3)/0.2 (maze4.py:105-147,
maze2.py:40-68); recompute-in-backward is the TPU-native formulation (mask
regeneration rides the hardware RNG, cheaper than the HBM round trip).
"""
from __future__ import annotations

from functools import lru_cache

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def _dropout_fn(rate: float):
    keep_prob = 1.0 - rate

    def _mask(key, shape):
        return jax.random.bernoulli(key, p=keep_prob, shape=shape)

    def prim(x, key):
        m = _mask(key, x.shape)
        return jax.lax.select(m, x / keep_prob, jnp.zeros_like(x))

    f = jax.custom_vjp(prim)

    def fwd(x, key):
        return prim(x, key), key

    def bwd(key, dy):
        m = _mask(key, dy.shape)
        dx = jax.lax.select(m, dy / keep_prob, jnp.zeros_like(dy))
        # PRNG keys live in a float0 tangent space
        dkey = np.zeros(jnp.shape(key), dtype=jax.dtypes.float0)
        return dx, dkey

    f.defvjp(fwd, bwd)
    return f


def recompute_dropout(x, key, rate: float):
    """``nn.Dropout(rate)``-identical masking with a regenerate-in-backward
    VJP. ``key`` is the stream ``nn.Dropout`` would have drawn
    (``make_rng('dropout')``)."""
    if rate == 0.0:
        return x
    if rate == 1.0:
        return jnp.zeros_like(x)
    return _dropout_fn(float(rate))(x, key)


class RDropout(nn.Module):
    """Drop-in for ``nn.Dropout(rate)`` (no broadcast_dims) that regenerates
    the mask in the backward pass instead of saving it. Draws from the same
    'dropout' RNG collection, so outputs are bit-identical to the flax
    module's."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        return recompute_dropout(x, self.make_rng("dropout"), self.rate)
