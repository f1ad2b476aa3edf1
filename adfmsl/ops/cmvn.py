"""Per-utterance cepstral mean/variance normalisation (on-device)."""
from __future__ import annotations

import jax.numpy as jnp


def cmvn(feats: jnp.ndarray, axis: int = -2, eps: float = 1e-8,
         var_norm: bool = True) -> jnp.ndarray:
    """Normalise (..., frames, coeffs) over the frame axis."""
    mean = jnp.mean(feats, axis=axis, keepdims=True)
    out = feats - mean
    if var_norm:
        std = jnp.sqrt(jnp.var(feats, axis=axis, keepdims=True) + eps)
        out = out / std
    return out
