"""SpecAugment: frequency/time masking on (B, C, T) feature maps, on-device.

Two mask-sampling semantics exist in the reference and are both supported:
- 'torchaudio' (maze2.py:134-141 via torchaudio transforms): width v ~ U[0, param),
  start ~ U[0, size - v); zeros [start, start+v).
- 'reference_handrolled' (maze4_fmsl_standardized.py:193-214): start ~ U[0, param),
  end ~ U[start, size); zeros [start, end) — masks can span nearly the whole axis.

Unlike both reference variants (which draw ONE mask per call shared across the batch),
masks here are drawn per-sample and fully vectorized — no Python loop, no in-place
mutation; under jit this is a handful of VPU compares/selects.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _mask_axis(key, x, axis_size: int, param: int, n_masks: int, semantics: str,
               axis: int):
    """Return multiplicative {0,1} mask of shape (B, axis_size) folded over n_masks."""
    b = x.shape[0]
    keep = jnp.ones((b, axis_size), dtype=x.dtype)
    idx = jnp.arange(axis_size)[None, :]
    for i in range(n_masks):
        k1, k2, key = jax.random.split(jax.random.fold_in(key, i), 3)
        if semantics == "torchaudio":
            # clamp the width to the axis: param > axis_size would make
            # (axis_size - v + 1) negative and start go negative, silently
            # skewing the mask distribution (torchaudio rejects this config)
            v = jax.random.randint(k1, (b, 1), 0, max(min(param, axis_size), 1))
            start = jnp.floor(
                jax.random.uniform(k2, (b, 1)) * (axis_size - v + 1)
            ).astype(jnp.int32)
            end = start + v
        elif semantics == "reference_handrolled":
            start = jax.random.randint(k1, (b, 1), 0, max(param, 1))
            # end ~ U[start, axis_size): sample offset in [0, axis_size-start)
            u = jax.random.uniform(k2, (b, 1))
            end = start + jnp.floor(u * (axis_size - start)).astype(jnp.int32)
        else:
            raise ValueError(f"unknown SpecAugment semantics {semantics!r}")
        keep = keep * jnp.where((idx >= start) & (idx < end), 0.0, 1.0).astype(x.dtype)
    return keep


def spec_augment(x: jnp.ndarray, key: jax.Array, freq_mask_param: int = 10,
                 time_mask_param: int = 10, n_freq_masks: int = 2,
                 n_time_masks: int = 2, semantics: str = "torchaudio",
                 channels_last: bool = False) -> jnp.ndarray:
    """Mask (B, C, T) — or (B, T, C) with ``channels_last=True``. C is the
    frequency/channel axis, T is time. The mask draws depend only on the axis
    SIZES, so both layouts produce bit-identical augmentation for the same key
    — channels_last lets (B, T, C) trunks skip the two full-tensor transposes
    (and their backward twins) that a layout round-trip would cost."""
    kf, kt = jax.random.split(key)
    if channels_last:
        _, t, c = x.shape
    else:
        _, c, t = x.shape
    fmask = _mask_axis(kf, x, c, freq_mask_param, n_freq_masks, semantics, 1)
    tmask = _mask_axis(kt, x, t, time_mask_param, n_time_masks, semantics, 2)
    if channels_last:
        return x * fmask[:, None, :] * tmask[:, :, None]
    return x * fmask[:, :, None] * tmask[:, None, :]
