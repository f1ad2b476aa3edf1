"""Waveform-level augmentation, on-device.

Rebuild of maze3's train-loop augmentation (maze3.py:577-670: random additive noise
clips + RIR reverb convolution, config-gated, default off). The reference does this on
CPU per sample; here both transforms are jnp ops that run inside the jitted train step
(keyed by the 'augment' PRNG stream) so augmentation costs no host round trips.

RIR convolution uses FFT (XLA-lowered); additive noise mixes at a random SNR drawn
per sample.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def add_noise_snr(x: jnp.ndarray, noise: jnp.ndarray, key: jax.Array,
                  snr_db_min: float = 5.0, snr_db_max: float = 20.0) -> jnp.ndarray:
    """Mix noise into x at a per-sample random SNR.

    x: (B, T); noise: (N, T) bank of noise clips (tiled/cropped to T beforehand).
    A random clip and a random SNR in [min, max] dB are drawn per batch row.
    """
    b, t = x.shape
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (b,), 0, noise.shape[0])
    n = noise[idx]                                           # (B, T)
    snr_db = jax.random.uniform(k2, (b, 1), minval=snr_db_min, maxval=snr_db_max)
    px = jnp.mean(x * x, axis=-1, keepdims=True)
    pn = jnp.mean(n * n, axis=-1, keepdims=True)
    scale = jnp.sqrt(px / jnp.maximum(pn, 1e-12) / (10.0 ** (snr_db / 10.0)))
    return x + scale * n


def rir_reverb(x: jnp.ndarray, rir: jnp.ndarray) -> jnp.ndarray:
    """Convolve each waveform with a room impulse response (same-length output,
    peak-aligned so direct sound stays at its original position).

    x: (B, T); rir: (R,) or (B, R)."""
    t = x.shape[-1]
    if rir.ndim == 1:
        rir = jnp.broadcast_to(rir[None, :], (x.shape[0], rir.shape[0]))
    r = rir.shape[-1]
    # peak-align: measured RIRs carry pre-delay (peak at k>0) which would shift
    # the whole waveform by k samples; rotate each RIR so its peak sits at 0
    # (synthetic_rir already peaks at 0 — the roll is then a no-op)
    peak = jnp.argmax(jnp.abs(rir), axis=-1)                 # (B,)
    idx = (jnp.arange(r)[None, :] + peak[:, None]) % r
    rir = jnp.take_along_axis(rir, idx, axis=-1)
    n = int(2 ** np.ceil(np.log2(t + r - 1)))
    X = jnp.fft.rfft(x, n=n)
    H = jnp.fft.rfft(rir, n=n)
    y = jnp.fft.irfft(X * H, n=n)[..., :t]
    # normalise to preserve input energy scale
    ey = jnp.sqrt(jnp.mean(y * y, axis=-1, keepdims=True))
    ex = jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True))
    return y * (ex / jnp.maximum(ey, 1e-12))


def synthetic_rir(key: jax.Array, length: int = 2048, sample_rate: int = 16000,
                  rt60: float = 0.3) -> jnp.ndarray:
    """Exponentially-decaying noise RIR (the standard synthetic stand-in when no
    measured RIR bank is available)."""
    t = jnp.arange(length) / sample_rate
    decay = jnp.exp(-6.908 * t / rt60)          # -60 dB at rt60
    noise = jax.random.normal(key, (length,))
    rir = noise * decay
    rir = rir.at[0].set(1.0)                    # direct path
    return rir / jnp.sqrt(jnp.sum(rir * rir))


def augment_waveform(x: jnp.ndarray, key: jax.Array,
                     noise_bank: Optional[jnp.ndarray] = None,
                     rir_bank: Optional[jnp.ndarray] = None,
                     noise_prob: float = 0.5, reverb_prob: float = 0.3,
                     snr_db_min: float = 5.0, snr_db_max: float = 20.0):
    """Config-gated composite augmentation (maze3.py:577-670 semantics: each
    transform applied independently with its own probability, per sample)."""
    b = x.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    out = x
    if noise_bank is not None:
        noised = add_noise_snr(out, noise_bank, k1, snr_db_min, snr_db_max)
        gate = jax.random.uniform(k2, (b, 1)) < noise_prob
        out = jnp.where(gate, noised, out)
    if rir_bank is not None:
        idx = jax.random.randint(k3, (b,), 0, rir_bank.shape[0])
        reverbed = rir_reverb(out, rir_bank[idx])
        gate = jax.random.uniform(k4, (b, 1)) < reverb_prob
        out = jnp.where(gate, reverbed, out)
    return out
