"""STFT and power/log spectrograms, TPU-first.

Two interchangeable implementations:
- ``stft_fft``: framing + jnp.fft.rfft (XLA's FFT).
- ``stft_matmul``: framing + windowed-DFT as ONE real matmul on the MXU. For the short
  frames used here (win 400/512) a dense (frame_length x 2*(n_fft//2+1)) DFT matrix is
  small, and spectrogram = frames @ dft — exactly the shape of work the 128x128 systolic
  array eats; it also fuses with the downstream mel/LFCC filterbank into a single GEMM
  chain (see ``ops/fused.py``). This is the TPU-native answer to the reference's
  librosa-on-CPU front end (maze2.py:265, SURVEY.md 2.8).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from adfmsl.ops.window import frame, hann


@lru_cache(maxsize=16)
def _dft_matrices(n_fft: int, win_length: int, dtype=np.float32):
    """Real/imag DFT matrices, window folded in: (win_length, n_bins) each."""
    n_bins = n_fft // 2 + 1
    n = np.arange(win_length)[:, None]          # sample index within frame
    k = np.arange(n_bins)[None, :]              # bin index
    ang = -2.0 * np.pi * n * k / n_fft
    w = hann(win_length, periodic=True).astype(np.float64)[:, None]
    return (np.cos(ang) * w).astype(dtype), (np.sin(ang) * w).astype(dtype)


# DFT matmul precision tiers (measured on v5e, batch 256 x 4 s LFCC):
#   'highest' = 6-pass f32 MXU, exact-f32 parity           (~64k utt/s)
#   'high'    = 3-pass bf16, ~2e-4 relative error — inside every golden-test
#               tolerance vs librosa/scipy                   (~90k utt/s, default)
#   'default' = 1-pass bf16, ~2e-2 relative (trunk-grade)   (~110k utt/s)
_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def resolve_precision(p):
    return _PRECISIONS[p] if isinstance(p, str) else (p or jax.lax.Precision.HIGHEST)


def stft_matmul(x: jnp.ndarray, n_fft: int = 512, hop_length: int = 160,
                win_length: int = 400, center: bool = True,
                precision: str = "high"):
    """Power spectrogram |STFT|^2 via MXU matmul. x: (..., T) -> (..., frames, bins)."""
    frames = frame(x, win_length, hop_length, center=center)
    cre, cim = _dft_matrices(n_fft, win_length)
    prec = resolve_precision(precision)
    re = jnp.matmul(frames, jnp.asarray(cre), precision=prec,
                    preferred_element_type=jnp.float32)
    im = jnp.matmul(frames, jnp.asarray(cim), precision=prec,
                    preferred_element_type=jnp.float32)
    return re * re + im * im


def stft_conv(x: jnp.ndarray, n_fft: int = 512, hop_length: int = 160,
              win_length: int = 400, center: bool = True,
              precision: str = "high"):
    """Power spectrogram as ONE strided convolution: re/im DFT matrices (window
    folded in) become a (2*n_bins, win_length) conv kernel with stride=hop, so the
    (frames x win) matrix is never materialised in HBM — the MXU consumes the raw
    waveform directly. Numerically identical to stft_matmul.

    x: (..., T) -> (..., frames, bins) (leading dims flattened into the conv
    batch and restored)."""
    lead = x.shape[:-1]
    x = x.reshape((-1, x.shape[-1]))                     # (B*, T)
    if center:
        pad = win_length // 2
        x = jnp.pad(x, [(0, 0), (pad, pad)], mode="reflect")
    cre, cim = _dft_matrices(n_fft, win_length)
    kernel = jnp.concatenate([jnp.asarray(cre), jnp.asarray(cim)], axis=1)  # (W, 2K)
    out = jax.lax.conv_general_dilated(
        x[:, :, None], kernel[:, None, :],
        window_strides=(hop_length,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=resolve_precision(precision),
        preferred_element_type=jnp.float32,
    )                                                   # (B*, frames, 2K)
    n_bins = n_fft // 2 + 1
    re, im = out[..., :n_bins], out[..., n_bins:]
    p = re * re + im * im
    return p.reshape(lead + p.shape[1:])


def stft_s2d(x: jnp.ndarray, n_fft: int = 512, hop_length: int = 160,
             win_length: int = 400, center: bool = True,
             precision: str = "high", raw: bool = False):
    """Power spectrogram via a SPACE-TO-DEPTH strided conv — the fastest v5e
    form (round-3 measurement: full LFCC 150k utt/s vs 106k for ``stft_conv``
    at the same 'high' tier).

    ``stft_conv`` feeds the conv a (B, T, 1) input: channel dim 1 of the 128
    vector lanes, so the strided window walk dominates the runtime (a fixed
    ~1.4 ms/batch at 384x4 s regardless of column count). Here the waveform is
    reshaped to (B, T//hop, hop) — hop-sized blocks AS CHANNELS — and the
    stride-``hop`` window becomes a dense stride-1 conv over ``ceil(win/hop)``
    block positions whose kernel rows past ``win_length`` are zero. Same math,
    MXU-friendly input layout. Numerically identical to stft_matmul/stft_conv
    (same DFT matrices, same pass count per ``precision``)."""
    lead = x.shape[:-1]
    x = x.reshape((-1, x.shape[-1]))
    if center:
        pad = win_length // 2
        x = jnp.pad(x, [(0, 0), (pad, pad)], mode="reflect")
    m = x.shape[1]
    n_frames = (m - win_length) // hop_length + 1
    wb = -(-win_length // hop_length)            # window span in blocks
    need = (n_frames + wb - 1) * hop_length
    if m < need:
        # zero tail only ever multiplies the kernel's zero rows / frames >= n_frames
        x = jnp.pad(x, [(0, 0), (0, need - m)])
    blocks = x[:, :need].reshape(-1, need // hop_length, hop_length)
    cre, cim = _dft_matrices(n_fft, win_length)
    k = np.zeros((wb * hop_length, cre.shape[1] * 2), np.float32)
    k[:win_length] = np.concatenate([cre, cim], axis=1)
    out = jax.lax.conv_general_dilated(
        blocks, jnp.asarray(k.reshape(wb, hop_length, -1)),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=resolve_precision(precision),
        preferred_element_type=jnp.float32,
    )[:, :n_frames]
    if raw:
        # pre-power conv output (..., frames, 2*n_bins) = [re | im]: callers
        # that consume |STFT|^2 through a LINEAR map (filterbank) can fuse the
        # square into that matmul's operand instead of materialising the
        # (B, frames, n_bins) power spectrum in HBM (ops/lfcc.py fused_power)
        return out.reshape(lead + out.shape[1:])
    n_bins = n_fft // 2 + 1
    re, im = out[..., :n_bins], out[..., n_bins:]
    p = re * re + im * im
    return p.reshape(lead + p.shape[1:])


def stft_fft(x: jnp.ndarray, n_fft: int = 512, hop_length: int = 160,
             win_length: int = 400, center: bool = True,
             precision: str = "high"):
    """Power spectrogram via rfft (reference semantics: window padded to n_fft)."""
    frames = frame(x, win_length, hop_length, center=center)
    w = jnp.asarray(hann(win_length, periodic=True))
    fr = frames * w
    if win_length < n_fft:
        pad = [(0, 0)] * (fr.ndim - 1) + [(0, n_fft - win_length)]
        fr = jnp.pad(fr, pad)
    spec = jnp.fft.rfft(fr, n=n_fft, axis=-1)
    return jnp.abs(spec) ** 2


def power_spectrogram(x, n_fft=512, hop_length=160, win_length=400, center=True,
                      impl: str = "s2d", precision: str = "high"):
    fn = {"matmul": stft_matmul, "fft": stft_fft, "conv": stft_conv,
          "s2d": stft_s2d}[impl]
    return fn(x, n_fft, hop_length, win_length, center, precision=precision)
