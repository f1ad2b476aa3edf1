"""Windows and framing (on-device).

Replaces the host-side windowing hidden inside librosa/torchaudio in the reference
(SURVEY.md section 2.8). Everything is static-shape jnp so it fuses under jit.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def hann(n: int, periodic: bool = True, dtype=np.float32) -> np.ndarray:
    """Hann window. ``periodic=True`` matches torch.hann_window default / STFT usage;
    ``periodic=False`` the symmetric window the reference SincConv uses
    (maze4.py:82 ``torch.hann_window(kernel_size, periodic=False)``)."""
    if n == 1:
        return np.ones(1, dtype=dtype)
    denom = n if periodic else n - 1
    k = np.arange(n)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / denom)).astype(dtype)


def frame(x: jnp.ndarray, frame_length: int, hop: int, center: bool = True,
          pad_mode: str = "reflect") -> jnp.ndarray:
    """Slice (..., T) signal into (..., n_frames, frame_length) overlapping frames.

    ``center=True`` reflect-pads by frame_length//2 on both sides (librosa.stft
    default), so frame t is centered on sample t*hop.
    """
    if center:
        pad = frame_length // 2
        cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, cfg, mode=pad_mode)
    n = x.shape[-1]
    n_frames = 1 + (n - frame_length) // hop
    # gather-based framing: one static index matrix, vectorizes over leading dims
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :])
    return jnp.take(x, jnp.asarray(idx), axis=-1)


def num_frames(n_samples: int, frame_length: int, hop: int, center: bool = True) -> int:
    n = n_samples + 2 * (frame_length // 2) if center else n_samples
    return 1 + (n - frame_length) // hop
