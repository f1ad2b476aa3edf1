"""Fused LFCC Pallas kernel: raw audio -> LFCC with zero HBM intermediates.

The XLA path (ops/lfcc.py) runs frame -> windowed-DFT -> power -> filterbank -> log
-> DCT as a GEMM chain, but the (B, frames, 514) spectra and (B, frames, 257) power
tensors round-trip HBM between fusions. This kernel keeps a whole frame-tile pipeline
in VMEM:

  grid (batch, frame_tile):
    DMA x[b, t*F*hop : t*F*hop + F*hop + (win-hop)] HBM -> VMEM scratch
    framing WITHOUT gathers: win=400, hop=160 share chunk=gcd=80, so frame matrix
      (F, 400) = concat_j of x[j*80 : j*80 + F*160].reshape(F, 160)[:, :80]
      (pure slices + reshapes — vectorises on the VPU, no index arithmetic)
    (F, 400) @ (400, 514) windowed-DFT matmul          (MXU)
    power = re^2 + im^2                                (VPU)
    (F, 257) @ (257, n_filter) filterbank, log         (MXU+VPU)
    (F, n_filter) @ (n_filter, n_lfcc) DCT             (MXU)
    write (F, n_lfcc) tile

Input must be pre-padded on the host side of the call (reflect center-pad + pad
frames to a multiple of the tile; ``lfcc_fused`` handles both and crops).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adfmsl.ops.lfcc import dct_matrix
from adfmsl.ops.mel import linear_filterbank
from adfmsl.ops.stft import _dft_matrices


def _kernel(x_hbm, w_ref, fb_ref, dct_ref, out_ref, scratch, sem,
            *, tile_frames, hop, win, chunk, log_eps):
    b = pl.program_id(0)
    t = pl.program_id(1)
    f = tile_frames
    n_per = win // chunk          # chunk-rows per window
    hop_c = hop // chunk          # chunk-rows per hop
    rows = hop_c * (f - 1) + n_per
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * f * hop_c, rows), :], scratch.at[pl.ds(0, rows), :],
        sem)
    dma.start()
    dma.wait()

    # frame row i covers chunk-rows [i*hop_c, i*hop_c + n_per); instead of
    # materialising (F, win) frames, accumulate the windowed-DFT matmul per
    # chunk-row: spec = sum_j scratch[j::hop_c][:F] @ Wpad[j]. Chunk rows are
    # 128-lane padded (Mosaic DMA alignment); the pad lanes hit zero rows of Wpad.
    spec = None
    for j in range(n_per):
        seg = scratch[pl.Slice(j, f, hop_c), :]                  # (F, 128)
        wj = w_ref[pl.ds(j * 128, 128), :]                       # (128, 2K)
        contrib = jnp.dot(seg, wj, precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
        spec = contrib if spec is None else spec + contrib
    k = spec.shape[1] // 2
    power = spec[:, :k] ** 2 + spec[:, k:] ** 2                  # (F, bins)
    energies = jnp.dot(power, fb_ref[:], precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    loge = jnp.log(jnp.maximum(energies, log_eps))
    out_ref[0] = jnp.dot(loge, dct_ref[:], precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "n_fft", "hop_length", "win_length", "n_filter",
                     "n_lfcc", "log_eps", "tile_frames", "interpret"))
def lfcc_fused(x: jnp.ndarray, sample_rate: int = 16000, n_fft: int = 512,
               hop_length: int = 160, win_length: int = 400, n_filter: int = 70,
               n_lfcc: int = 60, log_eps: float = 1e-6, tile_frames: int = 128,
               interpret: bool = False) -> jnp.ndarray:
    """(B, T) -> (B, frames, n_lfcc); numerically matches ops.lfcc.lfcc (matmul/conv
    impls) to f32 tolerance. ``interpret=True`` runs the Pallas interpreter (CPU)."""
    if win_length % np.gcd(win_length, hop_length) or \
       hop_length % np.gcd(win_length, hop_length):
        raise ValueError("win/hop must share a common chunk")
    chunk = int(np.gcd(win_length, hop_length))
    b, t = x.shape
    # center reflect-pad (librosa semantics, as in ops.window.frame)
    pad = win_length // 2
    xp = jnp.pad(x, [(0, 0), (pad, pad)], mode="reflect")
    n_frames = 1 + (xp.shape[1] - win_length) // hop_length
    n_tiles = -(-n_frames // tile_frames)
    # pad so every tile's DMA window exists, and reshape to chunk rows: Mosaic has
    # no 1D->2D shape cast, so the host hands the kernel (B, n_chunks, chunk) and
    # the kernel strided-slices whole chunk rows
    hop_c = hop_length // chunk
    n_per = win_length // chunk
    rows_needed = n_tiles * tile_frames * hop_c + (n_per - hop_c)
    t_needed = rows_needed * chunk
    xp = jnp.pad(xp, [(0, 0), (0, max(0, t_needed - xp.shape[1]))])
    xp = xp[:, :t_needed].reshape(b, rows_needed, chunk)
    # pad chunk lanes 80 -> 128 (Mosaic tiling); matching zero rows land in Wpad
    xp = jnp.pad(xp, [(0, 0), (0, 0), (0, 128 - chunk)])

    cre, cim = _dft_matrices(n_fft, win_length)
    w_full = np.concatenate([cre, cim], axis=1)                  # (win, 2*bins)
    # re-lay W as (n_per*128, 2K): rows [j*128, j*128+chunk) = W[j*chunk:(j+1)*chunk)
    w_pad = np.zeros((n_per * 128, w_full.shape[1]), np.float32)
    for j in range(n_per):
        w_pad[j * 128 : j * 128 + chunk] = w_full[j * chunk : (j + 1) * chunk]
    w = jnp.asarray(w_pad)
    fb = jnp.asarray(linear_filterbank(sample_rate, n_fft, n_filter))
    dct = jnp.asarray(dct_matrix(n_filter, n_lfcc))

    tile_rows = tile_frames * hop_c + (n_per - hop_c)
    kernel = functools.partial(
        _kernel, tile_frames=tile_frames, hop=hop_length, win=win_length,
        chunk=chunk, log_eps=log_eps)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),                # x stays in HBM
            pl.BlockSpec(w.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fb.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(dct.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_frames, n_lfcc),
                               lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile_frames, n_lfcc),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w, fb, dct)
    return out[:, :n_frames, :]
