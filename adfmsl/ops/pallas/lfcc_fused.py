"""Fused LFCC Pallas kernel: raw audio -> LFCC with zero HBM intermediates.

The XLA path (ops/lfcc.py) runs frame -> windowed-DFT -> power -> filterbank -> log
-> DCT as a GEMM chain, but the (B, frames, 514) spectra and (B, frames, 257) power
tensors round-trip HBM between fusions (~424 MB at batch 256 — the measured
pipeline bottleneck). This kernel keeps a whole frame-tile pipeline in VMEM:

  host: reshape the (reflect-padded) waveform into rows of ``hop`` samples,
        lane-padded to a 128 multiple — so frame i occupies CONTIGUOUS rows
        [i, i + ceil(win/hop)) and the kernel never strided-slices. All matrix
        operands are zero-padded to Mosaic tile multiples (lanes 128 / sublanes 8);
        re/im live in separate 128-aligned column halves.
  grid (batch, frame_tile):
    DMA rows [t*F, t*F + F + n_per - 1) HBM -> VMEM scratch
    spec = sum_j scratch[j : j+F] @ Wpad[j]   (n_per contiguous-row matmuls, MXU)
    power = re^2 + im^2                                (VPU)
    (F, bins) @ (bins, n_filter) filterbank, log       (MXU+VPU)
    (F, n_filter) @ (n_filter, n_lfcc) DCT             (MXU)
    write (F, 128) tile (n_lfcc=60 in the leading cols; host crops)

Precision: Mosaic lowers only DEFAULT/HIGHEST dot precisions; 'high' is
emulated as the bf16x3 decomposition (x_hi@w_hi + x_hi@w_lo + x_lo@w_hi),
matching XLA's Precision.HIGH to ~2e-4 relative on LFCC outputs.

Perf status: see docs/PERF.md — the XLA strided-conv lowering (ops/lfcc.py)
remains the production default.
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


def _pad_to(a: np.ndarray, rows: int, cols: int) -> np.ndarray:
    out = np.zeros((rows, cols), np.float32)
    out[: a.shape[0], : a.shape[1]] = a
    return out


def _dot3(a, b_hi, b_lo, mode):
    """DEFAULT = 1-pass bf16; 'high' = bf16x3; 'highest' = native f32 6-pass."""
    if mode in ("highest", "default"):
        prec = (jax.lax.Precision.HIGHEST if mode == "highest"
                else jax.lax.Precision.DEFAULT)
        return jnp.dot(a, b_hi, precision=prec,
                       preferred_element_type=jnp.float32)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = functools.partial(jnp.dot, precision=jax.lax.Precision.DEFAULT,
                          preferred_element_type=jnp.float32)
    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _kernel(x_hbm, w_hi_ref, w_lo_ref, fb_ref, dct_ref, out_ref, scratch, sem,
            *, tile_frames, n_per, lanes, half, log_eps, mode):
    b = pl.program_id(0)
    t = pl.program_id(1)
    f = tile_frames
    rows = 8 * (-(-(f + n_per - 1) // 8))     # 8-row-aligned slice (Mosaic tiling)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * f, rows), :], scratch.at[pl.ds(0, rows), :], sem)
    dma.start()
    dma.wait()

    spec = None
    for j in range(n_per):
        seg = scratch[pl.ds(j, f), :]                            # contiguous rows
        w_hi = w_hi_ref[pl.ds(j * lanes, lanes), :]
        w_lo = w_lo_ref[pl.ds(j * lanes, lanes), :]
        contrib = _dot3(seg, w_hi, w_lo, mode)
        spec = contrib if spec is None else spec + contrib
    power = spec[:, :half] ** 2 + spec[:, half:] ** 2            # (F, half)
    energies = jnp.dot(power, fb_ref[:], precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)       # (F, 128)
    loge = jnp.log(jnp.maximum(energies, log_eps))
    out_ref[0] = jnp.dot(loge, dct_ref[:], precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "n_fft", "hop_length", "win_length", "n_filter",
                     "n_lfcc", "log_eps", "tile_frames", "interpret", "precision"))
def lfcc_fused(x: jnp.ndarray, sample_rate: int = 16000, n_fft: int = 512,
               hop_length: int = 160, win_length: int = 400, n_filter: int = 70,
               n_lfcc: int = 60, log_eps: float = 1e-6, tile_frames: int = 408,
               interpret: bool = False, precision: str = "high") -> jnp.ndarray:
    """(B, T) -> (B, frames, n_lfcc); numerically matches ops.lfcc.lfcc at the
    same precision tier. ``interpret=True`` runs the Pallas interpreter (CPU)."""
    if tile_frames % 8:
        raise ValueError("tile_frames must be a multiple of 8 (f32 sublanes)")
    b, t = x.shape
    # center reflect-pad (librosa semantics, as in ops.window.frame)
    pad = win_length // 2
    xp = jnp.pad(x, [(0, 0), (pad, pad)], mode="reflect")
    n_frames = 1 + (xp.shape[1] - win_length) // hop_length
    n_tiles = -(-n_frames // tile_frames)

    # one hop per row, lane-padded to a 128 multiple -> frames live on
    # contiguous rows (no strided in-kernel slicing)
    lanes = 128 * (-(-hop_length // 128))
    n_per = -(-win_length // hop_length)                # window rows per frame
    rows_al = 8 * (-(-(tile_frames + n_per - 1) // 8))  # kernel DMA row count
    rows_needed = (n_tiles - 1) * tile_frames + rows_al
    t_needed = rows_needed * hop_length
    xp = jnp.pad(xp, [(0, 0), (0, max(0, t_needed - xp.shape[1]))])
    xp = xp[:, :t_needed].reshape(b, rows_needed, hop_length)
    xp = jnp.pad(xp, [(0, 0), (0, 0), (0, lanes - hop_length)])

    n_bins = n_fft // 2 + 1
    half = 128 * (-(-n_bins // 128))                    # re/im column half width
    cre, cim = _dft_matrices(n_fft, win_length)
    # row-block layout: block j rows [j*lanes, ...) = W[j*hop : ...]; re in cols
    # [0, half), im in [half, 2*half) (both 128-aligned)
    w_pad = np.zeros((n_per * lanes, 2 * half), np.float32)
    for j in range(n_per):
        blk_re = cre[j * hop_length: min((j + 1) * hop_length, win_length)]
        blk_im = cim[j * hop_length: min((j + 1) * hop_length, win_length)]
        w_pad[j * lanes: j * lanes + blk_re.shape[0], :n_bins] = blk_re
        w_pad[j * lanes: j * lanes + blk_im.shape[0], half:half + n_bins] = blk_im
    import ml_dtypes

    bf16 = ml_dtypes.bfloat16
    if precision == "high":
        w_hi_np = w_pad.astype(bf16)
        w_lo_np = (w_pad - w_hi_np.astype(np.float32)).astype(bf16)
    elif precision == "default":
        w_hi_np = w_pad.astype(bf16)
        w_lo_np = np.zeros_like(w_hi_np)
    else:
        w_hi_np = w_pad
        w_lo_np = np.zeros_like(w_pad)
    w_hi, w_lo = jnp.asarray(w_hi_np), jnp.asarray(w_lo_np)

    n_fcols = 128 * (-(-n_filter // 128))
    fb = _pad_to(linear_filterbank(sample_rate, n_fft, n_filter), half, n_fcols)
    # zero rows beyond n_bins feed zeros into energies; log floor handles them
    n_lcols = 128 * (-(-n_lfcc // 128))
    dct = _pad_to(dct_matrix(n_filter, n_lfcc), n_fcols, n_lcols)

    kernel = functools.partial(
        _kernel, tile_frames=tile_frames, n_per=n_per, lanes=lanes, half=half,
        log_eps=log_eps, mode=precision)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                # x stays in HBM
            pl.BlockSpec(w_hi.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w_lo.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(fb.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(dct.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_frames, n_lcols),
                               lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile_frames, n_lcols),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows_al, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w_hi, w_lo, jnp.asarray(fb), jnp.asarray(dct))
    return out[:, :n_frames, :n_lfcc]
