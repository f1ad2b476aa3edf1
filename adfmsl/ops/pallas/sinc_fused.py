"""Fused SincConv + |.| + MaxPool(3) Pallas kernel (the RawNet front end).

XLA runs the block-GEMM sinc convolution at ~5 ms/batch8 and then spends another
~1 ms materialising the (B, C, 64350) f32 conv output just to 3:1 max-pool it
(measured; the pool does not fuse into the GEMM epilogue). This kernel keeps the
whole front end in VMEM per tile:

  grid (batch, pooled-position tiles, channel tiles):
    DMA 5 x-chunk rows (128 samples each) HBM -> VMEM
    out_conv(3*128, C_sub) = sum_j X_rows[j:j+3] @ M_j        (bf16 MXU, f32 acc)
    |out_conv| -> reshape (128, 3, C_sub) -> max over the pool axis
    write (128, C_sub) pooled tile

where M_j are the block-Toeplitz matrices of ops.sinc.sinc_conv_block_gemm, held
resident in VMEM in bf16, channel-tiled to fit.

``sinc_abs_pool`` is the trainable wrapper: the Pallas kernel runs the forward,
and a custom VJP recomputes the front end with the XLA block-GEMM composition in
the backward pass (rematerialisation — nothing extra is saved from the kernel)
and differentiates that. Max-pool gradient routing therefore follows the f32
recompute's argmax, which can differ from the kernel's bf16 max at near-ties;
this is the usual remat-at-different-precision tradeoff and is noise-level for
training.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 128     # samples per x-chunk row == conv positions per sub-block
_POOL = 3
_SUBS = 48   # conv sub-blocks per tile: 48*128/3 = 2048 pooled positions/tile;
             # swept on v5e: 3->5.1ms, 12->3.35, 48->3.12 (best), 168 OOMs VMEM


def _build_m(filters: jnp.ndarray, c_tile: int):
    """(C, K) filters -> (n_ctiles, nj, BLOCK, BLOCK*c_tile) bf16 block-Toeplitz
    weights with channel-tiled columns (col = p*c_tile + c within a tile).
    The gather/mask logic lives in ops.sinc.block_toeplitz_mats — shared with
    the XLA block-GEMM so this kernel and its custom-VJP backward (which
    recomputes through the XLA form) can never desynchronise."""
    from adfmsl.ops.sinc import block_toeplitz_mats

    c, _ = filters.shape
    n_ct = c // c_tile
    m = block_toeplitz_mats(filters, _BLOCK)             # (nj, B, B, C)
    nj = m.shape[0]
    # channel-tile the last axis: (nj, B, B, n_ct, ct) -> (n_ct, nj, B, B*ct)
    m = m.reshape(nj, _BLOCK, _BLOCK, n_ct, c_tile).transpose(3, 0, 1, 2, 4)
    return m.reshape(n_ct, nj, _BLOCK, _BLOCK * c_tile).astype(jnp.bfloat16)


def _kernel(x_hbm, m_ref, out_ref, scratch, sem, *, nj, c_tile):
    b = pl.program_id(0)
    t = pl.program_id(1)
    rows = _SUBS + nj - 1
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t * _SUBS, rows), :], scratch.at[pl.ds(0, rows), :], sem)
    dma.start()
    dma.wait()

    acc = None
    for j in range(nj):
        lhs = scratch[pl.ds(j, _SUBS), :].astype(jnp.bfloat16)       # (SUBS, B)
        rhs = m_ref[0, j, :, :]                                      # (B, B*ct)
        contrib = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
        acc = contrib if acc is None else acc + contrib
    # acc: (SUBS, BLOCK*c_tile) == conv positions (SUBS*BLOCK, c_tile)
    conv = jnp.abs(acc.reshape(_SUBS * _BLOCK, c_tile))
    pooled = jnp.max(conv.reshape(_SUBS * _BLOCK // _POOL, _POOL, c_tile), axis=1)
    out_ref[0] = pooled


@functools.partial(jax.jit, static_argnames=("c_tile", "interpret"))
def sinc_abs_pool_fused(x: jnp.ndarray, filters: jnp.ndarray, c_tile: int = 128,
                        interpret: bool = False) -> jnp.ndarray:
    """(B, T) x (C, K) -> (B, T3, C) where T3 = (T-K+1)//3 pooled frames.

    Equivalent to max_pool(|sinc_conv(x, f)|, 3) with VALID conv; channels must be
    divisible by c_tile.
    """
    b, t = x.shape
    c, k = filters.shape
    if c % c_tile:
        raise ValueError(f"channels {c} not divisible by c_tile {c_tile}")
    nj = (_BLOCK + k - 1 + _BLOCK - 1) // _BLOCK
    t_out = t - k + 1
    t3 = t_out // _POOL
    pooled_per_tile = _SUBS * _BLOCK // _POOL
    n_tiles = -(-t3 // pooled_per_tile)
    rows_needed = n_tiles * _SUBS + (nj - 1)
    t_pad = rows_needed * _BLOCK
    xp = jnp.pad(x, [(0, 0), (0, max(0, t_pad - t))])[:, :t_pad]
    xp = xp.reshape(b, rows_needed, _BLOCK)

    m = _build_m(filters, c_tile)                        # (nj, B, n_ct, B*ct)
    n_ct = c // c_tile

    out = pl.pallas_call(
        functools.partial(_kernel, nj=nj, c_tile=c_tile),
        grid=(b, n_tiles, n_ct),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, nj, _BLOCK, _BLOCK * c_tile),
                         lambda b, t, ct: (ct, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, pooled_per_tile, c_tile),
                               lambda b, t, ct: (b, t, ct),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * pooled_per_tile, c),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_SUBS + nj - 1, _BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, m)
    return out[:, :t3, :]


def _xla_frontend(x: jnp.ndarray, filters: jnp.ndarray) -> jnp.ndarray:
    """The same front end as the kernel, composed from XLA ops (differentiable):
    max_pool(|sinc conv|, 3) -> (B, T3, C). NHC channels-last form — 2.6x the
    round-2 block-GEMM composition at b64 (the custom-VJP backward recomputes
    through this, so the training path inherits the speedup too)."""
    from adfmsl.ops.sinc import sinc_abs_pool3_nhc

    return sinc_abs_pool3_nhc(x, filters)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def sinc_abs_pool(x: jnp.ndarray, filters: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """Trainable fused front end: Pallas kernel forward, XLA-recompute backward.

    Differentiable in both x and filters (gradients flow through the sinc
    filter synthesis), so the RawNet family can run the fused kernel in the
    TRAINING forward pass too."""
    return sinc_abs_pool_fused(x, filters, interpret=interpret)


def _sap_fwd(x, filters, interpret):
    return sinc_abs_pool_fused(x, filters, interpret=interpret), (x, filters)


def _sap_bwd(interpret, res, g):
    del interpret
    x, filters = res
    _, vjp = jax.vjp(_xla_frontend, x, filters)
    return vjp(g)


sinc_abs_pool.defvjp(_sap_fwd, _sap_bwd)
