"""Folded eval-mode residual-block bodies (the maze4/5 + RawNet trunk hot path).

The 'tpu'-semantics ResBlockSE (models/blocks.py) at eval time is, per block,
    h   = relu(bn1(x))            (skipped on the stack head)
    y1  = relu(bn2(conv_k3(h)))   (dropout = identity at eval)
    out = conv_k3(y1) + skip(x)   (skip = identity or 1x1 conv)
    out = out * SE_gate(mean_t(out))
(_RawNetBlock is the same shape with LeakyReLU(0.3) and a MaxPool3 tail.)
Run as flax modules, each BatchNorm is a separate f32 HBM round trip XLA cannot
fuse across: measured on v5e at maze4/5 block0 scale (B=192, T=64350, C=128)
the full block costs 29.9 ms against a 12.4 ms two-conv compute floor
(CLAUDE.md round-3 findings).

The capability here is FOLDING: at eval the BN running stats collapse into
per-channel affines at trace time (``fold_block_params``), the whole body runs
in bf16 with f32 conv accumulation, and every affine/act epilogue then fuses
into the convolutions. Two executors implement the identical folded math:

- ``resblock_eval_xla`` (production, DEFAULT_IMPL='xla'): lax convs; XLA keeps
  the epilogues inside the conv fusions. Block0 micro: 29.9 -> 9.1 ms eqv.
- ``resblock_eval_fused`` (Pallas, measured and kept as the documented
  alternative): three fused stages of 3-tap-stencil matmuls over row tiles
  with manual HBM DMA and in-pass channel-sum accumulation. Measured 20-22 ms
  at the same scale — VPU-bound on the affine/mask/shift passes between its
  six small (R,128)x(128,128) matmuls, so it LOSES to XLA's conv lowering
  (same verdict as lfcc_fused; the sinc front end remains the case where
  Pallas wins because XLA will not fuse across the |.|+maxpool reduction).

The SE gate needs a GLOBAL mean over T, so it cannot live inside a row-tiled
body; both executors return exact f32 channel sums instead and the (B,C)-sized
gate MLP + the out*gate multiply stay in XLA — the multiply's only consumer is
the next block's stride pool (or the final mean pool), which XLA fuses it into.

Reference capability reproduced: maze4.py:105-163 (Residual_Block_SE + SEBlock)
at eval; numerics are the trunk's own bf16 (matmuls bf16 with f32 accumulation,
affines f32), so this is gated off for f32 reference-parity checkpoints exactly
like ops/pallas/sinc_fused.py is.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 16          # rows of context loaded each side (8-aligned for bf16 DMA)
DEFAULT_ROWS = 1024  # row-tile size; swept on v5e (see docs/PERF.md)
# Which executor the eval trunk uses for the folded block body. Measured on
# v5e at maze4/5 block0 scale (B=64, T=64350, C=128, bf16): the Pallas kernel
# runs 20-22 ms/batch vs 9.1 ms for the SAME folded-affine bf16 math composed
# from XLA convs — the kernel is VPU-bound (affine/mask/shift passes between
# the six small matmuls), while XLA's conv lowering keeps the epilogues inside
# the conv fusion. The capability win here is the FOLDING (BN running stats
# become per-channel affines at trace time, eliminating the f32 BN round
# trips XLA can't fuse across); XLA is the faster executor for it.
DEFAULT_IMPL = "xla"


def _act(v, act):
    if act == "relu":
        return jnp.maximum(v, 0.0)
    if act == "leaky":                                   # LeakyReLU(0.3)
        return jnp.maximum(v, 0.3 * v)
    raise ValueError(f"unknown act {act!r}")


def _kernel(x_hbm, pre_ref, w1_ref, b1_ref, w2_ref, bt_ref, sk_ref,
            y_ref, sums_ref, xbuf, sem, *, rows, tin, has_pre, has_skip,
            act, pool):
    b = pl.program_id(0)
    t = pl.program_id(1)
    r0 = t * rows
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r0, rows + 2 * _HALO), :], xbuf, sem)
    dma.start()
    dma.wait()

    # --- pre-activation h over all loaded rows; zero outside [0, tin) so the
    # --- conv's SAME padding semantics hold at tile and sequence edges
    gh = r0 - _HALO + jax.lax.broadcasted_iota(jnp.int32, (rows + 2 * _HALO, 1), 0)
    x32 = xbuf[...].astype(jnp.float32)
    if has_pre:
        h = _act(x32 * pre_ref[0:1, :] + pre_ref[1:2, :], act)
    else:
        h = x32
    h = jnp.where((gh >= 0) & (gh < tin), h, 0.0).astype(jnp.bfloat16)

    # --- conv1 (+ folded bn2) + relu on rows [r0-1, r0+rows+7): the extra rows
    # --- give conv2 its halo; row j is global g1 = r0-1+j and needs
    # --- h[g1+d-1] = local row j+d+(_HALO-2)
    acc = None
    for d in range(3):
        lhs = h[d + _HALO - 2: d + _HALO - 2 + rows + 8, :]
        c = jnp.dot(lhs, w1_ref[d], preferred_element_type=jnp.float32)
        acc = c if acc is None else acc + c
    g1 = r0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (rows + 8, 1), 0)
    y1 = _act(acc + b1_ref[...], act)
    y1 = jnp.where((g1 >= 0) & (g1 < tin), y1, 0.0).astype(jnp.bfloat16)

    # --- conv2 + skip; out row i is global r0+i and needs y1'[i+d]
    acc2 = None
    for d in range(3):
        c = jnp.dot(y1[d: d + rows, :], w2_ref[d],
                    preferred_element_type=jnp.float32)
        acc2 = c if acc2 is None else acc2 + c
    xrows = xbuf[_HALO: _HALO + rows, :]
    if has_skip:
        skip = jnp.dot(xrows, sk_ref[...], preferred_element_type=jnp.float32)
    else:
        skip = xrows.astype(jnp.float32)
    out = acc2 + bt_ref[...] + skip

    if pool == 3:
        # fused VALID MaxPool3 tail (_RawNetBlock); pooled row p is global
        # gp = r0//3 + p, valid iff gp < tin//3 (then all 3 source rows < tin)
        cout = out.shape[-1]
        out = jnp.max(out.reshape(rows // 3, 3, cout), axis=1)
        gidx = r0 // 3 + jax.lax.broadcasted_iota(jnp.int32, (rows // 3, 1), 0)
        go = gidx < (tin // 3)
    else:
        go = (r0 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)) < tin

    # --- exact f32 channel sums of the valid output rows (SE / FC-attention)
    s = jnp.sum(jnp.where(go, out, 0.0), axis=0, keepdims=True)

    @pl.when(t == 0)
    def _init():
        sums_ref[0] = s

    @pl.when(t > 0)
    def _acc():
        sums_ref[0] = sums_ref[0] + s

    y_ref[0] = out.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("rows", "act", "pool",
                                             "interpret"))
def resblock_eval_fused(x, pre, w1, b1, w2, bt, skw, *, rows: int | None = None,
                        act: str = "relu", pool: int = 1,
                        interpret: bool = False):
    """One eval-mode residual-block body, fused: (B, T, Cin) -> (B, T', Cout).

    pre:  (2, Cin) f32 [a1; c1] folded bn1 affine, or None for the stack head.
    w1:   (3, Cin, Cout) conv1 kernel with bn2's scale folded in; b1 (1, Cout)
          the matching folded bias.  w2: (3, Cout, Cout); bt (1, Cout) carries
          conv2.bias + downsample.bias.  skw: (Cin, Cout) 1x1 skip kernel, or
          None for an identity skip (Cin == Cout).
    act:  'relu' ('tpu' ResBlockSE) or 'leaky' (LeakyReLU 0.3, _RawNetBlock).
    pool: 1, or 3 for a fused VALID MaxPool3 tail (T' = T//3, RawNet).
    Returns (y bf16, channel_sums f32 (B, Cout)) where channel_sums is the
    exact sum of y over the (post-pool) time axis (feed /T' into the SE or
    FC-attention gate MLP).
    """
    bsz, tin, cin = x.shape
    cout = w1.shape[-1]
    if rows is None:
        rows = DEFAULT_ROWS
    quant = 48 if pool == 3 else 16                      # lcm(16, pool)
    r = min(-(-rows // quant) * quant, -(-tin // quant) * quant)
    r = max(r, quant)
    n_t = -(-tin // r)
    tout = tin // pool
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, 0), (_HALO, n_t * r + _HALO - tin), (0, 0)))

    has_pre = pre is not None
    has_skip = skw is not None
    pre_a = (pre.astype(jnp.float32) if has_pre else jnp.zeros((2, cin)))
    sk_a = (skw.astype(jnp.bfloat16) if has_skip
            else jnp.zeros((1, 1), jnp.bfloat16))

    y, sums = pl.pallas_call(
        functools.partial(_kernel, rows=r, tin=tin,
                          has_pre=has_pre, has_skip=has_skip,
                          act=act, pool=pool),
        grid=(bsz, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, cin), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cin, cout), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cout, cout), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sk_a.shape, lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, r // pool, cout), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cout), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_t * (r // pool), cout), jnp.bfloat16),
            jax.ShapeDtypeStruct((bsz, 1, cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r + 2 * _HALO, cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp,
      pre_a,
      w1.astype(jnp.bfloat16),
      b1.reshape(1, cout).astype(jnp.float32),
      w2.astype(jnp.bfloat16),
      bt.reshape(1, cout).astype(jnp.float32),
      sk_a)
    return y[:, :tout, :], sums[:, 0, :]


def fold_block_params(params, stats, *, first: bool, eps: float = 1e-5):
    """Fold a 'tpu' ResBlockSE's BatchNorm running stats into the kernel's
    affine/weight operands. params/stats are the block's own sub-dicts
    ({'conv1': .., 'bn2': .., ...} / {'bn2': {'mean','var'}, ...})."""
    a2 = stats["bn2"]["var"]
    a2 = params["bn2"]["scale"] * jax.lax.rsqrt(a2 + eps)
    c2 = params["bn2"]["bias"] - stats["bn2"]["mean"] * a2
    w1 = params["conv1"]["kernel"] * a2[None, None, :]
    b1 = params["conv1"]["bias"] * a2 + c2
    pre = None
    if not first:
        a1 = params["bn1"]["scale"] * jax.lax.rsqrt(stats["bn1"]["var"] + eps)
        c1 = params["bn1"]["bias"] - stats["bn1"]["mean"] * a1
        pre = jnp.stack([a1, c1])
    w2 = params["conv2"]["kernel"]
    bt = params["conv2"]["bias"]
    skw = None
    if "downsample" in params:
        skw = params["downsample"]["kernel"][0]          # (1, Cin, Cout) -> 2-D
        bt = bt + params["downsample"]["bias"]
    return pre, w1, b1, w2, bt, skw


def resblock_eval_xla(x, pre, w1, b1, w2, bt, skw, act="relu", pool=1):
    """The folded block body as an all-bf16 XLA composition (the production
    eval path — see DEFAULT_IMPL). Everything is bf16 end to end — the convs
    accumulate f32 inside the MXU but their OUTPUTS are bf16, exactly like the
    plain path's ``nn.Conv(dtype=bfloat16)``; any f32 intermediate here is a
    4.2 GB materialization at batch 128 x 64350 x 128 (measured OOM). The
    affine/act epilogues fuse into the conv fusions.
    Returns (y bf16, channel_sums f32)."""
    f = ((lambda v: jnp.maximum(v, 0.0)) if act == "relu"
         else (lambda v: jnp.maximum(v, jnp.asarray(0.3, v.dtype) * v)))
    xb = x.astype(jnp.bfloat16)
    h = xb
    if pre is not None:
        # apply the folded bn1 affine with f32 coefficients on an f32 upcast,
        # then narrow (advisor round-3): matches the plain path's f32 BN
        # normalisation before the conv's bf16 downcast. Elementwise chain —
        # XLA fuses upcast*affine*act*downcast into conv1's input, so no f32
        # (B, T, C) materialisation.
        h = f(xb.astype(jnp.float32) * pre[0][None, None, :]
              + pre[1][None, None, :]).astype(jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(h.shape, (3,) + w1.shape[1:],
                                        ("NWC", "WIO", "NWC"))
    y1 = jax.lax.conv_general_dilated(
        h, w1.astype(jnp.bfloat16), (1,), "SAME", dimension_numbers=dn)
    y1 = f(y1 + b1.astype(jnp.bfloat16)[None, None, :])
    dn2 = jax.lax.conv_dimension_numbers(y1.shape, (3,) + w2.shape[1:],
                                         ("NWC", "WIO", "NWC"))
    out = jax.lax.conv_general_dilated(
        y1, w2.astype(jnp.bfloat16), (1,), "SAME", dimension_numbers=dn2)
    if skw is None:
        skip = xb
    else:
        skip = jnp.einsum("btc,cd->btd", xb, skw.astype(jnp.bfloat16))
    out = out + bt.astype(jnp.bfloat16)[None, None, :] + skip
    if pool == 3:
        b, t, c = out.shape
        out = jnp.max(out[:, : t // 3 * 3, :].reshape(b, t // 3, 3, c), axis=2)
    # channel sums with an f32 accumulator: the convert fuses into the reduce
    return out, jnp.sum(out, axis=1, dtype=jnp.float32)


def resblock_eval_reference(x, pre, w1, b1, w2, bt, skw, act="relu", pool=1):
    """The same block body composed from XLA ops (f32) — the kernel's test
    oracle; mirrors models/blocks.py 'tpu' ResBlockSE / _RawNetBlock at eval."""
    f = ((lambda v: jnp.maximum(v, 0.0)) if act == "relu"
         else (lambda v: jnp.maximum(v, 0.3 * v)))
    h = x
    if pre is not None:
        h = f(x * pre[0][None, None, :] + pre[1][None, None, :])
    dn = jax.lax.conv_dimension_numbers(h.shape, (3,) + w1.shape[1:],
                                        ("NWC", "WIO", "NWC"))
    y1 = f(jax.lax.conv_general_dilated(h, w1, (1,), "SAME",
                                        dimension_numbers=dn)
           + b1[None, None, :])
    dn2 = jax.lax.conv_dimension_numbers(y1.shape, (3,) + w2.shape[1:],
                                         ("NWC", "WIO", "NWC"))
    out = jax.lax.conv_general_dilated(y1, w2, (1,), "SAME",
                                       dimension_numbers=dn2)
    skip = x if skw is None else jnp.einsum("btc,cd->btd", x, skw)
    out = out + bt[None, None, :] + skip
    if pool == 3:
        b, t, c = out.shape
        out = jnp.max(out[:, : t // 3 * 3, :].reshape(b, t // 3, 3, c), axis=2)
    return out, jnp.sum(out, axis=1)
