"""Trainable sinc band-pass filterbank (SincNet / RawNet front end), vectorized.

The reference builds its 128 filters in a Python loop over channels EVERY forward pass
(``maze4.py:90-99``) and hands them to cuDNN conv1d. Here filter synthesis is one
broadcast expression over (channels, taps) — differentiable w.r.t. the cutoff params —
and the convolution maps to an XLA conv that tiles onto the MXU.

Parity note: the reference computes ``2*f * torch.sinc(2*f*pi*n)`` where
``torch.sinc(x) = sin(pi x)/(pi x)`` — i.e. the pi lands INSIDE the normalised sinc,
scaling the effective cutoff by pi vs the textbook band-pass.
``formula='textbook'`` (default, matching every config/model wrapper and
CLAUDE.md) gives the standard windowed-sinc band-pass; ``'reference'``
reproduces the reference's (nearly flat) behaviour bit-for-bit for ported
checkpoints.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from adfmsl.ops.mel import hz_to_mel, mel_to_hz
from adfmsl.ops.window import hann


def to_mel(hz):
    """HTK mel (the canonical formula lives in ops/mel.py)."""
    return hz_to_mel(hz, htk=True)


def to_hz(mel):
    return mel_to_hz(mel, htk=True)


def sinc_init(out_channels: int, sample_rate: int = 16000, min_low_hz: float = 50.0,
              min_band_hz: float = 50.0) -> Tuple[np.ndarray, np.ndarray]:
    """Mel-spaced initial (low_hz, band_hz) params — maze4.py:68-78 semantics:
    mel-linspace from 30 Hz to sr/2 - (min_low+min_band), low=edges[:-1], band=diff."""
    low_hz, high_hz = 30.0, sample_rate / 2.0 - (min_low_hz + min_band_hz)
    mel = np.linspace(to_mel(low_hz), to_mel(high_hz), out_channels + 1)
    hz = to_hz(mel)
    return hz[:-1].astype(np.float32), np.diff(hz).astype(np.float32)


def _nsinc(x):
    """Normalised sinc: sin(pi x)/(pi x), 1 at 0."""
    px = jnp.pi * x
    return jnp.where(jnp.abs(x) < 1e-9, 1.0, jnp.sin(px) / jnp.where(px == 0, 1.0, px))


def sinc_filters(low_hz: jnp.ndarray, band_hz: jnp.ndarray, kernel_size: int,
                 sample_rate: int = 16000, min_low_hz: float = 50.0,
                 min_band_hz: float = 50.0, formula: str = "textbook") -> jnp.ndarray:
    """Synthesize (out_channels, kernel_size) band-pass filters from learnable params."""
    if kernel_size % 2 == 0:
        kernel_size += 1
    half = (kernel_size - 1) / 2.0
    n = (jnp.arange(kernel_size, dtype=jnp.float32) - half) / sample_rate  # (K,)
    window = jnp.asarray(hann(kernel_size, periodic=False))

    low = min_low_hz + jnp.abs(low_hz)                                  # (C,)
    high = jnp.clip(low + min_band_hz + jnp.abs(band_hz), min_low_hz, sample_rate / 2.0)
    f_lo = (low / sample_rate)[:, None]                                  # (C,1)
    f_hi = (high / sample_rate)[:, None]
    if formula == "reference":
        # maze4.py:93-95: h = 2*f_norm * torch.sinc(2*f_norm*pi*n_) with f_norm = f/sr
        # and n_ = (k-half)/sr seconds. The doubled 1/sr plus the pi inside the
        # normalised sinc make the argument tiny (|arg| < ~0.025), i.e. the reference's
        # "band-pass" is nearly flat across taps — reproduced verbatim for parity.
        h_hi = 2.0 * f_hi * _nsinc(2.0 * f_hi * jnp.pi * n[None, :])
        h_lo = 2.0 * f_lo * _nsinc(2.0 * f_lo * jnp.pi * n[None, :])
    elif formula == "textbook":
        # standard: h(n) = 2 f_hi sinc(2 f_hi n sr) - 2 f_lo sinc(2 f_lo n sr)
        h_hi = 2.0 * f_hi * _nsinc(2.0 * f_hi * sample_rate * n[None, :])
        h_lo = 2.0 * f_lo * _nsinc(2.0 * f_lo * sample_rate * n[None, :])
    else:
        raise ValueError(f"unknown sinc formula {formula!r}")
    # Materialise the synthesized filters before they reach the conv: without
    # the barrier XLA operand-fuses this whole sin/where expression into the
    # conv's weight read and RE-SYNTHESIZES the filterbank per output tile —
    # measured 11.6 -> 5.0 ms/step on the b16 K=251 C=128 conv (round 4).
    # Identity for values and gradients (the barrier is differentiable).
    return jax.lax.optimization_barrier(window[None, :] * (h_hi - h_lo))


def block_toeplitz_mats(filters: jnp.ndarray, block: int = 128) -> jnp.ndarray:
    """(C, K) filters -> (nj, block, block, C) block-Toeplitz weights
    M[j, p, i, c] = filters[c, j*block + p - i] (zero outside [0, K)).

    THE single source of the gather/mask logic shared by the XLA block-GEMM
    (below) and the Pallas fused kernel (ops/pallas/sinc_fused.py) — the fused
    kernel's custom VJP recomputes its backward through the XLA form, so the
    two must stay bit-identical."""
    c, k = filters.shape
    nj = (block + k - 1 + block - 1) // block
    p = jnp.arange(block)[:, None]
    i = jnp.arange(block)[None, :]
    f_t = filters.T                                 # (K, C)
    mats = []
    for j in range(nj):
        k_idx = j * block + p - i                   # (block, block)
        valid = (k_idx >= 0) & (k_idx < k)
        mj = jnp.take(f_t, jnp.clip(k_idx, 0, k - 1), axis=0)   # (block, block, C)
        mats.append(jnp.where(valid[:, :, None], mj, 0.0))
    return jnp.stack(mats)


def sinc_conv_block_gemm(x: jnp.ndarray, filters: jnp.ndarray,
                         block: int = 128) -> jnp.ndarray:
    """GEMM-native stride-1 'VALID' filterbank conv: (B, T) x (C, K) -> (B, C, T').

    XLA's TPU lowering of a 1-input-channel, K=251 conv over 64k samples both
    compiles slowly (~100 s) and runs at ~13% of f32 peak. This formulation blocks
    time into ``block``-sized tiles and expresses the convolution as
    nj = ceil((block+K-1)/block) dense matmuls against shared block-Toeplitz weight
    matrices M_j[p, i*C+c] = filters[c, j*block + p - i] (zero outside [0, K)):

        out_block[t] = sum_j  X_block[t + j] @ M_j

    Arithmetic waste is nj*block/K (~1.5x for block=128, K=251) but every FLOP is a
    dense (.., 128) @ (128, block*C) MXU matmul, compiling in seconds and running
    near matmul peak. Fully differentiable w.r.t. filters (M is a gather of f).
    """
    b, t = x.shape
    c, k = filters.shape
    t_out = t - k + 1
    nj = (block + k - 1 + block - 1) // block
    n_ob = -(-t_out // block)                       # output blocks
    t_pad = (n_ob + nj - 1) * block
    xp = jnp.pad(x, [(0, 0), (0, max(t_pad - t, 0))])
    xb = xp.reshape(b, n_ob + nj - 1, block)        # (B, NB, block)

    mats = block_toeplitz_mats(filters, block)      # (nj, block, block, C)
    out = None
    for j in range(nj):
        contrib = jnp.matmul(xb[:, j : j + n_ob, :],
                             mats[j].reshape(block, block * c),
                             preferred_element_type=jnp.float32)
        out = contrib if out is None else out + contrib
    out = out.reshape(b, n_ob * block, c)[:, :t_out, :]         # (B, T', C)
    return jnp.transpose(out, (0, 2, 1))


def sinc_conv_nhc(x: jnp.ndarray, filters: jnp.ndarray,
                  precision=None) -> jnp.ndarray:
    """Stride-1 VALID filterbank conv in the (NHC, HIO, NHC) layout:
    (B, T) x (C, K) -> (B, T', C) channels-last, matching the trunk.

    Round-3 measurement (v5e, batch 64 x 64600, K=251, C=128): 6.3 ms/batch vs
    29.8 ms for sinc_conv_block_gemm and ~20 ms for the NCH layout — XLA's
    current NHC lowering beats the hand-blocked GEMM by ~4.7x, so this is the
    default model path (ops-level; the block-GEMM form stays for reference)."""
    out = jax.lax.conv_general_dilated(
        x[:, :, None], filters.T[:, None, :],      # (K, 1, C)
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    return out                                      # (B, T', C)


def s2d_phase_kernel(filters: jnp.ndarray, hop: int) -> jnp.ndarray:
    """(C, K) filters -> (M, hop, hop*C) phase-decomposed conv weights.

    W[m, i, p*C + c] = filters[c, m*hop + i - p] (zero outside [0, K)):
    tap-block m, within-block sample i, output phase p. Differentiable w.r.t.
    filters (a masked gather, like block_toeplitz_mats)."""
    c, k = filters.shape
    m_taps = -(-(k + hop - 1) // hop)
    m = jnp.arange(m_taps)[:, None, None]
    i = jnp.arange(hop)[None, :, None]
    p = jnp.arange(hop)[None, None, :]
    k_idx = m * hop + i - p                          # (M, hop, hop)
    valid = (k_idx >= 0) & (k_idx < k)
    w = jnp.take(filters.T, jnp.clip(k_idx, 0, k - 1), axis=0)  # (M, hop, hop, C)
    w = jnp.where(valid[..., None], w, 0.0)
    return w.reshape(m_taps, hop, hop * c)


def sinc_conv_s2d(x: jnp.ndarray, filters: jnp.ndarray, hop: int = 16,
                  precision=None) -> jnp.ndarray:
    """Stride-1 VALID filterbank conv via space-to-depth phase decomposition:
    (B, T) x (C, K) -> (B, T', C) channels-last.

    The (B, T, 1) layout of sinc_conv_nhc feeds ONE input channel into the
    128 vector lanes (measured ~21% MFU on v5e — the same pathology the
    space-to-depth STFT fixed, ops/stft.py:stft_s2d). Here the waveform is
    reshaped to (B, T/hop, hop) — hop samples AS CHANNELS — and each output
    phase p in [0, hop) becomes its own bank of output channels:

        y[b, j*hop + p, c] = sum_{m,i} xb[b, j+m, i] * f[c, m*hop + i - p]

    i.e. one dense stride-1 conv with M=ceil((K+hop-1)/hop) taps, hop input
    channels and hop*C output channels — identical math (zero-masked kernel
    tail), ~(K+hop)/K FLOP waste (6% at K=251, hop=16), MXU-shaped contraction
    (M*hop ~ 267) and output (hop*C = 2048).

    Measured on v5e: 3.4x SLOWER than sinc_conv_nhc (21.6 vs 6.4 ms at b64,
    hop 8/16/32 all within 6%) — XLA's strided lowering of the (B, T, 1)
    direct form already sustains ~21% MFU on this K=251 conv, and the fat
    2048-column kernel loses more to HBM weight re-reads than the lane
    utilisation gains. Kept as an opt-in (`SincConv.impl='s2d'`) documented
    negative result; the STFT's identical transform (ops/stft.py:stft_s2d)
    WINS because its dense-window conv has only 3 taps to re-read."""
    b, t = x.shape
    c, k = filters.shape
    t_out = t - k + 1
    m_taps = -(-(k + hop - 1) // hop)
    j_out = -(-t_out // hop)
    j_in = j_out + m_taps - 1                        # j_in*hop >= t always
    xp = jnp.pad(x, [(0, 0), (0, j_in * hop - t)])
    xb = xp.reshape(b, j_in, hop)
    w = s2d_phase_kernel(filters, hop)               # (M, hop, hop*C)
    out = jax.lax.conv_general_dilated(
        xb, w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=precision, preferred_element_type=jnp.float32,
    )                                                # (B, j_out, hop*C)
    return out.reshape(b, j_out * hop, c)[:, :t_out, :]


def _segment_time(x: jnp.ndarray, k: int, segments: int,
                  round_to: int = 1) -> Tuple[jnp.ndarray, int, int]:
    """Split (B, T) into ``segments`` overlapping windows stacked onto batch.

    Each window carries l_out = ceil(t_out/segments) (rounded up to
    ``round_to``) VALID-conv output positions plus the K-1 halo, so a stride-1
    VALID conv over the (B*S, L_in) stack computes exactly the same sums as
    over (B, T); the zero tail pad only feeds outputs that the caller slices
    away. Returns (segmented x, l_out, t_out)."""
    b, t = x.shape
    t_out = t - k + 1
    l_out = -(-t_out // segments)
    l_out = -(-l_out // round_to) * round_to
    l_in = l_out + k - 1
    xp = jnp.pad(x, [(0, 0), (0, (segments - 1) * l_out + l_in - t)])
    idx = np.arange(segments)[:, None] * l_out + np.arange(l_in)[None, :]
    xs = jnp.take(xp, jnp.asarray(idx), axis=1)       # (B, S, L_in)
    return xs.reshape(b * segments, l_in), l_out, t_out


def sinc_conv_nhc_seg(x: jnp.ndarray, filters: jnp.ndarray, segments: int = 2,
                      precision=None) -> jnp.ndarray:
    """sinc_conv_nhc with the time axis split into ``segments`` batched windows.

    XLA's NHC lowering of the K=251 stride-1 conv leaves throughput on the
    table at long T: splitting T into S windows and batching them moves the
    same FLOPs into a shape it tiles better. ISOLATED (sum-consumed) probe,
    v5e, 64600 samples, K=251, C=128, fwd / fwd+dW ms: b16 native 5.31/7.19
    -> seg3 3.10/5.01; b64 native 6.08/12.96 -> seg2 4.57/11.95. BUT the
    restitch reshape (B*S, l, C) -> (B, S*l, C) is a physical copy that a
    downstream conv consumer pays for (k3-consumer probe, b64 S=2: 13.8 ms vs
    7.4 native): sum-consumed micro-benchmarks hide layout costs. Rounding
    l_out to the 8-row sublane tile makes the restitch layout-compatible and
    recovers the small-batch win with the consumer attached (b16 S=3: 4.67 vs
    5.39 native; b64 still loses, 9.79) — hence round_to=8 here and the
    batch<=16-only auto policy in models/sincnet.py. Exact parity with
    sinc_conv_nhc (same VALID sums; tail-pad outputs sliced away)."""
    c = filters.shape[0]
    xs, l_out, t_out = _segment_time(x, filters.shape[1], segments, round_to=8)
    y = sinc_conv_nhc(xs, filters, precision=precision)   # (B*S, l_out, C)
    b = x.shape[0]
    return y.reshape(b, segments * l_out, c)[:, :t_out, :]


def sinc_abs_pool3_nhc_seg(x: jnp.ndarray, filters: jnp.ndarray,
                           segments: int = 3, precision=None) -> jnp.ndarray:
    """sinc_abs_pool3_nhc with per-segment epilogue (RawNet front end).

    l_out is rounded to a multiple of 24 so (a) pool groups never straddle a
    segment boundary — the max over each group sees exactly the same three
    conv outputs as the unsegmented form (exact parity; the T' % 3 tail is
    dropped by both forms) — and (b) the pooled per-segment row count
    (l_out/3) is a multiple of the 8-row sublane tile, so the restitch
    reshape is layout-compatible instead of a physical copy (see
    sinc_conv_nhc_seg). Applying abs+pool3 per segment matters: the
    segment-crossing variant (conv seg, epilogue on the restitched tensor)
    measured SLOWER than native (9.12 vs 6.42 ms b16 fwd) because the restitch
    materialises, while this form wins at b16 (fwd 4.32 vs 6.43,
    fwd+dW 10.82 vs 12.61 ms) and ties at b64 (round-4 probes)."""
    c = filters.shape[0]
    xs, l_out, t_out = _segment_time(x, filters.shape[1], segments, round_to=24)
    y = jnp.abs(sinc_conv_nhc(xs, filters, precision=precision))
    b = x.shape[0]
    y = jnp.max(y.reshape(b * segments, l_out // 3, 3, c), axis=2)
    return y.reshape(b, segments * (l_out // 3), c)[:, : t_out // 3, :]


def sinc_abs_pool3_nhc(x: jnp.ndarray, filters: jnp.ndarray,
                       precision=None) -> jnp.ndarray:
    """The RawNet front end as an NHC XLA composition:
    max_pool(|sinc_conv_nhc(x)|, 3) -> (B, T3, C). The pool is a reshape+max
    (T3 is static) rather than reduce_window.

    Round-3 measurement (v5e, 64600 samples, K=251, C=128) vs the Pallas
    sinc_fused kernel: the KERNEL wins at small batch (b8 4.4 vs 6.1 ms,
    b16 6.1 vs 6.9), this composition wins from b32 up (b32 7.8 vs 10.3,
    b64 11.5 vs 18.9, b192 29.5 vs 52.3) — the kernel's weight-resident VMEM
    tiling stops paying once the batch amortises XLA's conv setup. Parity with
    the kernel path ~2e-7. SincConv dispatches on the static batch size."""
    y = jnp.abs(sinc_conv_nhc(x, filters, precision=precision))  # (B, T', C)
    b, t_out, c = y.shape
    t3 = t_out // 3
    return jnp.max(y[:, : t3 * 3, :].reshape(b, t3, 3, c), axis=2)


def sinc_conv(x: jnp.ndarray, filters: jnp.ndarray, stride: int = 1,
              padding: str | int = 0) -> jnp.ndarray:
    """Apply the filterbank: (B, T) -> (B, C, T'). Uses XLA conv (MXU)."""
    if isinstance(padding, int):
        padding = [(padding, padding)]
    else:
        padding = padding  # 'SAME'/'VALID'
    lhs = x[:, None, :]                            # (B, 1, T)  NCW
    rhs = filters[:, None, :]                      # (C, 1, K)  OIW
    return jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(stride,), padding=padding,
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
