"""Pallas fused-LFCC kernel tests (interpreter mode on the CPU test platform; the
compiled path is exercised on real TPU by bench.py and the verify drives)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adfmsl.ops.lfcc import lfcc
from adfmsl.ops.pallas.lfcc_fused import lfcc_fused

RNG = np.random.default_rng(0)


def test_fused_lfcc_matches_reference_impl():
    x = jnp.asarray(RNG.standard_normal((2, 16000)).astype(np.float32))
    a = np.asarray(lfcc_fused(x, interpret=True))
    b = np.asarray(lfcc(x, impl="matmul"))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4 * np.abs(b).max())


def test_fused_lfcc_ragged_frame_count():
    # 64600 samples -> 404 frames: not a multiple of the 128-frame tile
    x = jnp.asarray(RNG.standard_normal((1, 64600)).astype(np.float32))
    a = np.asarray(lfcc_fused(x, interpret=True))
    b = np.asarray(lfcc(x, impl="matmul"))
    assert a.shape == (1, 404, 60)
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4 * np.abs(b).max())


def test_fused_lfcc_tile_invariance():
    x = jnp.asarray(RNG.standard_normal((1, 16000)).astype(np.float32))
    a = np.asarray(lfcc_fused(x, tile_frames=64, interpret=True))
    b = np.asarray(lfcc_fused(x, tile_frames=128, interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_fused_sinc_abs_pool_matches_reference():
    """Pallas fused SincConv+|.|+MaxPool3 vs the XLA composition (interpret mode)."""
    from adfmsl.ops.pallas.sinc_fused import sinc_abs_pool_fused
    from adfmsl.ops.sinc import sinc_conv_block_gemm, sinc_filters, sinc_init

    low, band = sinc_init(128)
    f = sinc_filters(jnp.asarray(low), jnp.asarray(band), 251, formula="textbook")
    x = jnp.asarray(RNG.standard_normal((2, 8000)).astype(np.float32))
    ref = jnp.abs(sinc_conv_block_gemm(x, f))            # (B, C, T')
    t3 = ref.shape[-1] // 3
    ref = jnp.max(ref[:, :, : t3 * 3].reshape(2, 128, t3, 3), axis=-1)
    ref = jnp.transpose(ref, (0, 2, 1))                  # (B, T3, C)
    got = sinc_abs_pool_fused(x, f, interpret=True)
    assert got.shape == ref.shape
    # kernel computes in bf16 (inference path); tolerance accordingly
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2 * float(jnp.abs(ref).max()))
