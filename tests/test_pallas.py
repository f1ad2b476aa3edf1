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
