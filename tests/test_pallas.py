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


# ---------------------------------------------------------------------------
# Fused eval SE-ResBlock trunk kernel (ops/pallas/resblock_fused.py)
# ---------------------------------------------------------------------------

def _rand_block(cin, cout, first, skip):
    pre = None if first else jnp.asarray(
        RNG.standard_normal((2, cin)).astype(np.float32) * 0.1
        + np.array([[1.0], [0.0]], np.float32))
    w1 = jnp.asarray(RNG.standard_normal((3, cin, cout)).astype(np.float32) * .05)
    b1 = jnp.asarray(RNG.standard_normal((cout,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(RNG.standard_normal((3, cout, cout)).astype(np.float32) * .05)
    bt = jnp.asarray(RNG.standard_normal((cout,)).astype(np.float32) * 0.1)
    skw = (jnp.asarray(RNG.standard_normal((cin, cout)).astype(np.float32) * .1)
           if skip else None)
    return pre, w1, b1, w2, bt, skw


@pytest.mark.parametrize("shape,first,skip", [
    ((2, 100, 128, 128), True, False),     # stack head, identity skip
    ((2, 300, 128, 128), False, False),    # ragged T vs the 64-row tile
    ((1, 77, 128, 256), False, True),      # channel change -> 1x1 skip
])
def test_fused_resblock_matches_xla_reference(shape, first, skip):
    from adfmsl.ops.pallas.resblock_fused import (resblock_eval_fused,
                                                  resblock_eval_reference)

    b, t, cin, cout = shape
    x = jnp.asarray(RNG.standard_normal((b, t, cin)).astype(np.float32))
    args = _rand_block(cin, cout, first, skip)
    y, s = resblock_eval_fused(x, *args, rows=64, interpret=True)
    yr, sr = resblock_eval_reference(x, *args)
    assert y.shape == yr.shape and s.shape == sr.shape
    scale = float(jnp.abs(yr).max())
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(yr),
                               rtol=2e-2, atol=2e-2 * scale)
    np.testing.assert_allclose(np.asarray(s), np.asarray(sr), rtol=2e-2,
                               atol=2e-2 * float(jnp.abs(sr).max()))


def test_fused_resblock_tile_invariance():
    from adfmsl.ops.pallas.resblock_fused import resblock_eval_fused

    x = jnp.asarray(RNG.standard_normal((1, 200, 128)).astype(np.float32))
    args = _rand_block(128, 128, False, False)
    a, sa = resblock_eval_fused(x, *args, rows=48, interpret=True)
    b, sb = resblock_eval_fused(x, *args, rows=128, interpret=True)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), rtol=1e-4,
                               atol=1e-4)


def test_fused_trunk_model_parity_and_checkpoint_structure():
    """maze5 with extra.fused_eval_trunk: same scores as the plain eval path on
    plain-trained variables (bf16 tolerance), and an IDENTICAL variable tree
    when init itself runs fused (checkpoint interchangeability)."""
    import jax

    from adfmsl.config import make_experiment
    from adfmsl.models import build_model

    exp = make_experiment("maze5")
    exp.data.cut = 6000
    model = build_model(exp.model)
    x = jnp.asarray(RNG.standard_normal((2, 6000)).astype(np.float32))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    # non-trivial BN running stats so the affine folding is exercised
    stats = jax.tree.map(
        lambda a: jnp.abs(jnp.asarray(
            RNG.standard_normal(a.shape).astype(np.float32) * 0.3)) + 0.1,
        v["batch_stats"])
    v = {**v, "batch_stats": stats}
    plain = model.apply(v, x, train=False)

    exp2 = make_experiment("maze5")
    exp2.data.cut = 6000
    exp2.model.extra["fused_eval_trunk"] = True
    fused_model = build_model(exp2.model)
    fused = fused_model.apply(v, x, train=False)
    a = np.asarray(plain["scores"], np.float32)
    b = np.asarray(fused["scores"], np.float32)
    np.testing.assert_allclose(a, b, rtol=0, atol=3e-2 * np.abs(a).max())

    v_fused_init = fused_model.init({"params": jax.random.PRNGKey(0)}, x,
                                    train=False)
    assert jax.tree_util.tree_structure(v) == \
        jax.tree_util.tree_structure(v_fused_init)
    # train step still runs on the same variables (fused path is eval-only)
    out_t = fused_model.apply(v, x, train=True, rngs={
        "dropout": jax.random.PRNGKey(1),
        "specaugment": jax.random.PRNGKey(2)}, mutable=["batch_stats"])[0]
    assert np.isfinite(np.asarray(out_t["logits"])).all()


def test_fused_trunk_rawnet_parity():
    """main (RawNet) with extra.fused_eval_trunk: folded bf16 blocks vs the
    plain f32 block path on shared variables."""
    import jax

    from adfmsl.config import make_experiment
    from adfmsl.models import build_model

    # local rng: the shared module RNG made this test's inputs depend on which
    # tests ran before it (an order-dependent near-tolerance flake, round 5)
    rng = np.random.default_rng(52)
    exp = make_experiment("main")
    exp.data.cut = 9000
    model = build_model(exp.model)
    x = jnp.asarray(rng.standard_normal((2, 9000)).astype(np.float32))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    stats = jax.tree.map(
        lambda a: jnp.abs(jnp.asarray(
            rng.standard_normal(a.shape).astype(np.float32) * 0.3)) + 0.1,
        v["batch_stats"])
    v = {**v, "batch_stats": stats}
    plain = model.apply(v, x, train=False)

    exp2 = make_experiment("main")
    exp2.data.cut = 9000
    exp2.model.extra["fused_eval_trunk"] = True
    fused_model = build_model(exp2.model)
    fused = fused_model.apply(v, x, train=False)
    # compare LOGITS: both trunks run bf16 (main's default dtype) and the
    # folded path only re-associates the BN affines, so bf16-grade tolerance
    # applies there; log-softmax SCORES amplify near-tied logits arbitrarily
    a = np.asarray(plain["logits"], np.float32)
    b = np.asarray(fused["logits"], np.float32)
    np.testing.assert_allclose(a, b, rtol=0, atol=3e-2 * max(1.0, np.abs(a).max()))
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        fused_model.init({"params": jax.random.PRNGKey(0)}, x, train=False))


def test_bn_relu_bwd_matches_autodiff():
    """bn_relu_train's two-pass Pallas backward must reproduce jax.grad of the
    plain train-mode BN+relu composition (f32 CPU interpreter)."""
    import jax
    import jax.numpy as jnp

    from adfmsl.ops.pallas.bn_relu_bwd import bn_relu_train

    rng = np.random.default_rng(17)
    B, T, C = 2, 700, 128          # T*B=1400: not a multiple of the row tile
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, C).astype(np.float32))
    beta = jnp.asarray(rng.uniform(-0.3, 0.3, C).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))

    def ref(x, g, b):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=(0, 1))
        var = jnp.mean(jnp.square(xf), axis=(0, 1)) - jnp.square(mu)
        y = g * (xf - mu) * jax.lax.rsqrt(var + 1e-5) + b
        return jnp.maximum(y, 0.0)

    y_ref, vjp_ref = jax.vjp(ref, x, gamma, beta)
    y_got, vjp_got = jax.vjp(
        lambda x, g, b: bn_relu_train(x, g, b, 1e-5, True), x, gamma, beta)
    np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)
    for a, b_ in zip(vjp_got(ct), vjp_ref(ct)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-3, rtol=2e-3)
