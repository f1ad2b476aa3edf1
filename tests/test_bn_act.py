"""BNAct (fused train-mode BN+act, ops/bn_act.py) vs plain flax
``nn.BatchNorm -> act``: forward, gradients, running-stat updates, and
checkpoint (param-tree) compatibility.

The module exists to cut the train step's BN->act HBM traffic (round-4
VERDICT item 1); these tests pin that it is a semantic no-op relative to
``nn.BatchNorm(momentum=0.9)`` at f32, and within bf16 rounding when the
trunk dtype narrows.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adfmsl.ops.bn_act import BNAct


def _plain(c, act, dtype):
    class Plain(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=dtype, name="bn")(x)
            if act == "relu":
                return nn.relu(h)
            if act == "leaky":
                return nn.leaky_relu(h, negative_slope=0.3)
            return nn.selu(h)

    return Plain()


def _fused(c, act, dtype):
    class Fused(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return BNAct(c, act=act, dtype=dtype, name="bn")(x, train=train)

    return Fused()


def _data(c=24, b=4, t=37, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(2.0 * rng.standard_normal((b, t, c)).astype(np.float32)
                       + 0.5)


@pytest.mark.parametrize("act", ["relu", "leaky", "selu"])
@pytest.mark.parametrize("train", [True, False])
def test_bn_act_matches_plain_f32(act, train):
    c = 24
    x = _data(c)
    plain, fused = _plain(c, act, jnp.float32), _fused(c, act, jnp.float32)
    v = plain.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    # param trees are byte-compatible: the plain variables drive BOTH modules
    # (checkpoint interchangeability)
    vf = fused.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vf)

    # non-trivial scale/bias/running stats so eval mode is exercised for real
    rng = np.random.default_rng(1)
    v = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape).astype(np.float32)
                              * 0.3 + 1.0), v)

    def run(m):
        y, mut = m.apply(v, x, train=train, mutable=["batch_stats"])
        return y, mut["batch_stats"]["bn"]

    y0, bs0 = run(plain)
    y1, bs1 = run(fused)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(bs1[k]), np.asarray(bs0[k]),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("act", ["relu", "selu"])
def test_bn_act_gradients_match_plain_f32(act):
    c = 16
    x = _data(c, seed=2)
    plain, fused = _plain(c, act, jnp.float32), _fused(c, act, jnp.float32)
    v = plain.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    rng = np.random.default_rng(3)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape).astype(np.float32)
                              * 0.2 + 1.0), v["params"])
    # weight the output so dy is non-uniform (exercises da/db reductions)
    w = jnp.asarray(np.random.default_rng(4).standard_normal(x.shape)
                    .astype(np.float32))

    def loss(m):
        def f(p, xx):
            y, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                           xx, train=True, mutable=["batch_stats"])
            return jnp.sum(y * w)
        return f

    g0p, g0x = jax.grad(loss(plain), argnums=(0, 1))(params, x)
    g1p, g1x = jax.grad(loss(fused), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(g1x), np.asarray(g0x),
                               rtol=2e-4, atol=2e-5)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(np.asarray(g1p["bn"][k]),
                                   np.asarray(g0p["bn"][k]),
                                   rtol=2e-4, atol=2e-5)


def test_bn_act_bf16_close_to_f32_plain():
    """bf16 trunk: the fused path's f32-affine-then-narrow contract stays
    within bf16 rounding of the plain f32 reference."""
    c = 32
    x = _data(c, seed=5)
    plain = _plain(c, "relu", jnp.float32)
    fused = _fused(c, "relu", jnp.bfloat16)
    v = plain.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    y0, _ = plain.apply(v, x, train=True, mutable=["batch_stats"])
    y1, _ = fused.apply(v, x.astype(jnp.bfloat16), train=True,
                        mutable=["batch_stats"])
    assert y1.dtype == jnp.bfloat16
    scale = max(1.0, float(jnp.abs(y0).max()))
    np.testing.assert_allclose(np.asarray(y1, dtype=np.float32),
                               np.asarray(y0), atol=3e-2 * scale)


def test_bn_act_eval_uses_running_stats_no_update():
    c = 8
    x = _data(c, seed=6)
    fused = _fused(c, "relu", jnp.float32)
    v = fused.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    y, mut = fused.apply(v, x, train=False, mutable=["batch_stats"])
    for k in ("mean", "var"):
        np.testing.assert_array_equal(np.asarray(mut["batch_stats"]["bn"][k]),
                                      np.asarray(v["batch_stats"]["bn"][k]))
