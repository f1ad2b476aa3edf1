"""recompute_dropout / RDropout (ops/dropout.py): bit-identity with flax
``nn.Dropout`` on the same rng fold, gradient correctness (the regenerated
backward mask equals the forward mask), and the ResBlockSE wiring."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from adfmsl.ops.dropout import RDropout, recompute_dropout


class _Plain(nn.Module):
    rate: float = 0.3

    @nn.compact
    def __call__(self, x, train=False):
        return nn.Dropout(self.rate, deterministic=not train)(x)


class _Recompute(nn.Module):
    rate: float = 0.3

    @nn.compact
    def __call__(self, x, train=False):
        # name pins the make_rng fold path to nn.Dropout's auto name
        return RDropout(self.rate, name="Dropout_0")(x, deterministic=not train)


def _x(shape=(4, 50, 16), seed=0):
    return jnp.asarray(np.random.default_rng(seed)
                       .standard_normal(shape).astype(np.float32))


def test_bit_identical_to_flax_dropout():
    x = _x()
    for seed in (0, 1, 7):
        rngs = {"dropout": jax.random.PRNGKey(seed)}
        y0 = _Plain().apply({}, x, train=True, rngs=rngs)
        y1 = _Recompute().apply({}, x, train=True, rngs=rngs)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_backward_mask_matches_forward():
    x = _x(seed=3)
    rngs = {"dropout": jax.random.PRNGKey(5)}
    w = jnp.asarray(np.random.default_rng(4)
                    .standard_normal(x.shape).astype(np.float32))

    def loss(m, xx):
        return jnp.sum(m.apply({}, xx, train=True, rngs=rngs) * w)

    g0 = jax.grad(lambda xx: loss(_Plain(), xx))(x)
    g1 = jax.grad(lambda xx: loss(_Recompute(), xx))(x)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


def test_deterministic_and_edge_rates():
    x = _x(seed=6)
    rngs = {"dropout": jax.random.PRNGKey(0)}
    y = _Recompute().apply({}, x, train=False, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(recompute_dropout(x, jax.random.PRNGKey(0), 0.0)),
        np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(recompute_dropout(x, jax.random.PRNGKey(0), 1.0)),
        np.zeros_like(np.asarray(x)))


def test_resblock_trajectory_unchanged():
    """The ResBlockSE 'tpu' wiring keeps the exact pre-swap training
    trajectory: RDropout(name='Dropout_0') draws the same stream the flax
    module did, so outputs equal a manual plain-dropout twin."""
    from adfmsl.models.blocks import ResBlockSE

    x = _x((2, 60, 8), seed=8)
    blk = ResBlockSE(8, 8, dropout_rate=0.3, semantics="tpu", first=True)
    v = blk.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    rngs = {"dropout": jax.random.PRNGKey(9)}
    y, _ = blk.apply(v, x, train=True, rngs=rngs, mutable=["batch_stats"])

    class PlainTwin(nn.Module):
        @nn.compact
        def __call__(self, h, train=True):
            h1 = nn.Conv(8, (3,), padding="SAME", name="conv1")(h)
            h1 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              name="bn2")(h1)
            h1 = nn.relu(h1)
            h1 = nn.Dropout(0.3, deterministic=not train,
                            name="Dropout_0")(h1)
            h1 = nn.Conv(8, (3,), padding="SAME", name="conv2")(h1)
            out = h1 + h
            # SE gate twin (blocks.py 'tpu' tail)
            from adfmsl.models.blocks import SEBlock
            return SEBlock(8, name="se")(out)

    twin = PlainTwin()
    vt = {"params": {k: v["params"][k] for k in
                     ("conv1", "bn2", "conv2", "se")},
          "batch_stats": {"bn2": v["batch_stats"]["bn2"]}}
    yt, _ = twin.apply(vt, x, train=True, rngs=rngs, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(yt),
                               rtol=1e-6, atol=1e-6)
