"""Shape/contract tests for the full model zoo (tiny Wav2Vec2, short clips — these run
on the forced-CPU test platform)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adfmsl.config import ALL_MODELS, EXTRA_MODELS, make_experiment
from adfmsl.models import build_model, model_registry

RNGS = {
    "dropout": jax.random.PRNGKey(1),
    "specaugment": jax.random.PRNGKey(2),
    "lsa": jax.random.PRNGKey(3),
}
X = jnp.asarray(np.random.default_rng(0).standard_normal((2, 6000)).astype(np.float32))
LABELS = jnp.asarray(np.array([0, 1], dtype=np.int32))


def _build(name):
    exp = make_experiment(name)
    exp.model.wav2vec2.model_name = "tiny"   # no-network test arch
    m = build_model(exp.model)
    variables = m.init({"params": jax.random.PRNGKey(0)}, X, train=False)
    return exp, m, variables


def test_registry_covers_all_models():
    for name in ALL_MODELS + EXTRA_MODELS:
        assert name in model_registry, name


@pytest.mark.parametrize("name", ALL_MODELS + EXTRA_MODELS)
def test_forward_contract(name):
    exp, m, variables = _build(name)
    out = m.apply(variables, X, labels=LABELS, train=False)
    assert out["logits"].shape == (2, 2)
    assert out["scores"].shape == (2,)
    assert np.isfinite(np.asarray(out["logits"])).all()
    is_fmsl = name.endswith("_fmsl")
    mode = exp.model.fmsl.mode if is_fmsl else None
    # train-mode forward: FMSL replace/integrated models must self-report loss
    out_t, _ = m.apply(variables, X, labels=LABELS, train=True, rngs=RNGS,
                       mutable=["batch_stats"])
    if is_fmsl and mode in ("replace", "integrated"):
        assert "loss" in out_t and np.isfinite(float(out_t["loss"]))
    else:
        assert "loss" not in out_t


def test_tpu_block_identity_skip_is_bn_free():
    """Regression (round 3): the 'tpu' block's identity skip must be RAW x, not
    the bn1+relu pre-activation — routing it through BN injects the train/eval
    statistics gap into every block's skip path (trains fine, eval-mode dev acc
    collapses to chance on the e2e fixture). With the conv kernels zeroed and no
    SE, an identity block must return x EXACTLY in both modes, independent of
    the (unconverged, init-state) BN running statistics."""
    from adfmsl.models.blocks import ResBlockSE

    blk = ResBlockSE(16, 16, stride=1, dropout_rate=0.0, first=False,
                     use_se=False, semantics="tpu")
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 32, 16)).astype(np.float32))          # negatives exercise the relu
    variables = blk.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    params = jax.tree_util.tree_map(
        lambda a: jnp.zeros_like(a) if a.ndim >= 2 else a, variables["params"])
    variables = {**variables, "params": params}
    out_eval = blk.apply(variables, x, train=False)
    out_train, _ = blk.apply(variables, x, train=True,
                             rngs={"dropout": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_train), np.asarray(x), atol=1e-6)


def test_tpu_block_bf16_bn_keeps_f32_stats():
    """The trunk-width BN contract (round 3): with a bf16 trunk, BatchNorm
    emits bf16 activations but its batch statistics must stay float32 — both
    the stored running stats and the per-batch update (flax computes stats in
    f32 regardless of the normalize dtype). The update itself must match the
    f32-dtype module's bit-for-bit: stats see the same f32 input either way."""
    from adfmsl.models.blocks import ResBlockSE

    x = jnp.asarray(np.random.default_rng(7).standard_normal(
        (4, 64, 16)).astype(np.float32))
    outs, stats = {}, {}
    for tag, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        blk = ResBlockSE(16, 16, stride=1, dropout_rate=0.0, first=False,
                         use_se=True, semantics="tpu", dtype=dt)
        variables = blk.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        out, mut = blk.apply(variables, x, train=True,
                             rngs={"dropout": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])
        outs[tag] = np.asarray(out, dtype=np.float32)
        stats[tag] = mut["batch_stats"]

    for leaf in jax.tree_util.tree_leaves(stats["bf16"]):
        assert leaf.dtype == jnp.float32, f"running stat leaked to {leaf.dtype}"
    # bn1 normalizes the raw f32 input in both modules -> identical stats
    np.testing.assert_array_equal(
        np.asarray(stats["f32"]["bn1"]["mean"]),
        np.asarray(stats["bf16"]["bn1"]["mean"]))
    # downstream stats see bf16-rounded convs; agreement within bf16 epsilon
    np.testing.assert_allclose(
        np.asarray(stats["f32"]["bn2"]["mean"]),
        np.asarray(stats["bf16"]["bn2"]["mean"]), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(outs["f32"], outs["bf16"], rtol=5e-2, atol=5e-2)


def test_se_gated_block_output_stays_at_trunk_width():
    """Regression (round 4): the plain SEBlock multiplied the bf16 trunk by
    the f32 sigmoid gate with no cast, promoting every SE block output (and
    its backward) to f32 — double HBM traffic on the (B,T,C) tensors. The
    gate must be cast to the trunk dtype before the multiply (round-3 rule,
    already enforced in the fused-eval path and the RawNet attention)."""
    from adfmsl.models.blocks import ResBlockSE, SEBlock

    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 64, 16)).astype(np.float32))
    for dt in (jnp.bfloat16, jnp.float32):
        # blocks receive trunk-dtype inputs in the real models (mazes.py:150)
        xb = x.astype(dt)
        blk = ResBlockSE(16, 16, stride=1, dropout_rate=0.0, first=False,
                         use_se=True, semantics="tpu", dtype=dt)
        variables = blk.init({"params": jax.random.PRNGKey(0)}, xb, train=False)
        out, _ = blk.apply(variables, xb, train=True,
                           rngs={"dropout": jax.random.PRNGKey(1)},
                           mutable=["batch_stats"])
        assert out.dtype == dt, f"SE block output promoted to {out.dtype}"
    # the bare module too: bf16 in -> bf16 out
    se = SEBlock(16)
    v = se.init(jax.random.PRNGKey(0), x.astype(jnp.bfloat16))
    assert se.apply(v, x.astype(jnp.bfloat16)).dtype == jnp.bfloat16


def test_tpu_block_strided_skip_survives_bn_saturation():
    """Regression (round 3), the strided-block variant of the same defect: the
    downsample conv must read RAW x, not relu(bn1(x)). With bn1's running mean
    pushed far positive, eval-mode relu(bn1(x)) is identically zero — the conv
    branch emits a constant — so a block whose skip ALSO read the activation
    would map every input to the same output. The BN-free skip must keep the
    block input-sensitive."""
    from adfmsl.models.blocks import ResBlockSE

    blk = ResBlockSE(16, 16, stride=2, dropout_rate=0.0, first=False,
                     use_se=False, semantics="tpu")
    rng = np.random.default_rng(4)
    x1 = jnp.asarray(rng.standard_normal((2, 32, 16)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((2, 32, 16)).astype(np.float32))
    variables = blk.init({"params": jax.random.PRNGKey(0)}, x1, train=False)
    stats = jax.tree_util.tree_map(lambda a: a, variables["batch_stats"])
    stats["bn1"]["mean"] = stats["bn1"]["mean"] + 1e3   # saturate the relu
    variables = {**variables, "batch_stats": stats}
    o1 = np.asarray(blk.apply(variables, x1, train=False))
    o2 = np.asarray(blk.apply(variables, x2, train=False))
    assert np.abs(o1 - o2).max() > 1e-3


def test_score_semantics_log_softmax_vs_logit():
    _, m5, v5 = _build("maze5")
    out = m5.apply(v5, X, train=False)
    lp = jax.nn.log_softmax(out["logits"], axis=-1)[:, 1]
    np.testing.assert_allclose(np.asarray(out["scores"]), np.asarray(lp), atol=1e-6)
    assert (np.asarray(out["scores"]) <= 0).all()   # log-probs

    _, m6, v6 = _build("maze6")
    out6 = m6.apply(v6, X, train=False)
    np.testing.assert_allclose(np.asarray(out6["scores"]),
                               np.asarray(out6["logits"][:, 1]), atol=1e-6)


@pytest.mark.slow
def test_grad_flows_and_w2v2_frozen():
    exp, m, variables = _build("maze7")

    def loss_fn(params):
        out = m.apply({**variables, "params": params}, X, labels=LABELS, train=False)
        return jnp.mean(out["logits"] ** 2)

    g = jax.grad(loss_fn)(variables["params"])
    # frozen w2v2: stop_gradient => zero grads
    w2v2_leaves = jax.tree_util.tree_leaves(g["wav2vec2"])
    assert all(float(jnp.abs(l).max()) == 0.0 for l in w2v2_leaves)
    head_leaves = jax.tree_util.tree_leaves(g["fc2"])
    assert any(float(jnp.abs(l).max()) > 0 for l in head_leaves)


def test_maze8_has_conv_fmsl_and_fmsl_variant_does_not():
    _, _, v8 = _build("maze8")
    assert "conv_fmsl" in v8["params"]
    _, _, v8f = _build("maze8_fmsl")
    assert "conv_fmsl" not in v8f["params"]
    assert "fmsl" in v8f["params"]


def test_specaugment_only_in_train_mode():
    exp, m, variables = _build("maze4")
    assert exp.model.spec_augment.enabled
    out_eval1 = m.apply(variables, X, train=False)
    out_eval2 = m.apply(variables, X, train=False)
    np.testing.assert_array_equal(np.asarray(out_eval1["logits"]),
                                  np.asarray(out_eval2["logits"]))


def test_fmsl_param_count_structure():
    """FMSL head: prototypes (P,D), class weight (2,D), scalar temperature
    (fmsl_advanced.py:103-150)."""
    _, _, v = _build("maze6_fmsl")   # drifted: 8 prototypes, dim 512
    p = v["params"]["fmsl"]
    assert p["prototypes"].shape == (8, 512)
    assert p["weight"].shape == (2, 512)
    assert p["temperature"].shape == ()


def test_lcnn1d_forward():
    exp, m, variables = _build("lcnn1d_lfcc")
    out = m.apply(variables, X, train=False)
    assert out["logits"].shape == (2, 2)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_rawnet_fused_eval_frontend_through_model():
    """fused_eval_frontend must actually route the RawNet front end through the
    Pallas fused kernel (interpret mode on the CPU test platform): the SincConv
    module output is bit-identical to calling the kernel directly, and the full
    model's eval logits match the XLA composition within bf16 tolerance."""
    from adfmsl.models.sincnet import SincConv
    from adfmsl.ops.pallas.sinc_fused import sinc_abs_pool_fused
    from adfmsl.ops.sinc import sinc_filters

    exp_ref, m_ref, variables = _build("main")
    exp_fused = make_experiment("main")
    exp_fused.model.extra["fused_eval_frontend"] = True
    m_fused = build_model(exp_fused.model)

    out_ref = m_ref.apply(variables, X, train=False)
    out_fused = m_fused.apply(variables, X, train=False)
    scale = float(np.abs(np.asarray(out_ref["logits"])).max())
    np.testing.assert_allclose(np.asarray(out_fused["logits"]),
                               np.asarray(out_ref["logits"]),
                               atol=0.1 * scale + 1e-4)

    # bit-for-bit: the module path IS the kernel path
    arch = exp_ref.model.architecture
    sp = variables["params"]["encoder"]["sinc"]
    sc = SincConv(arch.filts[0], arch.first_conv, arch.sample_rate,
                  formula=arch.sinc_formula, post="abs_pool3", fused_eval=True)
    got = sc.apply({"params": sp}, X, train=False)
    filt = sinc_filters(sp["low_hz"], sp["band_hz"], arch.first_conv,
                        arch.sample_rate, 50.0, 50.0, arch.sinc_formula)
    direct = sinc_abs_pool_fused(X, filt, interpret=True)
    assert got.shape == direct.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(direct))

    # train mode must stay on the differentiable XLA path (identical either way)
    out_t1, _ = m_fused.apply(variables, X, train=True, rngs=RNGS,
                              mutable=["batch_stats"])
    out_t2, _ = m_ref.apply(variables, X, train=True, rngs=RNGS,
                            mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(out_t1["logits"]),
                                  np.asarray(out_t2["logits"]))

    # above fused_max_batch the dispatch must fall to the NHC XLA composition
    # (the kernel loses there, ops/sinc.py:sinc_abs_pool3_nhc) — outputs then
    # match the non-fused module path EXACTLY, not just within kernel tolerance
    xb = jnp.tile(X, (10, 1))                       # B=20 > fused_max_batch=16
    got_big = sc.apply({"params": sp}, xb, train=False)
    plain = SincConv(arch.filts[0], arch.first_conv, arch.sample_rate,
                     formula=arch.sinc_formula, post="abs_pool3",
                     fused_eval=False)
    want_big = plain.apply({"params": sp}, xb, train=False)
    np.testing.assert_array_equal(np.asarray(got_big), np.asarray(want_big))


@pytest.mark.slow
def test_rawnet_fused_train_frontend_gradients():
    """fused_train_frontend routes the TRAINING forward through the Pallas
    kernel via its custom VJP (backward = XLA recompute). Op level: the VJP is
    literally jax.vjp of the XLA composition, so gradients match it exactly.
    Model level: loss and grads stay finite and close to the XLA path."""
    import jax
    import jax.flatten_util

    from adfmsl.ops.pallas.sinc_fused import _xla_frontend, sinc_abs_pool
    from adfmsl.ops.sinc import sinc_filters, sinc_init

    low, band = sinc_init(128)
    low, band = jnp.asarray(low), jnp.asarray(band)

    def loss_fused(low, band, x):
        f = sinc_filters(low, band, 251)
        return jnp.sum(jnp.tanh(sinc_abs_pool(x, f, True)))

    def loss_xla(low, band, x):
        f = sinc_filters(low, band, 251)
        return jnp.sum(jnp.tanh(_xla_frontend(x, f)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(low, band, X)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(low, band, X)
    for gf, gx, name in zip(g_fused, g_xla, ("low_hz", "band_hz", "x")):
        gf, gx = np.asarray(gf), np.asarray(gx)
        assert np.all(np.isfinite(gf)), name
        # the cotangent entering the VJP differs only through tanh'(fused fwd)
        # vs tanh'(xla fwd) — bf16-level forward difference
        scale = max(float(np.abs(gx).max()), 1e-6)
        np.testing.assert_allclose(gf, gx, atol=5e-2 * scale, err_msg=name)

    # through the full model: training step produces finite, close gradients
    exp_ref, m_ref, variables = _build("main")
    exp_fused = make_experiment("main")
    exp_fused.model.extra["fused_train_frontend"] = True
    m_fused = build_model(exp_fused.model)
    labels = jnp.asarray([0, 1], dtype=jnp.int32)

    def model_loss(model):
        def fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                X, train=True, rngs=RNGS, mutable=["batch_stats"])
            logits = out["logits"]
            return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(2), labels])
        return fn

    lf, gf = jax.value_and_grad(model_loss(m_fused))(variables["params"])
    lx, gx = jax.value_and_grad(model_loss(m_ref))(variables["params"])
    assert np.isfinite(float(lf))
    np.testing.assert_allclose(float(lf), float(lx), rtol=0.05)
    flat_f = jax.flatten_util.ravel_pytree(gf)[0]
    flat_x = jax.flatten_util.ravel_pytree(gx)[0]
    assert np.all(np.isfinite(np.asarray(flat_f)))
    cos = float(jnp.vdot(flat_f, flat_x)
                / (jnp.linalg.norm(flat_f) * jnp.linalg.norm(flat_x) + 1e-12))
    # The VJP itself is exact (op-level check above); model-level divergence is
    # purely the bf16 kernel forward feeding BN batch stats + a GRU on a
    # 2-sample batch (measured ~0.94 cosine). A wrong VJP lands near 0.
    assert cos > 0.85, f"gradient cosine {cos}"
