"""Numerical parity of the native Flax Wav2Vec2 against HF's torch implementation
(random-init tiny config — no network; SURVEY.md 7 lists W2V2 parity as the top risk)."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from adfmsl.models.w2v2 import W2V2Arch, Wav2Vec2Encoder, port_hf_state_dict


def _tiny_pair(feat_norm="group", stable_ln=False):
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    cfg = Wav2Vec2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, conv_dim=(32, 32), conv_kernel=(10, 3),
        conv_stride=(5, 2), feat_extract_norm=feat_norm,
        do_stable_layer_norm=stable_ln, num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
    )
    tm = Wav2Vec2Model(cfg).eval()
    arch = W2V2Arch(hidden_size=64, num_layers=2, num_heads=2, intermediate_size=128,
                    conv_dim=(32, 32), conv_kernel=(10, 3), conv_stride=(5, 2),
                    feat_extract_norm=feat_norm, do_stable_layer_norm=stable_ln)
    params = port_hf_state_dict({k: v.numpy() for k, v in tm.state_dict().items()},
                                arch)
    return tm, Wav2Vec2Encoder(arch=arch, normalize_input=False), params


@pytest.mark.parametrize("feat_norm,stable_ln", [("group", False), ("layer", True)])
def test_w2v2_matches_hf_torch(feat_norm, stable_ln):
    tm, enc, params = _tiny_pair(feat_norm, stable_ln)
    x = np.random.default_rng(0).standard_normal((2, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).last_hidden_state.numpy()
    got = np.asarray(enc.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_w2v2_hidden_states_taps():
    tm, enc, params = _tiny_pair()
    x = np.random.default_rng(1).standard_normal((1, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), output_hidden_states=True).hidden_states
    _, hs = enc.apply({"params": params}, jnp.asarray(x), output_hidden_states=True)
    assert len(hs) == len(ref) == 3
    for mine, theirs in zip(hs, ref):
        np.testing.assert_allclose(np.asarray(mine), theirs.numpy(), atol=5e-5)


def test_w2v2_input_normalisation_matches_processor_semantics():
    """normalize_input reproduces Wav2Vec2Processor's zero-mean/unit-var, on device
    (replacing the GPU->CPU round trip, maze2.py:100-115)."""
    _, enc, params = _tiny_pair()
    x = np.random.default_rng(2).standard_normal((2, 1600)).astype(np.float32) * 7 + 3
    xn = (x - x.mean(axis=1, keepdims=True)) / np.sqrt(x.var(axis=1, keepdims=True) + 1e-7)
    enc_norm = Wav2Vec2Encoder(arch=enc.arch, normalize_input=True)
    a = np.asarray(enc_norm.apply({"params": params}, jnp.asarray(x)))
    b = np.asarray(enc.apply({"params": params}, jnp.asarray(xn)))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_w2v2_full_base_arch_parity():
    """Full base-960h architecture (12 layers, 7-conv group-norm stack, 768 hidden)
    at random init: exactly where f32 drift compounds (VERDICT round-1 weak #7).
    One short clip keeps the 95M-param torch CPU forward fast."""
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(0)
    cfg = Wav2Vec2Config()                      # HF defaults == base-960h arch
    tm = Wav2Vec2Model(cfg).eval()
    arch = W2V2Arch.base()
    params = port_hf_state_dict({k: v.numpy() for k, v in tm.state_dict().items()},
                                arch)
    x = np.random.default_rng(3).standard_normal((2, 3200)).astype(np.float32)
    with torch.no_grad():
        out = tm(torch.from_numpy(x), output_hidden_states=True)
    enc = Wav2Vec2Encoder(arch=arch, normalize_input=False)
    got, hs = enc.apply({"params": params}, jnp.asarray(x),
                        output_hidden_states=True)
    ref = out.last_hidden_state.numpy()
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4 * max(scale, 1.0))
    assert len(hs) == len(out.hidden_states) == 13
    # the maze6 fusion taps (0, 6, 12) must match at depth too
    for i in (0, 6, 12):
        t_ref = out.hidden_states[i].numpy()
        np.testing.assert_allclose(np.asarray(hs[i]), t_ref,
                                   atol=2e-4 * max(np.abs(t_ref).max(), 1.0))


@pytest.mark.slow
def test_remat_layers_same_params_and_outputs():
    """remat_layers=True must change neither the param tree (ports stay
    compatible) nor forward numerics — only backward memory behavior."""
    import jax

    arch = W2V2Arch.tiny()
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 4000)).astype(np.float32))
    enc = Wav2Vec2Encoder(arch=arch)
    enc_r = Wav2Vec2Encoder(arch=arch, remat_layers=True)
    v = enc.init({"params": jax.random.PRNGKey(0)}, x)
    v_r = enc_r.init({"params": jax.random.PRNGKey(0)}, x)
    assert (jax.tree_util.tree_structure(v["params"])
            == jax.tree_util.tree_structure(v_r["params"]))
    out = enc.apply(v, x)
    out_r = enc_r.apply(v, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_r))

    # gradients flow through the checkpointed layers
    g = jax.grad(lambda p: enc_r.apply({"params": p}, x, train=False).sum())(
        v["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(a)).all() for a in flat)
