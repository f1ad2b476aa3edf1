"""Pretrained Wav2Vec2 loading: torch checkpoint -> injection -> msgpack round-trip
(uses a locally-saved random-init HF torch model; no network)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from adfmsl.config import make_experiment
from adfmsl.models import build_model, inject_pretrained_w2v2, save_native
from adfmsl.models.pretrained import load_native, load_w2v2_params


@pytest.fixture(scope="module")
def torch_ckpt(tmp_path_factory):
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    cfg = Wav2Vec2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, conv_dim=(32, 32), conv_kernel=(10, 3),
        conv_stride=(5, 2), feat_extract_norm="group", do_stable_layer_norm=False,
        num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16)
    tm = Wav2Vec2Model(cfg).eval()
    p = tmp_path_factory.mktemp("ckpt") / "pytorch_model.bin"
    torch.save(tm.state_dict(), str(p))
    return str(p), tm


def test_inject_pretrained_into_model(torch_ckpt):
    path, tm = torch_ckpt
    exp = make_experiment("maze7")
    exp.model.wav2vec2.model_name = "tiny"
    exp.model.wav2vec2.pretrained_path = path
    m = build_model(exp.model)
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 3200)), train=False)
    injected = inject_pretrained_w2v2(dict(v["params"]), exp.model.wav2vec2)
    # loaded weights differ from the random init
    a = np.asarray(v["params"]["wav2vec2"]["feature_projection"]["kernel"])
    b = np.asarray(injected["wav2vec2"]["feature_projection"]["kernel"])
    assert np.abs(a - b).max() > 1e-3
    # and match the torch source exactly
    ref = tm.state_dict()["feature_projection.projection.weight"].numpy().T
    np.testing.assert_allclose(b, ref, atol=1e-6)


def test_inject_missing_file_behaviour():
    exp = make_experiment("maze7")
    exp.model.wav2vec2.model_name = "tiny"
    exp.model.wav2vec2.pretrained_path = "/nope/x.bin"
    m = build_model(exp.model)
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 3200)), train=False)
    # lenient: warn + keep random init
    out = inject_pretrained_w2v2(dict(v["params"]), exp.model.wav2vec2)
    assert out is not None
    # strict: raise
    exp.model.wav2vec2.require_pretrained = True
    with pytest.raises(FileNotFoundError):
        inject_pretrained_w2v2(dict(v["params"]), exp.model.wav2vec2)


def test_msgpack_roundtrip_and_convert_cli(torch_ckpt, tmp_path):
    path, _ = torch_ckpt
    from adfmsl.cli.convert import main

    out = str(tmp_path / "w2v2.msgpack")
    rc = main(["--torch_ckpt", path, "--arch", "tiny", "--out", out, "--verify"])
    assert rc == 0
    exp = make_experiment("maze7")
    exp.model.wav2vec2.model_name = "tiny"
    loaded = load_w2v2_params(out, exp.model.wav2vec2)
    direct = load_w2v2_params(path, exp.model.wav2vec2)
    la = jax.tree_util.tree_leaves(loaded)
    lb = jax.tree_util.tree_leaves(direct)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
