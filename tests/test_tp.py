"""Tensor-parallel Wav2Vec2 sharding + mesh-sharded evaluation tests
(8 virtual CPU devices)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from adfmsl.config import MeshConfig, make_experiment
from adfmsl.data import AsvspoofDataset, DataLoader, parse_protocol
from adfmsl.evaluation import produce_scores
from adfmsl.models import build_model
from adfmsl.parallel import (
    make_mesh,
    replicate,
    shard_params_tp,
    w2v2_param_specs,
)
from adfmsl.train import TrainState, make_eval_step, make_optimizer


def _w2v2_model():
    exp = make_experiment("maze7")
    exp.model.wav2vec2.model_name = "tiny"
    exp.data.cut = 3200
    model = build_model(exp.model)
    x = jnp.zeros((4, exp.data.cut))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return exp, model, variables


def test_w2v2_param_specs_structure():
    _, _, variables = _w2v2_model()
    specs = w2v2_param_specs(variables["params"])
    w = specs["wav2vec2"]["layers_0"]
    assert w["attention"]["query"]["kernel"] == P(None, "model")
    assert w["attention"]["out"]["kernel"] == P("model")
    assert w["intermediate_dense"]["kernel"] == P(None, "model")
    assert w["output_dense"]["kernel"] == P("model")
    assert w["layer_norm"]["scale"] == P()
    # non-w2v2 params replicate
    assert specs["fc2"]["kernel"] == P()


def test_tp_forward_matches_replicated():
    """2-way tensor parallel over the model axis must reproduce the single-device
    forward (XLA inserts the collectives)."""
    exp, model, variables = _w2v2_model()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, exp.data.cut))
                    .astype(np.float32))

    ref = model.apply(variables, x, train=False)["logits"]

    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    params_tp = shard_params_tp(mesh, variables["params"])
    bs = {} if variables.get("batch_stats") is None else variables["batch_stats"]
    bs_r = replicate(mesh, bs)

    @jax.jit
    def fwd(p, bs, x):
        return model.apply({"params": p, "batch_stats": bs}, x,
                           train=False)["logits"]

    with mesh:
        got = fwd(params_tp, bs_r, x)
    # reduction-order noise through LayerNorm chains; wiring bugs give O(1) errors
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)


def test_mesh_sharded_eval(fixture_dir):
    """produce_scores(mesh=...) shards eval batches across the data axis and keeps
    exact utterance count/order."""
    exp = make_experiment("maze5")
    exp.data.cut = 3200
    model = build_model(exp.model)
    x = jnp.zeros((4, exp.data.cut))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    tx, _ = make_optimizer(exp, 1)
    state = TrainState.create(model.apply, variables["params"],
                              variables.get("batch_stats"), tx)
    proto = parse_protocol(fixture_dir["eval"]["protocol"])
    ds = AsvspoofDataset(proto, fixture_dir["eval"]["audio_dir"], cut=exp.data.cut)
    loader = DataLoader(ds, batch_size=6, shuffle=False, drop_last=False)

    res_plain = produce_scores(state, loader, make_eval_step(exp))

    mesh = make_mesh(MeshConfig())
    state_r = state.replace(params=replicate(mesh, state.params),
                            batch_stats=replicate(mesh, state.batch_stats),
                            opt_state=replicate(mesh, state.opt_state))
    loader2 = DataLoader(ds, batch_size=6, shuffle=False, drop_last=False)
    res_mesh = produce_scores(state_r, loader2, make_eval_step(exp), mesh=mesh)

    assert res_mesh.utt_ids == res_plain.utt_ids == proto.utt_ids
    np.testing.assert_allclose(res_mesh.scores, res_plain.scores, atol=1e-4)


@pytest.mark.slow
def test_tp_forward_matches_replicated_full_depth():
    """VERDICT r4 #6: the toy-depth test above can hide depth/width-dependent
    sharding-rule bugs. This runs the REAL w2v2-base architecture — 12 encoder
    layers, 768 hidden, 12 heads, group-norm conv extractor (random init; zero
    egress) — 2-way TP x 4-way DP vs the replicated single-device forward."""
    exp = make_experiment("maze7")
    assert exp.model.wav2vec2.model_name == "facebook/wav2vec2-base-960h"
    assert exp.model.wav2vec2.output_dim == 768
    exp.data.cut = 3200
    model = build_model(exp.model)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, exp.data.cut))
                    .astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, train=False)

    # full depth is present in the param tree (not a tiny fallback)
    w2v2 = variables["params"]["wav2vec2"]
    layer_keys = [k for k in w2v2 if k.startswith("layers_")]
    assert len(layer_keys) == 12, sorted(layer_keys)
    # flax MultiHeadDotProductAttention kernels are (in_dim, heads, head_dim)
    assert w2v2["layers_0"]["attention"]["query"]["kernel"].shape == (768, 12, 64)

    ref = model.apply(variables, x, train=False)["logits"]

    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    params_tp = shard_params_tp(mesh, variables["params"])
    bs = {} if variables.get("batch_stats") is None else variables["batch_stats"]
    bs_r = replicate(mesh, bs)

    @jax.jit
    def fwd(p, bs, x):
        return model.apply({"params": p, "batch_stats": bs}, x,
                           train=False)["logits"]

    with mesh:
        got = fwd(params_tp, bs_r, x)
    scale = max(float(np.abs(np.asarray(ref)).max()), 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3 * scale)
