"""Explicit shard_map+pmean train step vs the GSPMD step (8 virtual CPU devices)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adfmsl.config import MeshConfig, make_experiment
from adfmsl.models import build_model
from adfmsl.parallel import make_mesh, replicate, shard_batch
from adfmsl.parallel.shard_map_step import make_shard_map_train_step
from adfmsl.train import TrainState, make_optimizer, make_train_step


def _setup():
    exp = make_experiment("maze5")
    # stochastic ops draw different masks per shard vs per global batch by design;
    # disable them so the two formulations are numerically comparable
    exp.model.spec_augment.enabled = False
    exp.model.architecture.dropout_rate = 0.0
    exp.model.architecture.fc_dropout = 0.0
    exp.data.cut = 4000
    exp.train.batch_size = 8
    model = build_model(exp.model)
    x = jnp.zeros((8, exp.data.cut))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    tx, _ = make_optimizer(exp, 10)
    state = TrainState.create(model.apply, variables["params"],
                              variables.get("batch_stats"), tx)
    return exp, state


def test_shard_map_step_matches_gspmd():
    exp, state = _setup()
    mesh = make_mesh(MeshConfig())
    audio = np.random.default_rng(0).standard_normal((8, exp.data.cut)).astype(np.float32)
    labels = (np.arange(8) % 2).astype(np.int32)
    mask = np.ones(8, dtype=bool)
    rng = jax.random.PRNGKey(7)

    ref_step = make_train_step(exp, donate=False)
    s_ref, m_ref = ref_step(state, jnp.asarray(audio), jnp.asarray(labels),
                            jnp.asarray(mask), rng)

    sm_step = make_shard_map_train_step(exp, mesh)
    state_r = state.replace(params=replicate(mesh, state.params),
                            batch_stats=replicate(mesh, state.batch_stats),
                            opt_state=replicate(mesh, state.opt_state))
    a, l, m = shard_batch(mesh, (audio, labels, mask))
    s_sm, m_sm = sm_step(state_r, a, l, m, rng)

    # shard-local BN vs global-batch BN (see module docstring): sub-percent gap
    assert float(m_ref["loss"]) == pytest.approx(float(m_sm["loss"]), rel=2e-2)
    assert float(m_ref["acc"]) == pytest.approx(float(m_sm["acc"]), abs=1e-6)
    # params agree within the Adam first-step sign-flip bound (see test_parallel)
    lr = exp.train.optimizer.lr
    da = jax.tree_util.tree_map(
        lambda x, y: float(jnp.max(jnp.abs(x - y) - 1e-6 * jnp.abs(x))),
        s_ref.params, s_sm.params)
    assert max(jax.tree_util.tree_leaves(da)) <= 2.1 * lr + 1e-4


def test_shard_map_step_multiple_updates_stay_finite():
    exp, state = _setup()
    mesh = make_mesh(MeshConfig())
    sm_step = make_shard_map_train_step(exp, mesh)
    state = state.replace(params=replicate(mesh, state.params),
                          batch_stats=replicate(mesh, state.batch_stats),
                          opt_state=replicate(mesh, state.opt_state))
    rng = jax.random.PRNGKey(0)
    audio = np.random.default_rng(1).standard_normal((8, exp.data.cut)).astype(np.float32)
    a, l, m = shard_batch(mesh, (audio, (np.arange(8) % 2).astype(np.int32),
                                 np.ones(8, dtype=bool)))
    losses = []
    for i in range(4):
        state, metrics = sm_step(state, a, l, m, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(state.step) == 4
