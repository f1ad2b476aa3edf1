"""Mesh/sharding tests on the 8-virtual-device CPU platform (SURVEY.md 2.9/2.10:
the net-new distributed layer — data-parallel pjit with XLA collectives)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adfmsl.config import MeshConfig, make_experiment
from adfmsl.models import build_model
from adfmsl.parallel import (
    batch_sharding,
    make_mesh,
    pad_batch_to_devices,
    replicate,
    shard_batch,
)
from adfmsl.train import TrainState, make_optimizer, make_train_step


def test_make_mesh_shapes():
    mesh = make_mesh(MeshConfig())
    assert mesh.devices.shape == (8, 1)
    mesh2 = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    assert mesh2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data_parallel=3, model_parallel=2))


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(MeshConfig())
    x = np.zeros((16, 100), dtype=np.float32)
    xs = shard_batch(mesh, x)
    assert xs.sharding.spec == batch_sharding(mesh).spec
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape == (2, 100)


def test_pad_batch_to_devices():
    a, l, m = pad_batch_to_devices(np.ones((5, 4), np.float32),
                                   np.ones(5, np.int32), np.ones(5, bool), 8)
    assert a.shape == (8, 4) and not m[5:].any() and m[:5].all()


@pytest.mark.slow
def test_data_parallel_train_step_matches_single_device():
    """The pjit'd step over 8 devices must produce the same loss/update as the
    single-device step on the same global batch (collectives correctness)."""
    exp = make_experiment("maze5")
    exp.model.wav2vec2.model_name = "tiny"
    exp.data.cut = 4000
    exp.train.batch_size = 8
    model = build_model(exp.model)
    x = jnp.zeros((8, exp.data.cut))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    tx, _ = make_optimizer(exp, 10)
    state = TrainState.create(model.apply, variables["params"],
                              variables.get("batch_stats"), tx)
    step = make_train_step(exp, donate=False)

    audio = np.random.default_rng(0).standard_normal((8, exp.data.cut)).astype(np.float32)
    labels = (np.arange(8) % 2).astype(np.int32)
    mask = np.ones(8, dtype=bool)
    rng = jax.random.PRNGKey(7)

    # single device
    s1, m1 = step(state, jnp.asarray(audio), jnp.asarray(labels),
                  jnp.asarray(mask), rng)

    # 8-device mesh
    mesh = make_mesh(MeshConfig())
    state_r = state.replace(params=replicate(mesh, state.params),
                            batch_stats=replicate(mesh, state.batch_stats),
                            opt_state=replicate(mesh, state.opt_state))
    a_s, l_s, m_s = shard_batch(mesh, (audio, labels, mask))
    with mesh:
        s8, m8 = step(state_r, a_s, l_s, m_s, rng)

    # sharded reductions reorder float accumulation; small tolerance expected
    # (2e-3: round-5's loss_parts num/denom split runs TWO global reductions,
    # and the 8-way reorder noise measured right at the old 1e-3 edge)
    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=2e-3)
    # first-step Adam moves each weight by ~±lr*sign(grad); roundoff-level grad
    # differences can flip the sign of near-zero grads, so the bound is 2*lr + slack
    # + ulp-scale slack for large-magnitude params (sinc cutoffs are O(1e3) Hz)
    lr = exp.train.optimizer.lr
    da = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b) - 1e-6 * jnp.abs(a))),
        s1.params, s8.params)
    assert max(jax.tree_util.tree_leaves(da)) <= 2.1 * lr


@pytest.mark.slow
def test_graft_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    jitted = jax.jit(fn)
    lowered = jitted.lower(*args)
    assert lowered.compile() is not None


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_mesh_sharded_eval_matches_single_device(fixture_dir, tmp_path):
    """evaluate_to_file(..., mesh=...) over the synthetic eval split must produce
    the same utt_ids and scores as the single-device path (runner.py mesh branch;
    SURVEY.md 2.9 eval sharding). Batch 6 is NOT device-divisible, exercising
    pad_batch_to_devices."""
    from adfmsl.data import parse_protocol
    from adfmsl.evaluation import evaluate_to_file
    from adfmsl.train import make_dataset_and_loader, make_eval_step

    exp = make_experiment("maze5")
    exp.data.cut = 4000
    model = build_model(exp.model)
    x = jnp.zeros((2, exp.data.cut))
    variables = model.init({"params": jax.random.PRNGKey(3)}, x, train=False)
    tx, _ = make_optimizer(exp, 10)
    state = TrainState.create(model.apply, variables["params"],
                              variables.get("batch_stats"), tx)
    eval_step = jax.jit(make_eval_step(exp))

    proto = parse_protocol(fixture_dir["eval"]["protocol"])
    def loader():
        return make_dataset_and_loader(exp, proto, fixture_dir["eval"]["audio_dir"],
                                       shuffle=False, batch_size=6, drop_last=False)

    res1 = evaluate_to_file(state, loader(), str(tmp_path / "s1.txt"),
                            labels=proto.labels, eval_step=eval_step)

    mesh = make_mesh(MeshConfig())
    state_r = state.replace(params=replicate(mesh, state.params),
                            batch_stats=replicate(mesh, state.batch_stats),
                            opt_state=replicate(mesh, state.opt_state))
    res8 = evaluate_to_file(state_r, loader(), str(tmp_path / "s8.txt"),
                            labels=proto.labels, eval_step=eval_step, mesh=mesh)

    assert res1.utt_ids == res8.utt_ids == proto.utt_ids
    np.testing.assert_allclose(res8.scores, res1.scores, rtol=1e-5, atol=1e-6)
    assert res1.metrics["eer"] == pytest.approx(res8.metrics["eer"], abs=1e-9)


@pytest.mark.slow
def test_graft_dryrun_multichip_w2v2_model():
    """The dry run must also cover the w2v2 family (fusion + ASP + FMSL head)."""
    import __graft_entry__ as g

    g.dryrun_multichip(8, exp_name="maze6_fmsl", cut=4000, per_dev=1)


@pytest.mark.slow
def test_graft_dryrun_multichip_dp_tp():
    """DP x TP composition: 4-way data parallel x 2-way Megatron TP over the
    w2v2 encoder (parallel/tp.py), one full train step on the virtual mesh."""
    import __graft_entry__ as g

    g.dryrun_multichip(8, exp_name="maze7_fmsl", cut=4000, per_dev=1, tp=2)


@pytest.mark.slow
def test_trainer_mesh_data_parallel_matches_single_device(fixture_dir):
    """Trainer(mesh=...) trains data-parallel over 8 devices and reaches the
    same losses/metrics as the single-device Trainer (same seed, same data)."""
    from adfmsl.data import parse_protocol
    from adfmsl.train import Trainer, make_dataset_and_loader

    def run(mesh):
        exp = make_experiment("maze5")
        exp.data.cut = 4000
        exp.train.batch_size = 8
        exp.train.num_epochs = 2
        exp.model.spec_augment.enabled = False
        proto = parse_protocol(fixture_dir["train"]["protocol"])
        loader = make_dataset_and_loader(exp, proto,
                                         fixture_dir["train"]["audio_dir"],
                                         shuffle=True)
        dev = make_dataset_and_loader(exp, proto,
                                      fixture_dir["train"]["audio_dir"],
                                      shuffle=False, batch_size=6,
                                      drop_last=False)   # non-divisible batch
        tr = Trainer(exp, loader, dev, mesh=mesh)
        return tr.fit()

    h1 = run(None)
    h8 = run(make_mesh(MeshConfig()))
    for a, b in zip(h1, h8):
        assert a.train_loss == pytest.approx(b.train_loss, rel=2e-3)  # see above
        assert a.dev_acc == pytest.approx(b.dev_acc, abs=1e-6)
        assert a.dev_eer == pytest.approx(b.dev_eer, abs=1e-6)


def test_trainer_mesh_rejects_nondivisible_batch(fixture_dir):
    """Padded zero rows must never enter BN batch stats during mesh training:
    fit() rejects batch sizes not divisible by the data axis (eval-only mesh
    use stays allowed — the guard lives in fit, not __init__)."""
    import pytest as _pytest

    from adfmsl.config import MeshConfig, make_experiment
    from adfmsl.data import parse_protocol
    from adfmsl.parallel import make_mesh
    from adfmsl.train import Trainer, make_dataset_and_loader

    exp = make_experiment("lcnn1d_lfcc")
    exp.data.cut = 4000
    exp.train.batch_size = 12            # not divisible by 8
    exp.train.num_epochs = 1
    proto = parse_protocol(fixture_dir["train"]["protocol"])
    loader = make_dataset_and_loader(exp, proto,
                                     fixture_dir["train"]["audio_dir"],
                                     shuffle=True)
    mesh = make_mesh(MeshConfig(data_parallel=8))
    trainer = Trainer(exp, loader, mesh=mesh)   # construction is fine (eval use)
    with _pytest.raises(ValueError, match="divisible"):
        trainer.fit()
