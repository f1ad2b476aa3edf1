"""Augmentation-wired training, profiler timer, and OOM half-batch retry tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adfmsl.config import make_experiment
from adfmsl.models import build_model
from adfmsl.train import TrainState, make_optimizer, make_train_step
from adfmsl.utils import StepTimer


def _setup(exp):
    model = build_model(exp.model)
    x = jnp.zeros((4, exp.data.cut))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    tx, _ = make_optimizer(exp, 10)
    return TrainState.create(model.apply, variables["params"],
                             variables.get("batch_stats"), tx)


def test_train_step_with_waveform_augmentation():
    exp = make_experiment("maze5")
    exp.data.cut = 4000
    exp.data.augment_enabled = True
    state = _setup(exp)
    noise = jnp.asarray(np.random.default_rng(1)
                        .standard_normal((2, exp.data.cut)).astype(np.float32))
    step_aug = make_train_step(exp, donate=False, noise_bank=noise)
    step_plain = make_train_step(exp, donate=False)
    audio = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((4, exp.data.cut)).astype(np.float32))
    labels = jnp.asarray([0, 1, 0, 1])
    mask = jnp.ones(4, dtype=bool)
    rng = jax.random.PRNGKey(0)
    _, m_aug = step_aug(state, audio, labels, mask, rng)
    _, m_plain = step_plain(state, audio, labels, mask, rng)
    assert np.isfinite(float(m_aug["loss"]))
    # augmentation changes the loss for the same batch+key
    assert float(m_aug["loss"]) != pytest.approx(float(m_plain["loss"]), rel=1e-6)


def test_step_timer():
    t = StepTimer()
    with t.phase("input"):
        pass
    with t.phase("input"):
        pass
    with t.phase("step"):
        pass
    s = t.summary()
    assert s["input"]["count"] == 2 and s["step"]["count"] == 1
    assert "input" in t.report()


def test_oom_half_batch_retry(fixture_dir):
    """Simulated RESOURCE_EXHAUSTED on full batches must fall back to halves
    (Maze6_Eval.py:509-535 parity)."""
    from adfmsl.data import AsvspoofDataset, DataLoader, parse_protocol
    from adfmsl.evaluation import produce_scores
    from adfmsl.train import make_eval_step

    exp = make_experiment("maze5")
    exp.data.cut = 3200
    state = _setup(exp)
    proto = parse_protocol(fixture_dir["eval"]["protocol"])
    ds = AsvspoofDataset(proto, fixture_dir["eval"]["audio_dir"], cut=exp.data.cut)
    loader = DataLoader(ds, batch_size=8, shuffle=False, drop_last=False)
    real_step = make_eval_step(exp)
    calls = {"n": 0}

    def flaky_step(state, audio, labels, mask):
        calls["n"] += 1
        if audio.shape[0] == 8:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory (simulated)")
        return real_step(state, audio, labels, mask)

    res = produce_scores(state, loader, flaky_step)
    assert res.utt_ids == proto.utt_ids
    assert len(res.scores) == len(proto)
    assert calls["n"] > 2    # full attempts + half-batch retries


def test_seed_reproducibility():
    """Two runs with the same seed must produce bit-identical parameters
    (reference promises seed-1234 reproducibility, maze2.py:308-317)."""
    audio = np.random.default_rng(3).standard_normal((4, 4000)).astype(np.float32)

    def run():
        exp = make_experiment("maze5")
        exp.data.cut = 4000
        exp.model.spec_augment.enabled = True   # exercises the PRNG streams
        state = _setup(exp)
        step = make_train_step(exp, donate=False)
        rng = jax.random.PRNGKey(exp.train.seed)
        for i in range(3):
            state, _ = step(state, jnp.asarray(audio),
                            jnp.asarray([0, 1, 0, 1]), jnp.ones(4, dtype=bool),
                            jax.random.fold_in(rng, i))
        return state.params

    a, b = run(), run()
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_trainer_reports_dev_eer(fixture_dir):
    from adfmsl.data import parse_protocol
    from adfmsl.train import Trainer, make_dataset_and_loader

    exp = make_experiment("maze5")
    exp.data.cut = 8000
    exp.train.batch_size = 8
    exp.train.num_epochs = 1
    exp.model.spec_augment.enabled = False
    tp = parse_protocol(fixture_dir["train"]["protocol"])
    dp = parse_protocol(fixture_dir["dev"]["protocol"])
    tl = make_dataset_and_loader(exp, tp, fixture_dir["train"]["audio_dir"],
                                 shuffle=True)
    dl = make_dataset_and_loader(exp, dp, fixture_dir["dev"]["audio_dir"],
                                 shuffle=False, batch_size=8, drop_last=False)
    trainer = Trainer(exp, tl, dl)
    hist = trainer.fit()
    assert 0.0 <= hist[0].dev_eer <= 1.0
    acc, eer = trainer.evaluate_metrics(dl)
    assert 0.0 <= acc <= 1.0 and 0.0 <= eer <= 1.0
