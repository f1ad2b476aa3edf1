"""Training-layer tests: optimizer factories, NaN guards, checkpoint round-trip,
early stopping."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from adfmsl.config import make_experiment
from adfmsl.models import build_model
from adfmsl.train import (
    EarlyStopper,
    PlateauTracker,
    TrainState,
    make_eval_step,
    make_optimizer,
    make_schedule,
    make_train_step,
)


def _tiny_exp(name="maze5", **over):
    exp = make_experiment(name, **over)
    exp.model.wav2vec2.model_name = "tiny"
    exp.data.cut = 4000
    exp.train.batch_size = 4
    return exp


def _state(exp):
    model = build_model(exp.model)
    x = jnp.zeros((exp.train.batch_size, exp.data.cut))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    tx, _ = make_optimizer(exp, steps_per_epoch=10)
    return model, TrainState.create(model.apply, variables["params"],
                                    variables.get("batch_stats"), tx)


def test_schedules():
    exp = _tiny_exp()
    for name in ["constant", "cosine", "step", "warmup_cosine"]:
        exp.train.optimizer.scheduler = name
        exp.train.optimizer.warmup_steps = 5
        s = make_schedule(exp.train.optimizer, 10, 5)
        vals = [float(s(i)) for i in [0, 10, 49]]
        assert all(np.isfinite(vals))
    with pytest.raises(ValueError):
        exp.train.optimizer.scheduler = "bogus"
        make_schedule(exp.train.optimizer, 10, 5)


def test_optimizers_construct():
    for name in ["adam", "adamw", "sgd"]:
        exp = _tiny_exp()
        exp.train.optimizer.name = name
        tx, _ = make_optimizer(exp, 10)
        assert isinstance(tx, optax.GradientTransformation)


@pytest.mark.slow
def test_train_step_updates_and_loss_decreases():
    exp = _tiny_exp("maze5")
    model, state = _state(exp)
    step = make_train_step(exp, donate=False)
    rng = jax.random.PRNGKey(0)
    audio = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, exp.data.cut)).astype(np.float32))
    labels = jnp.asarray([0, 1, 0, 1])
    mask = jnp.ones(4, dtype=bool)
    losses = []
    for i in range(8):
        state, m = step(state, audio, labels, mask, jax.random.fold_in(rng, i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]      # overfits a fixed batch
    assert all(np.isfinite(losses))
    assert int(state.step) == 8


def test_train_step_skips_nonfinite_batch():
    exp = _tiny_exp("maze5")
    model, state = _state(exp)
    step = make_train_step(exp, donate=False)
    bad = jnp.full((4, exp.data.cut), jnp.nan)
    labels = jnp.asarray([0, 1, 0, 1])
    mask = jnp.ones(4, dtype=bool)
    new_state, m = step(state, bad, labels, mask, jax.random.PRNGKey(0))
    assert float(m["skipped"]) == 1.0
    # params unchanged on skip
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


def test_frozen_w2v2_params_never_move():
    exp = _tiny_exp("maze7")
    assert exp.model.wav2vec2.freeze
    model, state = _state(exp)
    step = make_train_step(exp, donate=False)
    audio = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, exp.data.cut)).astype(np.float32))
    new_state, _ = step(state, audio, jnp.asarray([0, 1, 0, 1]),
                        jnp.ones(4, dtype=bool), jax.random.PRNGKey(0))
    before = jax.tree_util.tree_leaves(state.params["wav2vec2"])
    after = jax.tree_util.tree_leaves(new_state.params["wav2vec2"])
    assert all(float(jnp.abs(a - b).max()) == 0.0 for a, b in zip(before, after))


def test_eval_step_masking():
    exp = _tiny_exp("maze5")
    model, state = _state(exp)
    estep = make_eval_step(exp)
    audio = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, exp.data.cut)).astype(np.float32))
    out = estep(state, audio, jnp.asarray([0, 1, 0, 1]),
                jnp.asarray([True, True, False, False]))
    assert float(out["count"]) == 2.0
    assert out["scores"].shape == (4,)


def test_checkpoint_roundtrip(tmp_path):
    from adfmsl.train import CheckpointManager

    exp = _tiny_exp("maze5")
    model, state = _state(exp)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep_best_k=2)
    mgr.save(0, state, {"dev_acc": 0.5, "train_loss": 1.0})
    mgr.save(1, state.replace(step=99), {"dev_acc": 0.9, "train_loss": 0.5})
    assert mgr.best_epoch() == 1
    restored, epoch = mgr.restore(state)
    assert epoch == 1 and int(restored.step) == 99
    leaves_a = jax.tree_util.tree_leaves(state.params)
    leaves_b = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_early_stopper():
    es = EarlyStopper(patience=2, mode="max")
    assert not es.step(0.5)
    assert not es.step(0.6)
    assert not es.step(0.55)       # 1 bad
    assert es.step(0.55)           # 2 bad -> stop
    with pytest.raises(ValueError):
        EarlyStopper(mode="sideways")


def test_plateau_tracker():
    pt = PlateauTracker(patience=1, factor=0.5, mode="min")
    assert pt.update(1.0) == 1.0
    assert pt.update(0.9) == 1.0
    assert pt.update(0.95) == 1.0  # 1 bad
    assert pt.update(0.95) == 0.5  # over patience -> scale


def test_partial_unfreeze_labels_maze6():
    """maze6: wav2vec2 unfreeze_last_n trains ONLY the last N encoder layers at the
    backbone LR; everything else in the encoder stays frozen (maze6.py:666-678
    differential-LR groups)."""
    exp = _tiny_exp("maze6")
    exp.model.wav2vec2.freeze = True
    exp.model.wav2vec2.unfreeze_last_n = 1   # tiny arch has 2 layers -> layers_1
    exp.model.wav2vec2.output_dim = 768      # label fn derives 12-layer numbering...
    # tiny arch has layers_0/1; emulate by unfreezing explicitly against 12-layer
    # numbering: layers_11 doesn't exist in tiny, so check the label fn directly
    from adfmsl.train.optim import _param_label_fn

    label = _param_label_fn(exp)

    class K:  # fake path entries
        def __init__(self, key):
            self.key = key

    def lab(*keys):
        return label([K(k) for k in keys], None)

    assert lab("wav2vec2", "layers_11", "attention", "query", "kernel") == "backbone"
    assert lab("wav2vec2", "layers_3", "attention", "query", "kernel") == "frozen"
    assert lab("wav2vec2", "feature_extractor", "conv_layers_0", "conv", "kernel") == "frozen"
    assert lab("trunk", "block0", "conv1", "kernel") == "main"
    # with partial unfreezing active, non-listed layers stay frozen even when
    # freeze=False (reference maze6 trains ONLY the last-N layers)
    exp.model.wav2vec2.freeze = False
    label_p = _param_label_fn(exp)
    assert label_p([K("wav2vec2"), K("layers_3"), K("kernel")], None) == "frozen"
    assert label_p([K("wav2vec2"), K("layers_11"), K("kernel")], None) == "backbone"
    # unfreeze_feature_extractor opt-in
    exp.model.wav2vec2.unfreeze_feature_extractor = True
    label_fe = _param_label_fn(exp)
    assert label_fe([K("wav2vec2"), K("feature_extractor"), K("conv_layers_0"),
                     K("conv"), K("kernel")], None) == "backbone"
    exp.model.wav2vec2.unfreeze_feature_extractor = False
    # fully frozen when unfreeze_last_n = 0
    exp.model.wav2vec2.unfreeze_last_n = 0
    exp.model.wav2vec2.freeze = True
    label2 = _param_label_fn(exp)
    assert label2([K("wav2vec2"), K("layers_11"), K("kernel")], None) == "frozen"
    # fully unfrozen
    exp.model.wav2vec2.freeze = False
    label3 = _param_label_fn(exp)
    assert label3([K("wav2vec2"), K("layers_3"), K("kernel")], None) == "backbone"


def test_plateau_scheduler_scales_updates_in_opt_state():
    """scheduler='plateau': the LR multiplier lives as a device scalar in
    opt_state (no recompile on drops); scale 0 freezes params, scale 1 trains."""
    from adfmsl.train.optim import get_plateau_scale, set_plateau_scale

    exp = _tiny_exp("maze5")
    exp.train.optimizer.scheduler = "plateau"
    s = make_schedule(exp.train.optimizer, 10, 5)
    assert float(s(0)) == exp.train.optimizer.lr
    model, state = _state(exp)
    assert get_plateau_scale(state.opt_state) == 1.0

    step = make_train_step(exp, donate=False)
    audio = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, exp.data.cut)).astype(np.float32))
    labels = jnp.asarray([0, 1, 0, 1])
    mask = jnp.ones(4, dtype=bool)
    rng = jax.random.PRNGKey(0)

    frozen = state.replace(opt_state=set_plateau_scale(state.opt_state, 0.0))
    out_state, _ = step(frozen, audio, labels, mask, rng)
    for a, b in zip(jax.tree_util.tree_leaves(out_state.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    live, _ = step(state, audio, labels, mask, rng)
    moved = sum(float(jnp.abs(a - b).sum()) for a, b in
                zip(jax.tree_util.tree_leaves(live.params),
                    jax.tree_util.tree_leaves(state.params)))
    assert moved > 0.0


def test_remat_train_step_matches_plain():
    """train.remat=True (jax.checkpoint around the trunk forward) must produce
    the same loss/update as the plain step — it trades FLOPs for memory, not
    numerics. Regression: the checkpoint wrapper used to receive the static
    flax kwargs (mutable=['batch_stats']) as traced arguments and crash."""
    import jax
    import numpy as np

    from adfmsl.config import make_experiment
    from adfmsl.models import build_model
    from adfmsl.train import TrainState, make_optimizer
    from adfmsl.train.steps import make_train_step

    rng = np.random.default_rng(3)
    x = np.asarray(rng.standard_normal((4, 4000)), dtype=np.float32)
    labels = np.asarray([0, 1, 0, 1], dtype=np.int32)
    mask = np.ones(4, dtype=bool)

    losses = {}
    for remat in (False, True):
        exp = make_experiment("lcnn1d_lfcc")
        exp.data.cut = 4000
        exp.train.batch_size = 4
        exp.train.remat = remat
        exp.model.spec_augment.enabled = False
        model = build_model(exp.model)
        v = model.init({"params": jax.random.PRNGKey(0)}, x[:2], train=False)
        tx, _ = make_optimizer(exp, steps_per_epoch=1)
        state = TrainState.create(model.apply, v["params"],
                                  v.get("batch_stats"), tx)
        step = make_train_step(exp, donate=False)
        new_state, m = step(state, x, labels, mask, jax.random.PRNGKey(7))
        losses[remat] = float(m["loss"])
        assert np.isfinite(losses[remat])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)
