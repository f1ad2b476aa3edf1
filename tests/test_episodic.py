"""Episodic few-shot tests (BASELINE configs #3/#5)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from adfmsl.data import parse_protocol
from adfmsl.heads.episodic import (
    EpisodeSampler,
    batched_episode_loss,
    episode_loss,
    group_by_class,
    kshot_adapt,
    make_episodic_train_step,
    prototype_scores,
    prototypes_from_support,
    prototypical_logits,
    sample_episode_indices,
)
from adfmsl.heads.fmsl import l2_normalize


def test_group_by_class(fixture_dir):
    proto = parse_protocol(fixture_dir["train"]["protocol"])
    groups = group_by_class(proto)
    assert "bonafide" in groups
    assert len(groups["bonafide"]) == 12
    assert all(k.startswith("A") for k in groups if k != "bonafide")


def test_sample_episode_indices(fixture_dir):
    proto = parse_protocol(fixture_dir["train"]["protocol"])
    groups = group_by_class(proto)
    rng = np.random.default_rng(0)
    classes, sup, qry = sample_episode_indices(rng, groups, n_way=2, k_shot=1,
                                               q_queries=1)
    assert len(classes) == 2
    for s, q in zip(sup, qry):
        assert len(s) == 1 and len(q) == 1
        assert not set(s) & set(q)
    with pytest.raises(ValueError):
        sample_episode_indices(rng, groups, n_way=10, k_shot=50, q_queries=50)


def test_prototypes_on_hypersphere():
    emb = l2_normalize(jnp.asarray(
        np.random.default_rng(0).standard_normal((3, 5, 16)).astype(np.float32)))
    p = prototypes_from_support(emb)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(p), axis=-1), 1.0, atol=1e-5)


def test_episode_loss_separable():
    rng = np.random.default_rng(0)
    # two well-separated clusters
    c0 = rng.standard_normal((1, 16)) * 0.01 + np.eye(16)[0]
    c1 = rng.standard_normal((1, 16)) * 0.01 + np.eye(16)[1]
    sup = l2_normalize(jnp.asarray(np.stack([
        c0 + 0.01 * rng.standard_normal((5, 16)),
        c1 + 0.01 * rng.standard_normal((5, 16))]), dtype=jnp.float32))
    qry = l2_normalize(jnp.asarray(np.stack([
        c0 + 0.01 * rng.standard_normal((4, 16)),
        c1 + 0.01 * rng.standard_normal((4, 16))]), dtype=jnp.float32))
    loss, acc = episode_loss(sup, qry)
    assert float(acc) == 1.0
    assert float(loss) < 0.1
    # batched path agrees
    bl, ba = batched_episode_loss(sup[None], qry[None])
    assert float(ba) == 1.0
    np.testing.assert_allclose(float(bl), float(loss), rtol=1e-5)


def test_prototypical_logits_metrics():
    q = l2_normalize(jnp.asarray(np.random.default_rng(0)
                                 .standard_normal((4, 8)).astype(np.float32)))
    p = l2_normalize(jnp.asarray(np.random.default_rng(1)
                                 .standard_normal((2, 8)).astype(np.float32)))
    a = prototypical_logits(q, p, metric="cosine")
    b = prototypical_logits(q, p, metric="sqeuclidean")
    assert a.shape == b.shape == (4, 2)
    # same ranking for unit vectors: ||q-p||^2 = 2 - 2cos
    assert (np.argmax(np.asarray(a), 1) == np.argmax(np.asarray(b), 1)).all()
    with pytest.raises(ValueError):
        prototypical_logits(q, p, metric="manhattan")


def test_episodic_training_learns_synthetic():
    """A linear embedder must learn to separate two synthetic waveform classes
    through the vmap'd episodic objective."""
    rng = np.random.default_rng(0)
    t = 256
    templates = rng.standard_normal((2, t))  # fixed class templates

    def make_class(c, n):
        # template + noise (random-PHASE signals would average to a zero prototype
        # under a linear embedder, making the task unlearnable by construction)
        return templates[c] + 0.5 * rng.standard_normal((n, t))

    params = {"w": jnp.asarray(rng.standard_normal((t, 16)).astype(np.float32) * 0.1)}

    def embed(p, x):
        return x @ p["w"]

    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    step = make_episodic_train_step(embed, tx)

    accs = []
    for i in range(30):
        sup = np.stack([np.stack([make_class(0, 5), make_class(1, 5)])
                        for _ in range(4)]).astype(np.float32)
        qry = np.stack([np.stack([make_class(0, 5), make_class(1, 5)])
                        for _ in range(4)]).astype(np.float32)
        params, opt_state, _, m = step(params, opt_state, jnp.asarray(sup),
                                       jnp.asarray(qry))
        accs.append(float(m["acc"]))
    assert np.mean(accs[-5:]) > 0.9


def test_episodic_step_mesh_parity():
    """SURVEY 2.9's last commitment: the episodic step sharded over the data
    axis of an 8-virtual-device mesh must produce the SAME loss/params as the
    single-device run (GSPMD over the episode axis)."""
    from adfmsl.parallel.mesh import make_mesh, replicate, shard_batch

    rng = np.random.default_rng(1)
    t, e = 128, 8                      # episodes divisible by the 8-device axis
    params = {"w": jnp.asarray(rng.standard_normal((t, 16)).astype(np.float32) * 0.1)}

    def embed(p, x):
        return x @ p["w"]

    tx = optax.adam(1e-2)
    sup = rng.standard_normal((e, 2, 3, t)).astype(np.float32)
    qry = rng.standard_normal((e, 2, 4, t)).astype(np.float32)

    step = make_episodic_train_step(embed, tx)
    p1, _, _, m1 = step(params, tx.init(params), jnp.asarray(sup),
                        jnp.asarray(qry))

    mesh = make_mesh()
    pr = replicate(mesh, params)
    opt_r = replicate(mesh, tx.init(params))
    sup_s, qry_s = shard_batch(mesh, (jnp.asarray(sup), jnp.asarray(qry)))
    p8, _, _, m8 = step(pr, opt_r, sup_s, qry_s)
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p8["w"]), np.asarray(p1["w"]),
                               rtol=1e-5, atol=1e-6)


def test_episodic_step_threads_batch_stats():
    """embed_train_fn receives and returns mutable stats; the step hands the
    updated tree back (the VERDICT-flagged frozen-BN fix)."""
    rng = np.random.default_rng(2)
    t = 32
    params = {"w": jnp.asarray(np.eye(t, 8, dtype=np.float32))}

    def embed(p, x):
        return x @ p["w"]

    def embed_train(p, stats, x, step_rng):
        # toy "running stats": exponential mean of the batch mean
        new = {"mean": 0.9 * stats["mean"] + 0.1 * jnp.mean(x)}
        return x @ p["w"], new

    tx = optax.adam(1e-2)
    step = make_episodic_train_step(embed, tx, embed_train_fn=embed_train)
    stats = {"mean": jnp.zeros(())}
    sup = jnp.asarray(rng.standard_normal((2, 2, 2, t)), dtype=jnp.float32) + 1.0
    qry = jnp.asarray(rng.standard_normal((2, 2, 2, t)), dtype=jnp.float32) + 1.0
    _, _, new_stats, _ = step(params, tx.init(params), sup, qry, stats,
                              jax.random.PRNGKey(0))
    assert float(new_stats["mean"]) != 0.0


def test_episode_sampler_batch_io(fixture_dir):
    """load_batch_fn (native batch decode path) must produce the same episode
    tensors as the per-utterance load_fn."""
    proto = parse_protocol(fixture_dir["train"]["protocol"])

    def load(u):
        v = float(int(u.split("_")[-1]))
        return np.full(50, v, dtype=np.float32)

    def load_batch(ids):
        return np.stack([load(u) for u in ids])

    a = EpisodeSampler(proto, load, n_way=2, k_shot=2, q_queries=1,
                       episodes_per_batch=3, seed=7)
    b = EpisodeSampler(proto, n_way=2, k_shot=2, q_queries=1,
                       episodes_per_batch=3, seed=7, load_batch_fn=load_batch)
    ba, bb = a.next_batch(), b.next_batch()
    np.testing.assert_array_equal(ba.support, bb.support)
    np.testing.assert_array_equal(ba.query, bb.query)
    assert ba.class_names == bb.class_names


def test_kshot_adapt_and_scores():
    rng = np.random.default_rng(0)
    t = 64

    def embed(p, x):
        return x @ p["w"]

    params = {"w": jnp.asarray(np.eye(t, 8, dtype=np.float32))}
    spoof = rng.standard_normal((5, t)).astype(np.float32) + 3 * np.eye(t)[0]
    bona = rng.standard_normal((5, t)).astype(np.float32) + 3 * np.eye(t)[1]
    support = np.concatenate([spoof, bona])
    labels = np.asarray([0] * 5 + [1] * 5)
    protos = kshot_adapt(embed, params, jnp.asarray(support), jnp.asarray(labels), 2)
    assert protos.shape == (2, 8)
    scores = prototype_scores(embed, params, jnp.asarray(np.concatenate(
        [bona + 0.1 * rng.standard_normal((5, t)),
         spoof + 0.1 * rng.standard_normal((5, t))]).astype(np.float32)), protos)
    s = np.asarray(scores)
    assert s[:5].mean() > s[5:].mean()   # bonafide scores higher


def test_episode_sampler_shapes(fixture_dir):
    proto = parse_protocol(fixture_dir["train"]["protocol"])

    def load(u):
        return np.zeros(100, dtype=np.float32)

    sampler = EpisodeSampler(proto, load, n_way=2, k_shot=1, q_queries=1,
                             episodes_per_batch=3)
    b = sampler.next_batch()
    assert b.support.shape == (3, 2, 1, 100)
    assert b.query.shape == (3, 2, 1, 100)
    assert len(b.class_names) == 3


def test_episodic_step_fused_trunk_parity():
    """The folded bf16 eval trunk is differentiable (pure XLA affine/conv
    composition), so the episodic train step may embed through it
    (adfmsl-fewshot default for eval-mode embeds). Loss and gradient direction
    must match the plain bf16 trunk within bf16 tolerance, and the sinc/conv
    params must actually receive gradient."""
    from adfmsl.config import make_experiment
    from adfmsl.models import build_model

    cut = 4000
    rng = np.random.default_rng(11)
    sup = jnp.asarray(rng.standard_normal((2, 2, 2, cut)).astype(np.float32))
    qry = jnp.asarray(rng.standard_normal((2, 2, 2, cut)).astype(np.float32))

    results = {}
    for fused in (False, True):
        exp = make_experiment("maze5")
        exp.data.cut = cut
        exp.model.extra["fused_eval_trunk"] = fused
        model = build_model(exp.model)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((2, cut)), train=False)
        bstats = variables.get("batch_stats")

        def embed(p, x, _bstats=bstats, _model=model):
            v = {"params": p}
            if _bstats is not None:
                v["batch_stats"] = _bstats
            return _model.apply(v, x, train=False)["features"]

        tx = optax.adam(1e-3)
        step = make_episodic_train_step(embed, tx)
        p2, _, _, m = step(variables["params"], tx.init(variables["params"]),
                           sup, qry)
        delta = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).sum()), p2, variables["params"])
        results[fused] = (float(m["loss"]), delta)

    loss_plain, delta_plain = results[False]
    loss_fused, delta_fused = results[True]
    assert np.isfinite(loss_fused)
    np.testing.assert_allclose(loss_fused, loss_plain, rtol=2e-2, atol=2e-2)
    # the trunk conv params must receive gradient through the folded body
    trunk_moved = sum(v for k, v in jax.tree_util.tree_leaves_with_path(
        delta_fused) if "trunk" in str(k))
    assert trunk_moved > 0.0, "no gradient reached the folded trunk params"
