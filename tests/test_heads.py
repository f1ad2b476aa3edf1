import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adfmsl.config.base import FMSLConfig
from adfmsl.heads import (
    FMSLHead,
    am_softmax_logits,
    compute_loss,
    cross_entropy,
    focal_bce,
    focal_ce,
    l2_normalize,
    masked_mean,
)


def test_cross_entropy_matches_manual():
    logits = jnp.asarray([[2.0, 0.5], [0.1, 1.0]])
    labels = jnp.asarray([0, 1])
    ce = np.asarray(cross_entropy(logits, labels))
    ref = -np.log(np.exp([2.0, 1.0]) / np.exp(np.asarray(logits)).sum(axis=1))
    np.testing.assert_allclose(ce, ref, rtol=1e-6)


def test_weighted_ce():
    logits = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    labels = jnp.asarray([0, 1])
    w = cross_entropy(logits, labels, class_weights=[0.1, 0.9])
    u = cross_entropy(logits, labels)
    np.testing.assert_allclose(np.asarray(w), np.asarray(u) * np.array([0.1, 0.9]),
                               rtol=1e-6)


def test_weighted_ce_reduction_matches_torch():
    """torch CrossEntropyLoss(weight, reduction='mean') divides by the sum of
    TARGET weights, not N (main.py:66-67). compute_loss must match — the ~2x
    scale difference on a balanced batch is a silent lr change otherwise."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((6, 2)).astype(np.float32)
    labels = np.array([0, 1, 1, 0, 1, 1])
    for w in ([0.1, 0.9], [0.3, 0.7]):
        ref = torch.nn.CrossEntropyLoss(weight=torch.tensor(w))(
            torch.from_numpy(logits), torch.from_numpy(labels)).item()
        got = float(compute_loss("weighted_ce", jnp.asarray(logits),
                                 jnp.asarray(labels), class_weights=w))
        assert got == pytest.approx(ref, rel=1e-5)
    # masked form: masked-out rows contribute to neither sum
    mask = np.array([1, 1, 1, 1, 0, 0], dtype=bool)
    ref = torch.nn.CrossEntropyLoss(weight=torch.tensor([0.1, 0.9]))(
        torch.from_numpy(logits[:4]), torch.from_numpy(labels[:4])).item()
    got = float(compute_loss("weighted_ce", jnp.asarray(logits),
                             jnp.asarray(labels), class_weights=[0.1, 0.9],
                             mask=jnp.asarray(mask)))
    assert got == pytest.approx(ref, rel=1e-5)


def test_loss_parts_recompose():
    from adfmsl.heads.losses import loss_parts
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.standard_normal((8, 2)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, 8))
    for name in ["ce", "weighted_ce", "focal_ce", "focal_bce"]:
        num, den = loss_parts(name, logits, labels, class_weights=[0.3, 0.7])
        whole = compute_loss(name, logits, labels, class_weights=[0.3, 0.7])
        assert float(num / den) == pytest.approx(float(whole), rel=1e-6)
        # two half-batches psum'd recompose the full-batch loss exactly
        n1, d1 = loss_parts(name, logits[:4], labels[:4], class_weights=[0.3, 0.7])
        n2, d2 = loss_parts(name, logits[4:], labels[4:], class_weights=[0.3, 0.7])
        assert float((n1 + n2) / (d1 + d2)) == pytest.approx(float(whole), rel=1e-6)


def test_focal_ce_downweights_easy():
    """Focal loss (maze2.py:195-207): well-classified examples shrink by (1-pt)^gamma."""
    easy = jnp.asarray([[5.0, -5.0]])
    hard = jnp.asarray([[0.1, -0.1]])
    labels = jnp.asarray([0])
    r_easy = float(focal_ce(easy, labels)[0] / cross_entropy(easy, labels)[0])
    r_hard = float(focal_ce(hard, labels)[0] / cross_entropy(hard, labels)[0])
    assert r_easy < r_hard < 0.25  # alpha=0.25 bound


def test_focal_bce_finite():
    logits = jnp.asarray([[10.0, -10.0], [-10.0, 10.0]])
    labels = jnp.asarray([0, 1])
    assert np.isfinite(np.asarray(focal_bce(logits, labels))).all()


def test_masked_mean():
    v = jnp.asarray([1.0, 2.0, 100.0])
    m = jnp.asarray([True, True, False])
    assert float(masked_mean(v, m)) == pytest.approx(1.5)


def test_compute_loss_dispatch():
    logits = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    labels = jnp.asarray([0, 1])
    for name in ["ce", "weighted_ce", "focal_ce", "focal_bce"]:
        v = compute_loss(name, logits, labels, class_weights=[0.3, 0.7])
        assert np.isfinite(float(v))
    with pytest.raises(ValueError):
        compute_loss("nope", logits, labels)


def test_am_softmax_margin_only_on_target_when_training():
    emb = l2_normalize(jnp.asarray(np.random.default_rng(0).standard_normal((4, 16))))
    w = jnp.asarray(np.random.default_rng(1).standard_normal((2, 16)))
    labels = jnp.asarray([0, 1, 0, 1])
    plain = np.asarray(am_softmax_logits(emb, w, s=32.0, m=0.45, train=False))
    marg = np.asarray(am_softmax_logits(emb, w, s=32.0, m=0.45, labels=labels,
                                        train=True))
    for i, l in enumerate([0, 1, 0, 1]):
        assert marg[i, l] < plain[i, l]          # margin shrinks target cosine
        assert marg[i, 1 - l] == pytest.approx(plain[i, 1 - l], abs=1e-6)
    # cos(theta+m) identity check on target entries
    cos = plain / 32.0
    expected = np.cos(np.arccos(np.clip(cos, -1, 1)) + 0.45) * 32.0
    for i, l in enumerate([0, 1, 0, 1]):
        assert marg[i, l] == pytest.approx(expected[i, l], abs=1e-3)


def _head_outputs(cfg, labels=None, train=False):
    head = FMSLHead(cfg, input_dim=32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((6, 32)).astype(np.float32))
    variables = head.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    rngs = {"dropout": jax.random.PRNGKey(1), "lsa": jax.random.PRNGKey(2)}
    if train:
        out, _ = head.apply(variables, x, labels=labels, train=True, rngs=rngs,
                            mutable=["batch_stats"])
        return out
    return head.apply(variables, x, labels=labels, train=False)


def test_fmsl_head_contract_always_complete():
    """Contract fix vs reference (SURVEY.md 2.3): logits AND loss always present."""
    cfg = FMSLConfig()
    labels = jnp.asarray([0, 1, 0, 1, 0, 1])
    out = _head_outputs(cfg, labels=labels, train=True)
    for k in ["logits", "loss", "ce_loss", "proto_loss", "embeddings",
              "prototype_similarity"]:
        assert k in out, k
    assert out["logits"].shape == (6, 2)
    assert out["prototype_similarity"].shape == (6, 3)
    assert np.isfinite(float(out["loss"]))
    # embeddings on the unit hypersphere
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out["embeddings"]), axis=1),
                               1.0, atol=1e-5)


def test_fmsl_head_eval_no_margin():
    cfg = FMSLConfig()
    out = _head_outputs(cfg, labels=None, train=False)
    assert "loss" not in out
    assert out["logits"].shape == (6, 2)


def test_fmsl_lsa_changes_embeddings():
    base = FMSLConfig(enable_lsa=False)
    lsa = FMSLConfig(enable_lsa=True, lsa_strength=0.5)
    labels = jnp.asarray([0, 1, 0, 1, 0, 1])
    a = np.asarray(_head_outputs(base, labels, train=True)["embeddings"])
    b = np.asarray(_head_outputs(lsa, labels, train=True)["embeddings"])
    assert np.abs(a - b).max() > 1e-3


def test_gradients_finite_at_degenerate_points():
    """NaN-gradient regressions: (a) l2_normalize of an exactly-zero vector
    (dead-ReLU projection row) had a NaN VJP; (b) am_softmax margin at
    |cos|=1 (AM-softmax drives the target cosine there) emitted inf/NaN that
    leaked through one_hot*phi into every class."""
    import jax

    from adfmsl.heads.fmsl import am_softmax_logits, l2_normalize

    g = jax.grad(lambda x: l2_normalize(x).sum())(jnp.zeros(4))
    assert np.isfinite(np.asarray(g)).all()

    w = jnp.eye(4)
    emb = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])       # exactly aligned to class 0
    labels = jnp.asarray([0])

    def loss(e):
        return am_softmax_logits(l2_normalize(e), w, s=32.0, m=0.45,
                                 labels=labels, train=True).sum()

    g = jax.grad(loss)(emb)
    assert np.isfinite(np.asarray(g)).all()
