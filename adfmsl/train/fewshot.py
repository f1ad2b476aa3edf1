"""Episodic few-shot training driver (BASELINE configs #3 and #5).

Ties together: a registry trunk as embedder (its pooled 'features' output), the
vmap-batched episodic objective (heads/episodic.py), optax, and K-shot cross-domain
adaptation + CM scoring. The embedder runs the FULL flattened support+query batch
through one jitted program, so every episode batch is one MXU-friendly device step.
"""
from __future__ import annotations

import dataclasses
import logging
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from adfmsl.config.base import ExperimentConfig
from adfmsl.data.pipeline import AsvspoofDataset
from adfmsl.data.protocol import Protocol
from adfmsl.heads.episodic import (
    EpisodeSampler,
    kshot_adapt,
    make_episodic_train_step,
    prototype_scores,
)
from adfmsl.models.mazes import build_model

log = logging.getLogger(__name__)


def _step_rngs(rng):
    """Per-step PRNG streams for the trunk's stochastic train-mode ops (same
    split + hardware bit generation as train/steps.py)."""
    from adfmsl.train.steps import fast_bits_key

    return {"dropout": fast_bits_key(jax.random.fold_in(rng, 0)),
            "specaugment": fast_bits_key(jax.random.fold_in(rng, 1)),
            "lsa": fast_bits_key(jax.random.fold_in(rng, 2))}


@dataclasses.dataclass
class FewshotConfig:
    n_way: int = 2
    k_shot: int = 5
    q_queries: int = 5
    episodes_per_batch: int = 4
    n_steps: int = 100
    temperature: float = 10.0
    metric: str = "cosine"
    lr: float = 1e-3


class FewshotTrainer:
    """Meta-train a trunk with prototypical episodes over per-attack-type classes.

    ``checkpoint_dir`` warm-starts the embedder's params + BatchNorm running
    stats from a supervised (or previous meta-training) checkpoint — the
    reference's eval layer always loads checkpoints (Maze5_eval.py:321), and
    BASELINE config #5's "meta-train on ASVspoof, K-shot adapt" needs the same.
    BatchNorm running stats are threaded mutably through the episodic step
    (embed runs in train mode there), so stats converge during meta-training
    instead of staying at init mean=0/var=1; ``mesh`` shards the episode axis
    data-parallel (GSPMD, sync-BN)."""

    def __init__(self, exp: ExperimentConfig, fcfg: FewshotConfig,
                 protocol: Protocol, dataset: AsvspoofDataset,
                 checkpoint_dir: Optional[str] = None, mesh=None):
        self.exp, self.fcfg = exp, fcfg
        self.mesh = mesh
        self.model = build_model(exp.model)
        sample = jnp.zeros((2, exp.data.cut))
        variables = self.model.init({"params": jax.random.PRNGKey(exp.train.seed)},
                                    sample, train=False)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats")
        self.start_epoch = None
        if checkpoint_dir:
            from adfmsl.train.checkpoint import CheckpointManager

            ckpt = CheckpointManager(checkpoint_dir)
            self.params, self.batch_stats, self.start_epoch = \
                ckpt.restore_params(self.params, self.batch_stats)
            ckpt.close()
            log.info("warm-started embedder from %s (epoch %s)",
                     checkpoint_dir, self.start_epoch)

        def embed(params, audio, batch_stats=None):
            v = {"params": params}
            stats = self.batch_stats if batch_stats is None else batch_stats
            if stats is not None:
                v["batch_stats"] = stats
            return self.model.apply(v, audio, train=False)["features"]

        def embed_train(params, batch_stats, audio, rng):
            v = {"params": params}
            if batch_stats is None:
                out = self.model.apply(v, audio, train=True,
                                       rngs=_step_rngs(rng))
                return out["features"], None
            v["batch_stats"] = batch_stats
            out, mut = self.model.apply(v, audio, train=True,
                                        rngs=_step_rngs(rng),
                                        mutable=["batch_stats"])
            return out["features"], mut["batch_stats"]

        self.embed = embed
        self.tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(fcfg.lr))
        self.opt_state = self.tx.init(self.params)
        self.step_fn = make_episodic_train_step(
            embed, self.tx, fcfg.temperature, fcfg.metric,
            embed_train_fn=embed_train)
        if mesh is not None:
            from adfmsl.parallel.mesh import replicate

            self.params, self.opt_state, self.batch_stats = replicate(
                mesh, (self.params, self.opt_state, self.batch_stats))
        load_batch = (lambda ids: dataset.load_batch(ids)[0])
        self.sampler = EpisodeSampler(
            protocol, lambda u: dataset.load(u)[0], fcfg.n_way, fcfg.k_shot,
            fcfg.q_queries, fcfg.episodes_per_batch, exp.train.seed,
            load_batch_fn=load_batch)
        self.history: List[Dict[str, float]] = []
        self._rng = jax.random.PRNGKey(exp.train.seed + 1)
        # ONE jitted scorer reused by score()/score_protocol(): a fresh
        # jit(lambda) per call would retrace the full trunk every invocation.
        # batch_stats passed explicitly so post-fit stats are used (closure
        # over self.batch_stats would bake the INIT stats into the trace).
        self._score_fn = jax.jit(lambda p, bs, a, protos: prototype_scores(
            lambda pp, aa: self.embed(pp, aa, batch_stats=bs), p, a, protos,
            temperature=self.fcfg.temperature))

    def fit(self, n_steps: Optional[int] = None) -> List[Dict[str, float]]:
        n = n_steps or self.fcfg.n_steps
        from adfmsl.parallel.mesh import shard_batch

        for i in range(n):
            t0 = time.time()
            b = self.sampler.next_batch()
            sup, qry = jnp.asarray(b.support), jnp.asarray(b.query)
            if self.mesh is not None:
                sup, qry = shard_batch(self.mesh, (sup, qry))
            self._rng, step_rng = jax.random.split(self._rng)
            self.params, self.opt_state, self.batch_stats, m = self.step_fn(
                self.params, self.opt_state, sup, qry,
                batch_stats=self.batch_stats, rng=step_rng)
            rec = {"step": i, "loss": float(m["loss"]), "acc": float(m["acc"]),
                   "seconds": time.time() - t0}
            self.history.append(rec)
            if i % 10 == 0:
                log.info("episode step %d loss %.4f acc %.3f", i, rec["loss"],
                         rec["acc"])
        return self.history

    # ---- config #5: K-shot adaptation to an unseen domain ----------------------

    def adapt(self, support_audio: np.ndarray, support_labels: np.ndarray,
              n_classes: int = 2) -> jnp.ndarray:
        return kshot_adapt(self.embed, self.params, jnp.asarray(support_audio),
                           jnp.asarray(support_labels), n_classes)

    def score(self, audio: np.ndarray, prototypes: jnp.ndarray) -> np.ndarray:
        return np.asarray(self._score_fn(self.params, self.batch_stats,
                                         jnp.asarray(audio), prototypes))

    def score_protocol(self, dataset: AsvspoofDataset, prototypes: jnp.ndarray,
                      batch_size: int = 32) -> Dict[str, float]:
        """CM scores for every utterance in the dataset's protocol."""
        utts = dataset.protocol.utt_ids
        out: Dict[str, float] = {}
        for i in range(0, len(utts), batch_size):
            chunk = utts[i : i + batch_size]
            audio, _ = dataset.load_batch(chunk)   # native thread-pooled decode
            pad = batch_size - len(chunk)
            if pad:
                audio = np.pad(audio, [(0, pad), (0, 0)])
            s = np.asarray(self._score_fn(self.params, self.batch_stats,
                                          jnp.asarray(audio), prototypes))
            for u, sc in zip(chunk, s):
                out[u] = float(sc)
        return out
