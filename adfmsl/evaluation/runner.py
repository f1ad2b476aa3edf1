"""Batched evaluation runner: protocol -> score file (+ metrics).

The serve/inference analog of the reference's ``produce_evaluation_file``
(maze2.py:333-343; robust variant Maze6_Eval.py:436-570). Differences by design:
- fixed-shape batches with a validity mask, so the full 71,237-utterance LA protocol
  keeps exact utterance count without dynamic shapes (SURVEY.md section 7 risk list);
- scoring runs under jit (and under a Mesh via sharded inputs for multi-chip eval);
- non-finite scores are replaced and counted, mirroring the reference's NaN guard
  (Maze6_Eval.py:474-493) but branchlessly on device.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import numpy as np

from adfmsl.data.pipeline import DataLoader
from adfmsl.evaluation.metrics import compute_all_metrics
from adfmsl.evaluation.scores import write_score_file
from adfmsl.train.state import TrainState

log = logging.getLogger(__name__)


@dataclass
class EvalResult:
    utt_ids: List[str]
    scores: np.ndarray
    n_nonfinite: int
    metrics: Optional[Dict[str, float]] = None
    features: Optional[np.ndarray] = None   # (N, D) when collect_features


def produce_scores(state: TrainState, loader: DataLoader,
                   eval_step=None, mesh=None,
                   collect_features: bool = False) -> EvalResult:
    """Run batched inference over the loader; returns per-utterance scores in
    protocol order (masked padding rows dropped).

    With ``mesh``, each batch is sharded over the mesh's data axis (params are
    assumed already placed — replicated or TP-sharded via parallel.tp) so the
    71k-utterance protocol streams across all chips (SURVEY.md 2.9 eval sharding).

    ``collect_features=True`` additionally gathers the models' pooled
    embeddings in the SAME pass (one forward over the protocol, not two) —
    used by adfmsl-eval --dump_embeddings.
    """
    if eval_step is not None and collect_features:
        raise ValueError(
            "produce_scores: a caller-supplied eval_step cannot be combined with "
            "collect_features=True (the default step is what threads features "
            "through); either drop eval_step or collect features in your own step")
    if eval_step is None:
        import jax.numpy as jnp

        def _step(state, audio, labels, mask):
            variables = {"params": state.params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            out = state.apply_fn(variables, audio, train=False)
            res = {"scores": out["scores"], "correct": jnp.array(0),
                   "count": jnp.sum(mask)}
            if collect_features:
                res["features"] = out["features"]
            return res

        eval_step = jax.jit(_step)

    ids: List[str] = []
    all_scores: List[np.ndarray] = []
    n_bad = 0
    import jax.numpy as jnp

    from adfmsl.parallel.mesh import pad_batch_to_devices, shard_batch

    n_data = mesh.devices.shape[0] if mesh is not None else 1
    errors = 0
    pending = []
    for batch in loader:
        audio, label, bmask = batch.audio, batch.label, batch.mask
        if mesh is not None:
            audio, label, bmask = pad_batch_to_devices(audio, label, bmask, n_data)
            audio, label, bmask = shard_batch(mesh, (audio, label, bmask))
            with mesh:
                out = eval_step(state, audio, label, bmask)
            # scores stay on device (drain loop below); device-padding rows are
            # dropped there by zip against the unpadded utt_ids/mask
        else:
            try:
                out = eval_step(state, jnp.asarray(audio),
                                jnp.asarray(label), jnp.asarray(bmask))
            except Exception as e:  # OOM half-batch retry (Maze6_Eval.py:509-535)
                if "RESOURCE_EXHAUSTED" not in str(e) or len(audio) < 2:
                    raise
                errors += 1
                if errors > 100:    # circuit breaker (Maze6_Eval.py:451)
                    raise
                log.warning("eval batch OOM; retrying in halves")
                h = len(audio) // 2
                out1 = eval_step(state, jnp.asarray(audio[:h]),
                                 jnp.asarray(label[:h]), jnp.asarray(bmask[:h]))
                out2 = eval_step(state, jnp.asarray(audio[h:]),
                                 jnp.asarray(label[h:]), jnp.asarray(bmask[h:]))
                out = {
                    "scores": jnp.concatenate([out1["scores"], out2["scores"]]),
                    "correct": out1["correct"] + out2["correct"],
                    "count": out1["count"] + out2["count"],
                }
                if collect_features:
                    out["features"] = jnp.concatenate(
                        [out1["features"], out2["features"]])
        # keep scores as device arrays: JAX's async dispatch pipelines the next
        # batch while this one computes (per-batch np.asarray would serialize on
        # the ~28 ms host<->device sync and dominate 71k-utterance protocols)
        pending.append((out["scores"], out.get("features"),
                        batch.utt_ids, batch.mask))

    feats: List[np.ndarray] = []
    for dev_scores, dev_feats, utt_ids, mask in pending:
        s = np.asarray(dev_scores)
        f = np.asarray(dev_feats) if dev_feats is not None else None
        bad = ~np.isfinite(s)
        if bad.any():
            n_bad += int(bad.sum())
            s = np.where(bad, -1e9, s)
        for i, (u, sc, m) in enumerate(zip(utt_ids, s, mask)):
            if m:
                ids.append(u)
                all_scores.append(sc)
                if f is not None:
                    feats.append(f[i])
    if n_bad:
        log.warning("replaced %d non-finite scores", n_bad)
    return EvalResult(ids, np.asarray(all_scores, dtype=np.float64), n_bad,
                      features=(np.asarray(feats, dtype=np.float32)
                                if collect_features else None))


@dataclass
class EmbeddingResult:
    utt_ids: List[str]
    features: np.ndarray            # (N, D) pooled embeddings
    scores: np.ndarray              # (N,)


def produce_embeddings(state: TrainState, loader: DataLoader,
                       mesh=None) -> EmbeddingResult:
    """Per-utterance pooled embeddings (the models' 'features' output) plus CM
    scores — the real-data input for the embedding-geometry figures. The
    reference analyzer synthesised its t-SNE/plateau panels from np.random
    (comprehensive_thesis_analyser.py:315-366); this computes the actual
    geometry instead. One forward pass (produce_scores collect_features),
    mesh-shardable like scoring."""
    res = produce_scores(state, loader, mesh=mesh, collect_features=True)
    return EmbeddingResult(res.utt_ids, res.features, res.scores)


def evaluate_to_file(state: TrainState, loader: DataLoader, score_path: str,
                     labels: Optional[Dict[str, int]] = None,
                     eval_step=None, mesh=None,
                     collect_features: bool = False,
                     asv_scores: Optional[str] = None) -> EvalResult:
    res = produce_scores(state, loader, eval_step, mesh=mesh,
                         collect_features=collect_features)
    n = write_score_file(score_path, res.utt_ids, res.scores)
    log.info("wrote %d scores to %s", n, score_path)
    if labels:
        y = np.asarray([labels[u] for u in res.utt_ids if u in labels])
        s = np.asarray([sc for u, sc in zip(res.utt_ids, res.scores) if u in labels])
        costs = None
        if asv_scores:
            # official t-DCF: ASV operating point measured from the organizers'
            # ASV score file rather than the fixed typical-LA approximation
            from adfmsl.evaluation.metrics import costs_from_asv_scores
            costs = costs_from_asv_scores(asv_scores)
        res.metrics = compute_all_metrics(s, y, tdcf_costs=costs)
    return res
