"""Orbax checkpointing: full train state + best-metric retention.

Replaces the reference's two tiers (SURVEY.md section 5): per-epoch ``state_dict``
saves with best-file deletion (main.py:239-254, maze6.py:731-741) and rich-dict resume
checkpoints {epoch, model, optimizer, loss, eer, config} (maze3.py:850-880, :377-389).
Here both are one thing: an Orbax CheckpointManager over the whole TrainState plus a
metadata dict, with ``best_fn`` retention.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from adfmsl.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep_best_k: int = 1, keep_last: int = 1,
                 metric: str = "dev_acc", mode: str = "max"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.metric = metric

        def best_fn(m):
            # NaN (no dev set) or missing metrics must rank WORST, not sort
            # arbitrarily / beat every real value — otherwise best-k retention
            # keeps an arbitrary epoch and may delete the newest checkpoint.
            # Among metric-less checkpoints the NEWEST wins (epoch tiebreak),
            # so training without a dev set degrades to keep-latest.
            import math

            v = m.get(metric)
            if v is None or (isinstance(v, float) and math.isnan(v)):
                e = m.get("_epoch", 0.0)
                return (-1e30 + e) if mode == "max" else (1e30 - e)
            return v

        options = ocp.CheckpointManagerOptions(
            max_to_keep=max(keep_best_k, keep_last),
            best_fn=best_fn,
            best_mode=mode,
            create=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, epoch: int, state: TrainState, metrics: Dict[str, float]) -> None:
        payload = {"params": state.params, "batch_stats": state.batch_stats,
                   "opt_state": state.opt_state, "step": state.step}
        md = {k: float(v) for k, v in metrics.items()}
        md["_epoch"] = float(epoch)        # best_fn tiebreak for NaN metrics
        self._mgr.save(epoch, args=ocp.args.StandardSave(payload), metrics=md)
        self._mgr.wait_until_finished()

    def restore(self, state: TrainState, epoch: Optional[int] = None
                ) -> Tuple[TrainState, int]:
        """Restore into the (abstract) structure of ``state``; returns (state, epoch)."""
        if epoch is None:
            epoch = self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        template = {"params": state.params, "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state, "step": state.step}
        restored = self._mgr.restore(epoch, args=ocp.args.StandardRestore(template))
        return state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"], step=restored["step"]), epoch

    def restore_params(self, params, batch_stats, epoch: Optional[int] = None):
        """Restore only params + batch_stats (structure-templated), ignoring the
        saved opt_state — for transferring a trained trunk into a DIFFERENT
        training setup (e.g. few-shot meta-training warm-started from a
        supervised checkpoint, whose optimizer tree won't match). Prefers the
        best epoch, falls back to latest. Returns (params, batch_stats, epoch)."""
        if epoch is None:
            epoch = self._mgr.best_step()
            if epoch is None:
                epoch = self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        restored = self._mgr.restore(epoch)   # saved structure, no template
        merged_params = jax.tree.map(lambda _, new: jnp.asarray(new), params,
                                     restored["params"])
        stats = batch_stats
        if batch_stats is not None and restored.get("batch_stats") is not None:
            stats = jax.tree.map(lambda _, new: jnp.asarray(new), batch_stats,
                                 restored["batch_stats"])
        return merged_params, stats, epoch

    def best_epoch(self) -> Optional[int]:
        return self._mgr.best_step()

    def all_epochs(self):
        return sorted(self._mgr.all_steps())

    def close(self):
        self._mgr.close()
