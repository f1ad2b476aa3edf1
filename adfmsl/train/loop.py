"""Epoch driver: the generic replacement for every maze file's ``__main__`` block
(maze2.py:377-495 and 15 variants — SURVEY.md 3.1/3.2 call stacks).

Seed discipline: one root key from TrainConfig.seed (reference seeds 1234,
maze2.py:308-317); per-step keys derived by fold_in so runs are exactly reproducible
regardless of host threading.
"""
from __future__ import annotations

import dataclasses
import logging
import time
from typing import Callable, Dict, List, Optional

import jax
import numpy as np

from adfmsl.config.base import ExperimentConfig
from adfmsl.data.pipeline import AsvspoofDataset, DataLoader
from adfmsl.models.mazes import build_model
from adfmsl.train.checkpoint import CheckpointManager
from adfmsl.train.early_stop import EarlyStopper
from adfmsl.train.optim import make_optimizer
from adfmsl.train.state import TrainState
from adfmsl.train.steps import make_eval_step, make_train_step
from adfmsl.utils.rng import key_for_step, set_global_seed

log = logging.getLogger(__name__)


@dataclasses.dataclass
class EpochMetrics:
    epoch: int
    train_loss: float
    train_acc: float
    dev_acc: float
    seconds: float
    skipped_batches: int = 0
    dev_eer: float = float("nan")


class Trainer:
    """Drives train/dev epochs over host DataLoaders with a jitted step."""

    def __init__(self, exp: ExperimentConfig, train_loader: DataLoader,
                 dev_loader: Optional[DataLoader] = None,
                 checkpoint_dir: Optional[str] = None,
                 metric_hook: Optional[Callable[[EpochMetrics], None]] = None,
                 noise_bank=None, rir_bank=None, mesh=None,
                 persist_config: bool = True):
        self.exp = exp
        self.train_loader = train_loader
        self.dev_loader = dev_loader
        self.metric_hook = metric_hook
        # data-parallel training: batches shard over the mesh's data axis,
        # params/opt state replicate, XLA inserts the psums over ICI
        # (SURVEY.md 2.9 — net-new vs the single-device reference)
        self.mesh = mesh
        self.root_key = set_global_seed(exp.train.seed)

        self.model = build_model(exp.model)
        sample = np.zeros((exp.train.batch_size, exp.data.cut), dtype=np.float32)
        variables = self.model.init(
            {"params": jax.random.fold_in(self.root_key, 0)},
            jax.numpy.asarray(sample), train=False)
        if exp.model.wav2vec2.pretrained_path or exp.model.wav2vec2.require_pretrained:
            from adfmsl.models.pretrained import inject_pretrained_w2v2

            variables = dict(variables)
            variables["params"] = inject_pretrained_w2v2(
                dict(variables["params"]), exp.model.wav2vec2)
        tx, self.schedule = make_optimizer(exp, max(len(train_loader), 1))
        self.state = TrainState.create(
            apply_fn=self.model.apply,
            params=variables["params"],
            batch_stats=variables.get("batch_stats"),
            tx=tx)
        if mesh is not None:
            from adfmsl.parallel import replicate

            self.state = self.state.replace(
                params=replicate(mesh, self.state.params),
                batch_stats=replicate(mesh, self.state.batch_stats),
                opt_state=replicate(mesh, self.state.opt_state))
        self.train_step = make_train_step(exp, noise_bank=noise_bank,
                                          rir_bank=rir_bank)
        self.eval_step = make_eval_step(exp)
        self.ckpt = (CheckpointManager(checkpoint_dir,
                                       keep_best_k=exp.train.keep_best_k,
                                       metric=exp.train.early_stop_metric,
                                       mode=exp.train.early_stop_mode)
                     if checkpoint_dir else None)
        if checkpoint_dir and persist_config:
            # persist the experiment config beside the checkpoints (the reference's
            # rich-dict checkpoints carry 'config', maze3.py:850-880).
            # persist_config=False for eval-time construction: the eval CLI
            # mutates exp (cut, fused front end) and must NOT clobber the
            # checkpoint's saved training config.
            import os

            from adfmsl.config.yaml_io import save_yaml

            os.makedirs(checkpoint_dir, exist_ok=True)
            save_yaml(exp, os.path.join(checkpoint_dir, "experiment.yaml"))
        self.history: List[EpochMetrics] = []
        self.epochs_run = 0              # advanced by fit(); restore() sets it
        from adfmsl.utils.profiling import StepTimer

        self.timer = StepTimer()

    def _place(self, batch):
        """Host batch -> device arrays (mesh: padded to the data-axis multiple
        and dim-0-sharded; padding rows carry mask=False)."""
        import jax.numpy as jnp

        if self.mesh is None:
            return (jax.numpy.asarray(batch.audio), jnp.asarray(batch.label),
                    jnp.asarray(batch.mask))
        from adfmsl.parallel import pad_batch_to_devices, shard_batch

        n = self.mesh.devices.shape[0]
        a, l, m = pad_batch_to_devices(batch.audio, batch.label, batch.mask, n)
        return shard_batch(self.mesh, (a, l, m))

    def _mesh_ctx(self):
        import contextlib

        return self.mesh if self.mesh is not None else contextlib.nullcontext()

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        # Metrics accumulate ON DEVICE and are drained to the host only every
        # log_every_steps (one ~28 ms sync per drain on the tunneled backend —
        # the per-step float() it replaces capped training at ~35 steps/s; same
        # pattern as evaluation/runner.py's async pipelining).
        import jax.numpy as jnp

        loss_sum = acc_sum = skip_sum = None
        in_s0 = self.timer.totals.get("input", 0.0)
        it = iter(self.train_loader)
        i = 0
        while True:
            with self.timer.phase("input"):
                batch = next(it, None)
            if batch is None:
                break
            rng = key_for_step(self.root_key, "dropout",
                               epoch * 100000 + i)
            with self.timer.phase("train_step"):
                audio, label, mask = self._place(batch)
                with self._mesh_ctx():
                    self.state, m = self.train_step(self.state, audio, label,
                                                    mask, rng)
            if loss_sum is None:
                loss_sum, acc_sum, skip_sum = m["loss"], m["acc"], m["skipped"]
            else:
                loss_sum = loss_sum + m["loss"]
                acc_sum = acc_sum + m["acc"]
                skip_sum = skip_sum + m["skipped"]
            i += 1
            if self.exp.train.log_every_steps and i % self.exp.train.log_every_steps == 0:
                log.info("epoch %d step %d loss %.4f acc %.3f", epoch, i,
                         float(m["loss"]), float(m["acc"]))
        n = max(i, 1)
        in_s = self.timer.totals.get("input", 0.0) - in_s0
        if in_s > 0 and i > 0:
            log.info("epoch %d input wait: %.2fs (%.0f utt/s consumer-side)",
                     epoch, in_s, i * self.train_loader.batch_size / in_s)
        return {"loss": float(loss_sum) / n if loss_sum is not None else 0.0,
                "acc": float(acc_sum) / n if acc_sum is not None else 0.0,
                "skipped": int(skip_sum) if skip_sum is not None else 0}

    def evaluate_accuracy(self, loader: DataLoader) -> float:
        """Dev-set accuracy (reference evaluate_accuracy, maze2.py:319-331)."""
        return self.evaluate_metrics(loader)[0]

    def evaluate_metrics(self, loader: DataLoader):
        """(accuracy, eer) over a labelled loader. EER in the dev loop mirrors
        maze3's in-training metric computation (maze3.py:809-848)."""
        from adfmsl.evaluation.metrics import compute_eer

        # accumulate on device, drain ONCE after the loop: per-batch float()/
        # np.asarray() would cost a ~28 ms host<->device sync each on the
        # tunneled backend (same pattern as train_epoch / runner.produce_scores)
        pending = []
        for batch in loader:
            audio, label, mask = self._place(batch)
            with self._mesh_ctx():
                out = self.eval_step(self.state, audio, label, mask)
            pending.append((out["correct"], out["count"], out["scores"],
                            batch.label, batch.mask))
        host = jax.device_get([(dc, dn, ds) for dc, dn, ds, _, _ in pending])
        correct, count = 0.0, 0.0
        scores, labels = [], []
        for (dc, dn, s), (_, _, _, blabel, bmask) in zip(host, pending):
            correct += float(dc)
            count += float(dn)
            for sc, y, m in zip(s, blabel, bmask):
                if m:
                    scores.append(float(sc))
                    labels.append(int(y))
        acc = correct / max(count, 1.0)
        eer = float("nan")
        if len(set(labels)) == 2:
            eer, _ = compute_eer(np.asarray(scores), np.asarray(labels))
        return acc, eer

    def fit(self, num_epochs: Optional[int] = None) -> List[EpochMetrics]:
        if self.mesh is not None:
            # Padded zero rows would otherwise enter BatchNorm BATCH statistics
            # on every training step (the loss is masked, BN is not) — a silent
            # accuracy bug, so reject instead of padding the train batches.
            # Checks the ACTUAL loader (not just the config): batch size must
            # tile the data axis and partial final batches must be dropped.
            # Eval-only mesh use is fine (eval uses running stats; checked here,
            # not in __init__, so adfmsl-eval --data_parallel keeps working).
            n = self.mesh.devices.shape[0]
            bs = getattr(self.train_loader, "batch_size",
                         self.exp.train.batch_size)
            if bs % n:
                raise ValueError(
                    f"train batch_size={bs} must be divisible by the "
                    f"data-parallel axis size {n}")
            if getattr(self.train_loader, "drop_last", True) is False:
                raise ValueError(
                    "mesh training requires drop_last=True on the train "
                    "loader: a padded partial final batch would pollute "
                    "BatchNorm batch statistics")
        # explicit 0 means ZERO epochs (the profile path passes
        # num_epochs - 1, which may be 0) — only None falls back to the config.
        # The config-driven default is a TOTAL: resuming an interrupted
        # 20-epoch run at epoch 12 trains 8 more, not 20 more. Explicit fit(n)
        # keeps additive semantics (train n MORE epochs from wherever we are).
        if num_epochs is None:
            n = max(0, self.exp.train.num_epochs - self.epochs_run)
        else:
            n = num_epochs
        stopper = None
        if self.exp.train.early_stop_patience > 0:
            stopper = EarlyStopper(self.exp.train.early_stop_patience,
                                   self.exp.train.early_stop_min_delta,
                                   self.exp.train.early_stop_mode)
        plateau = None
        ocfg = self.exp.train.optimizer
        if ocfg.scheduler == "plateau":
            # ReduceLROnPlateau analog (maze3.py:327-374): watches dev EER (or
            # train loss when no dev set) and drops the device-side LR multiplier.
            from adfmsl.train.optim import PlateauTracker, set_plateau_scale

            plateau = PlateauTracker(ocfg.plateau_patience, ocfg.plateau_factor,
                                     mode=ocfg.plateau_mode)
        # epochs continue across fit() calls (profile-then-train, resume):
        # restarting at 0 would reuse per-epoch RNG streams, overwrite
        # checkpoint/metric records, and re-shuffle identically
        first = self.epochs_run
        for epoch in range(first, first + n):
            self.epochs_run = epoch + 1
            t0 = time.time()
            tm = self.train_epoch(epoch)
            dev_acc, dev_eer = ((self.evaluate_metrics(self.dev_loader))
                                if self.dev_loader is not None
                                else (float("nan"), float("nan")))
            em = EpochMetrics(epoch, tm["loss"], tm["acc"], dev_acc,
                              time.time() - t0, tm["skipped"], dev_eer)
            self.history.append(em)
            log.info("epoch %d done: loss %.4f train_acc %.3f dev_acc %.3f "
                     "dev_eer %.3f (%.1fs)", epoch, em.train_loss, em.train_acc,
                     em.dev_acc, em.dev_eer, em.seconds)
            if self.metric_hook:
                self.metric_hook(em)
            if self.ckpt:
                self.ckpt.save(epoch, self.state,
                               {"dev_acc": dev_acc, "dev_eer": dev_eer,
                                "train_loss": tm["loss"]})
            if plateau is not None:
                # 'min' watches dev EER (falling back to train loss without a
                # dev set); 'max' watches dev accuracy (maze6_fmsl plateaus on
                # valid_accuracy, maze6_fmsl_standardized.py:749)
                if plateau.mode == "max":
                    watch = dev_acc if not np.isnan(dev_acc) else tm["acc"]
                else:
                    watch = dev_eer if not np.isnan(dev_eer) else tm["loss"]
                old_scale = plateau.scale
                new_scale = plateau.update(watch)
                if new_scale != old_scale:
                    self.state = self.state.replace(opt_state=set_plateau_scale(
                        self.state.opt_state, new_scale))
                    log.info("plateau: lr scale -> %.4g (watch %.4f)",
                             new_scale, watch)
            stop_value = (dev_eer if self.exp.train.early_stop_metric == "dev_eer"
                          else dev_acc)
            if stopper is not None and not np.isnan(stop_value):
                if stopper.step(stop_value):
                    log.info("early stopping at epoch %d", epoch)
                    break
        return self.history


def make_dataset_and_loader(exp: ExperimentConfig, protocol, audio_dir: str,
                            shuffle: bool, batch_size: Optional[int] = None,
                            drop_last: bool = True, shard_index: int = 0,
                            num_shards: int = 1) -> DataLoader:
    ds = AsvspoofDataset(protocol, audio_dir, cut=exp.data.cut,
                         pad_mode=exp.data.pad_mode,
                         sample_rate=exp.data.sample_rate,
                         use_native_io=exp.data.use_native_io,
                         num_workers=exp.data.num_workers)
    return DataLoader(ds, batch_size or exp.train.batch_size, shuffle=shuffle,
                      drop_last=drop_last, seed=exp.train.seed,
                      prefetch=exp.data.prefetch, shard_index=shard_index,
                      num_shards=num_shards)
