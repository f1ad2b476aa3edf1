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
                 noise_bank=None, rir_bank=None):
        self.exp = exp
        self.train_loader = train_loader
        self.dev_loader = dev_loader
        self.metric_hook = metric_hook
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
        self.train_step = make_train_step(exp, noise_bank=noise_bank,
                                          rir_bank=rir_bank)
        self.eval_step = make_eval_step(exp)
        self.ckpt = (CheckpointManager(checkpoint_dir,
                                       keep_best_k=exp.train.keep_best_k,
                                       metric=exp.train.early_stop_metric,
                                       mode=exp.train.early_stop_mode)
                     if checkpoint_dir else None)
        if checkpoint_dir:
            # persist the experiment config beside the checkpoints (the reference's
            # rich-dict checkpoints carry 'config', maze3.py:850-880)
            import os

            from adfmsl.config.yaml_io import save_yaml

            os.makedirs(checkpoint_dir, exist_ok=True)
            save_yaml(exp, os.path.join(checkpoint_dir, "experiment.yaml"))
        self.history: List[EpochMetrics] = []
        from adfmsl.utils.profiling import StepTimer

        self.timer = StepTimer()

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        losses, accs, skipped = [], [], 0
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
                self.state, m = self.train_step(
                    self.state, jax.numpy.asarray(batch.audio),
                    jax.numpy.asarray(batch.label),
                    jax.numpy.asarray(batch.mask), rng)
                losses.append(float(m["loss"]))
            accs.append(float(m["acc"]))
            skipped += int(m["skipped"])
            i += 1
            if self.exp.train.log_every_steps and i % self.exp.train.log_every_steps == 0:
                log.info("epoch %d step %d loss %.4f acc %.3f", epoch, i,
                         losses[-1], accs[-1])
        return {"loss": float(np.mean(losses)) if losses else 0.0,
                "acc": float(np.mean(accs)) if accs else 0.0,
                "skipped": skipped}

    def evaluate_accuracy(self, loader: DataLoader) -> float:
        """Dev-set accuracy (reference evaluate_accuracy, maze2.py:319-331)."""
        return self.evaluate_metrics(loader)[0]

    def evaluate_metrics(self, loader: DataLoader):
        """(accuracy, eer) over a labelled loader. EER in the dev loop mirrors
        maze3's in-training metric computation (maze3.py:809-848)."""
        from adfmsl.evaluation.metrics import compute_eer

        correct, count = 0.0, 0.0
        scores, labels = [], []
        for batch in loader:
            out = self.eval_step(self.state, jax.numpy.asarray(batch.audio),
                                 jax.numpy.asarray(batch.label),
                                 jax.numpy.asarray(batch.mask))
            correct += float(out["correct"])
            count += float(out["count"])
            s = np.asarray(out["scores"])
            for sc, y, m in zip(s, batch.label, batch.mask):
                if m:
                    scores.append(float(sc))
                    labels.append(int(y))
        acc = correct / max(count, 1.0)
        eer = float("nan")
        if len(set(labels)) == 2:
            eer, _ = compute_eer(np.asarray(scores), np.asarray(labels))
        return acc, eer

    def fit(self, num_epochs: Optional[int] = None) -> List[EpochMetrics]:
        n = num_epochs or self.exp.train.num_epochs
        stopper = None
        if self.exp.train.early_stop_patience > 0:
            stopper = EarlyStopper(self.exp.train.early_stop_patience,
                                   self.exp.train.early_stop_min_delta,
                                   self.exp.train.early_stop_mode)
        for epoch in range(n):
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
                         sample_rate=exp.data.sample_rate)
    return DataLoader(ds, batch_size or exp.train.batch_size, shuffle=shuffle,
                      drop_last=drop_last, seed=exp.train.seed,
                      prefetch=exp.data.prefetch, shard_index=shard_index,
                      num_shards=num_shards)
