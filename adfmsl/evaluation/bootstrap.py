"""Bootstrap confidence intervals and paired significance testing for model
comparison (comprehensive_evaluation.py:654-698: 1000 resamples + paired t-test)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Tuple

import numpy as np

from adfmsl.evaluation.metrics import compute_eer




def _resample_both_classes(rng, labels, n, max_tries: int = 100):
    """Bootstrap index draw guaranteed to contain both classes: re-draw a
    bounded number of times, then force one index of the missing class (the
    unbounded re-draw loop hung forever on near-single-class label sets)."""
    for _ in range(max_tries):
        idx = rng.integers(0, n, n)
        if len(np.unique(labels[idx])) >= 2:
            return idx
    missing = [c for c in np.unique(labels) if c not in labels[idx]]
    for c in missing:
        pool = np.flatnonzero(labels == c)
        idx[rng.integers(0, n)] = pool[rng.integers(0, len(pool))]
    return idx


@dataclass
class BootstrapResult:
    point: float
    ci_low: float
    ci_high: float
    samples: np.ndarray


def bootstrap_metric(scores, labels, metric_fn: Callable = None,
                     n_resamples: int = 1000, seed: int = 0,
                     ci: float = 0.95) -> BootstrapResult:
    scores = np.asarray(scores)
    labels = np.asarray(labels)
    if metric_fn is None:
        metric_fn = lambda s, y: compute_eer(s, y)[0]
    if len(np.unique(labels)) < 2:
        raise ValueError("bootstrap needs both classes present in labels "
                         "(single-class input would re-draw forever)")
    rng = np.random.default_rng(seed)
    n = len(scores)
    vals = np.empty(n_resamples)
    for i in range(n_resamples):
        idx = _resample_both_classes(rng, labels, n)
        vals[i] = metric_fn(scores[idx], labels[idx])
    a = (1.0 - ci) / 2.0
    return BootstrapResult(float(metric_fn(scores, labels)),
                           float(np.quantile(vals, a)),
                           float(np.quantile(vals, 1 - a)), vals)


def paired_bootstrap_test(scores_a, scores_b, labels, metric_fn: Callable = None,
                          n_resamples: int = 1000, seed: int = 0) -> Dict[str, float]:
    """Paired resampling of (model A, model B) on the SAME utterances; p-value =
    fraction of resamples where the metric difference crosses zero."""
    scores_a, scores_b = np.asarray(scores_a), np.asarray(scores_b)
    labels = np.asarray(labels)
    if metric_fn is None:
        metric_fn = lambda s, y: compute_eer(s, y)[0]
    if len(np.unique(labels)) < 2:
        raise ValueError("paired bootstrap needs both classes present in labels")
    rng = np.random.default_rng(seed)
    n = len(labels)
    diffs = np.empty(n_resamples)
    for i in range(n_resamples):
        idx = _resample_both_classes(rng, labels, n)
        diffs[i] = metric_fn(scores_a[idx], labels[idx]) - metric_fn(scores_b[idx], labels[idx])
    point = metric_fn(scores_a, labels) - metric_fn(scores_b, labels)
    p = float(min((diffs >= 0).mean(), (diffs <= 0).mean()) * 2)
    return {"diff": float(point), "p_value": p,
            "ci_low": float(np.quantile(diffs, 0.025)),
            "ci_high": float(np.quantile(diffs, 0.975))}
