"""Figure rendering: ROC / PR / score distributions / model comparison bars.

Rebuild of the plotting layers (``comprehensive_evaluation.py:700-781`` ROC/PR/score
plots, ``Eval.py:21-733`` comparison dashboards, ``comprehensive_thesis_analyser.py``
comparison panels — minus that file's np.random-synthesised panels, which are
deliberately NOT reproduced: every pixel here comes from real scores). Matplotlib is
imported lazily with the Agg backend so headless use always works.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from adfmsl.evaluation.metrics import compute_eer, roc_points


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_roc(scores_by_model: Dict[str, Sequence[float]], labels_by_model,
             out_path: str) -> str:
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 5))
    for name, scores in scores_by_model.items():
        y = np.asarray(labels_by_model[name])
        fpr, fnr, _ = roc_points(np.asarray(scores), y)
        eer, _ = compute_eer(scores, y)
        ax.plot(fpr, 1 - fnr, label=f"{name} (EER {eer:.3f})")
    ax.plot([0, 1], [0, 1], "k--", lw=0.5)
    ax.set_xlabel("False positive rate")
    ax.set_ylabel("True positive rate")
    ax.set_title("ROC")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_det(scores_by_model: Dict[str, Sequence[float]], labels_by_model,
             out_path: str) -> str:
    """DET curve (the standard ASVspoof presentation): FNR vs FPR on probit axes."""
    from scipy.stats import norm

    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 5))
    for name, scores in scores_by_model.items():
        y = np.asarray(labels_by_model[name])
        fpr, fnr, _ = roc_points(np.asarray(scores), y)
        keep = (fpr > 0) & (fpr < 1) & (fnr > 0) & (fnr < 1)
        ax.plot(norm.ppf(fpr[keep]), norm.ppf(fnr[keep]), label=name)
    ticks = [0.001, 0.01, 0.05, 0.2, 0.5]
    ax.set_xticks(norm.ppf(ticks))
    ax.set_xticklabels([f"{t*100:g}" for t in ticks])
    ax.set_yticks(norm.ppf(ticks))
    ax.set_yticklabels([f"{t*100:g}" for t in ticks])
    ax.set_xlabel("False positive rate (%)")
    ax.set_ylabel("False negative rate (%)")
    ax.set_title("DET")
    ax.grid(alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_score_distributions(scores: Sequence[float], labels: Sequence[int],
                             out_path: str, name: str = "model") -> str:
    plt = _plt()
    s, y = np.asarray(scores), np.asarray(labels)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(s[y == 1], bins=50, alpha=0.6, density=True, label="bonafide")
    ax.hist(s[y == 0], bins=50, alpha=0.6, density=True, label="spoof")
    _, thr = compute_eer(s, y)
    ax.axvline(thr, color="k", ls="--", lw=1, label=f"EER thr {thr:.2f}")
    ax.set_xlabel("CM score")
    ax.set_ylabel("density")
    ax.set_title(f"Score distributions — {name}")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_model_comparison(per_model: Dict[str, Dict[str, float]], out_path: str,
                          metric: str = "eer") -> str:
    """Baseline-vs-FMSL paired bars (maze_models_comparison.png analog)."""
    plt = _plt()
    bases = sorted(m for m in per_model if not m.endswith("_fmsl"))
    fig, ax = plt.subplots(figsize=(max(6, len(bases) * 1.2), 4))
    xs = np.arange(len(bases))
    base_v = [per_model[b][metric] for b in bases]
    fmsl_v = [per_model.get(f"{b}_fmsl", {}).get(metric, np.nan) for b in bases]
    ax.bar(xs - 0.2, base_v, width=0.4, label="baseline")
    ax.bar(xs + 0.2, fmsl_v, width=0.4, label="+FMSL")
    ax.set_xticks(xs)
    ax.set_xticklabels(bases, rotation=30)
    ax.set_ylabel(metric.upper())
    ax.set_title(f"Baseline vs FMSL — {metric}")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
