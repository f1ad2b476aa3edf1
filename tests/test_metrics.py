import numpy as np
import pytest
from sklearn.metrics import average_precision_score, roc_auc_score, roc_curve

from adfmsl.evaluation import (
    accuracy_at_threshold,
    auc_score,
    average_precision,
    bootstrap_metric,
    compute_all_metrics,
    compute_eer,
    join_scores_with_labels,
    min_tdcf,
    paired_bootstrap_test,
    read_score_file,
    simplified_min_dcf,
    write_score_file,
)

RNG = np.random.default_rng(0)
# well-separated synthetic scores
LABELS = np.r_[np.ones(300, dtype=int), np.zeros(700, dtype=int)]
SCORES = np.r_[RNG.normal(2.0, 1.0, 300), RNG.normal(-1.0, 1.0, 700)]


def _sklearn_eer(scores, labels):
    fpr, tpr, _ = roc_curve(labels, scores, pos_label=1)
    fnr = 1 - tpr
    i = np.nanargmin(np.abs(fnr - fpr))
    return (fpr[i] + fnr[i]) / 2


def test_eer_matches_sklearn_reference():
    eer, thr = compute_eer(SCORES, LABELS)
    assert eer == pytest.approx(_sklearn_eer(SCORES, LABELS), abs=2e-3)
    assert 0.0 < eer < 0.2


def test_eer_perfect_and_random():
    y = np.r_[np.ones(50, dtype=int), np.zeros(50, dtype=int)]
    s = np.r_[np.ones(50), np.zeros(50)]
    assert compute_eer(s, y)[0] == pytest.approx(0.0, abs=1e-9)
    s_flip = 1 - s
    assert compute_eer(s_flip, y)[0] == pytest.approx(1.0, abs=1e-9)


def test_auc_matches_sklearn():
    assert auc_score(SCORES, LABELS) == pytest.approx(
        roc_auc_score(LABELS, SCORES), abs=1e-6)


def test_average_precision_matches_sklearn():
    assert average_precision(SCORES, LABELS) == pytest.approx(
        average_precision_score(LABELS, SCORES), abs=1e-6)


def test_simplified_min_dcf_reference_semantics():
    v = simplified_min_dcf(SCORES, LABELS)
    fpr, tpr, _ = roc_curve(LABELS, SCORES, pos_label=1)
    assert v == pytest.approx(np.min(fpr + (1 - tpr)), abs=1e-6)


def test_min_tdcf_properties():
    good = min_tdcf(SCORES, LABELS)
    rand = min_tdcf(RNG.standard_normal(1000), LABELS)
    assert 0.0 <= good < rand <= 1.0 + 1e-9


def test_compute_all_metrics_keys():
    m = compute_all_metrics(SCORES, LABELS)
    for k in ["eer", "min_dcf", "min_tdcf", "auc", "avg_precision", "accuracy",
              "n_bonafide", "n_spoof"]:
        assert k in m
    assert m["n_bonafide"] == 300 and m["n_spoof"] == 700
    assert m["accuracy"] == pytest.approx(
        accuracy_at_threshold(SCORES, LABELS, m["eer_threshold"]))


def test_score_file_roundtrip(tmp_path):
    p = str(tmp_path / "maze5_scores.txt")
    ids = [f"LA_E_{i:07d}" for i in range(10)]
    sc = RNG.standard_normal(10)
    assert write_score_file(p, ids, sc) == 10
    back = read_score_file(p)
    assert len(back) == 10
    np.testing.assert_allclose([back[u] for u in ids], sc, rtol=1e-6)
    s, y, missing = join_scores_with_labels(back, {u: i % 2 for i, u in enumerate(ids)})
    assert len(s) == 10 and not missing


def test_score_file_tolerates_garbage(tmp_path):
    p = str(tmp_path / "s.txt")
    with open(p, "w") as fh:
        fh.write("header line\nutt1 0.5\nutt2 notanumber\nutt3 -1.25 extra\n")
    back = read_score_file(p)
    assert back == {"utt1": 0.5, "utt3": -1.25}


def test_bootstrap_ci_covers_point():
    r = bootstrap_metric(SCORES, LABELS, n_resamples=100, seed=1)
    assert r.ci_low <= r.point <= r.ci_high
    assert r.samples.shape == (100,)


def test_paired_bootstrap_detects_difference():
    better = SCORES + LABELS * 2.0      # strictly better separation
    res = paired_bootstrap_test(better, SCORES, LABELS, n_resamples=100, seed=1)
    assert res["diff"] < 0              # lower EER for the better model
    assert res["p_value"] <= 0.05
