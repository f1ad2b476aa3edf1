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


# ---- official min t-DCF from ASV scores (VERDICT r2 item 6) ----------------------

def test_asv_operating_point_hand_computed(tmp_path):
    """Separable ASV scores with known error rates at the EER threshold."""
    from adfmsl.evaluation import asv_operating_point, parse_asv_scores

    p = str(tmp_path / "asv.txt")
    # official column layout: source key score (evaluate_tDCF_asvspoof19.py)
    lines = []
    # 4 targets: 3 above any nontarget, 1 below -> miss rate 1/4 at EER thr
    for s in (5.0, 4.0, 3.0, 0.5):
        lines.append(f"- target {s}")
    # 4 nontargets: 1 overlapping high -> fa rate 1/4
    for s in (2.5, 0.0, -1.0, -2.0):
        lines.append(f"- nontarget {s}")
    # 2 spoofs below threshold, 2 above -> p_miss_spoof = 0.5
    for s in (4.5, 2.6, -0.5, -1.5):
        lines.append(f"A01 spoof {s}")
    with open(p, "w") as fh:
        fh.write("\n".join(lines) + "\n")

    keys, scores = parse_asv_scores(p)
    assert len(keys) == 12 and (keys == "spoof").sum() == 4
    p_fa, p_miss, p_miss_spoof = asv_operating_point(keys, scores)
    # EER threshold lands where fnr==fpr==0.25: at thr in (0.5, 2.5];
    # roc_points yields thr=2.5 -> non>=2.5 is 1/4, tar<2.5 is 1/4
    assert p_fa == 0.25 and p_miss == 0.25
    assert p_miss_spoof == 0.5


def test_costs_from_asv_scores_changes_tdcf(tmp_path):
    from adfmsl.evaluation import TDCFCosts, costs_from_asv_scores, min_tdcf

    p = str(tmp_path / "asv.txt")
    with open(p, "w") as fh:
        for s in (5.0, 4.0, 3.0, 0.5):
            fh.write(f"- target {s}\n")
        for s in (2.5, 0.0, -1.0, -2.0):
            fh.write(f"- nontarget {s}\n")
        for s in (4.5, 2.6, -0.5, -1.5):
            fh.write(f"A01 spoof {s}\n")
    costs = costs_from_asv_scores(p)
    assert costs.p_fa_asv == 0.25 and costs.p_miss_asv == 0.25
    assert costs.p_miss_spoof_asv == 0.5
    # cost-model constants untouched
    assert costs.p_target == TDCFCosts().p_target
    got = min_tdcf(SCORES, LABELS, costs)
    default = min_tdcf(SCORES, LABELS)
    assert got != default and 0.0 <= got <= 1.0 + 1e-9


def test_min_tdcf_hand_computed_constants(tmp_path):
    """Degenerate CM scores make Pmiss/Pfa trivially known; check the exact
    normalized revised-form value C0+C1*0+C2*0 ... floor."""
    from adfmsl.evaluation import TDCFCosts, min_tdcf

    c = TDCFCosts(p_fa_asv=0.2, p_miss_asv=0.1, p_miss_spoof_asv=0.5)
    # perfectly separable CM: min over thresholds hits Pmiss=0, Pfa=0
    scores = np.array([3.0, 2.5, 2.0, -2.0, -2.5, -3.0])
    labels = np.array([1, 1, 1, 0, 0, 0])
    C0 = c.p_target * c.c_miss * c.p_miss_asv + c.p_nontarget * c.c_fa * c.p_fa_asv
    C1 = c.p_target * c.c_miss - C0
    C2 = c.p_spoof * c.c_fa_spoof * (1.0 - c.p_miss_spoof_asv)
    expected = C0 / (C0 + min(C1, C2))
    np.testing.assert_allclose(min_tdcf(scores, labels, c), expected, rtol=1e-12)


def test_parse_asv_scores_rejects_keyless_line(tmp_path):
    from adfmsl.evaluation import parse_asv_scores

    p = str(tmp_path / "bad.txt")
    with open(p, "w") as fh:
        fh.write("- target 1.0\n- bogus 0.5\n")
    with pytest.raises(ValueError):
        parse_asv_scores(p)


def test_degenerate_tie_warning(caplog):
    """An over-trained model's log-softmax scores can all cancel to exactly
    0.0 in f32 (margin > eps(logsumexp)); EER over ties is meaningless, so
    compute_eer must say so (measured in the e2e saturation regime —
    tests/test_e2e.py fixture notes)."""
    import logging

    from adfmsl.evaluation import compute_eer

    ties = np.zeros(12)
    labels = np.array([1, 0] * 6)
    with caplog.at_level(logging.WARNING, logger="adfmsl.metrics"):
        compute_eer(ties, labels)
    assert any("degenerate score distribution" in r.message for r in caplog.records)

    caplog.clear()
    healthy = np.array([3.0, -2.0, 2.5, -1.0, 1.5, -2.5] * 2)
    with caplog.at_level(logging.WARNING, logger="adfmsl.metrics"):
        compute_eer(healthy, labels)
    assert not any("degenerate" in r.message for r in caplog.records)
