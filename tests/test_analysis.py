"""Comparison / figures / metrics-logging tests (comprehensive_evaluation.py and
tensorboardX-replacement analogs)."""
import os

import numpy as np
import pytest

from adfmsl.analysis import (
    ComparisonResult,
    REFERENCE_RESULTS,
    compare_models,
    detect_architecture,
    plot_det,
    plot_model_comparison,
    plot_roc,
    plot_score_distributions,
    results_latex,
)
from adfmsl.utils import MetricsLogger, read_metrics

RNG = np.random.default_rng(0)
N = 400
LABELS = {f"u{i}": int(i % 2) for i in range(N)}
GOOD = {f"u{i}": float((i % 2) * 2 + RNG.normal(0, 0.7)) for i in range(N)}
WEAK = {f"u{i}": float((i % 2) * 0.5 + RNG.normal(0, 1.0)) for i in range(N)}


def test_compare_models_significance():
    res = compare_models(GOOD, WEAK, LABELS, "good", "weak", n_resamples=200)
    assert res.metrics_a["eer"] < res.metrics_b["eer"]
    assert res.significance["diff"] < 0
    assert res.significance["p_value"] < 0.05
    md = res.markdown()
    assert "Better model: good" in md and "significant" in md
    assert res.diagnostics["n_common"] == N


def test_compare_models_requires_overlap():
    with pytest.raises(ValueError):
        compare_models({"a": 1.0}, {"b": 2.0}, {"a": 1, "b": 0})


def test_detect_architecture():
    import jax
    import jax.numpy as jnp
    from adfmsl.config import make_experiment
    from adfmsl.models import build_model

    exp = make_experiment("maze6_fmsl")
    exp.model.wav2vec2.model_name = "tiny"
    m = build_model(exp.model)
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 4000)), train=False)
    info = detect_architecture(v["params"])
    assert info["has_wav2vec2"] and info["has_fmsl"]
    assert info["n_prototypes"] == 8            # maze6_fmsl drift
    assert info["fmsl_dim"] == 512
    assert info["wav2vec2_layers"] == 2         # tiny arch


def test_figures_render(tmp_path):
    scores = np.asarray([GOOD[f"u{i}"] for i in range(N)])
    labels = np.asarray([LABELS[f"u{i}"] for i in range(N)])
    by_model = {"good": scores, "weak": np.asarray([WEAK[f"u{i}"] for i in range(N)])}
    lab_by = {"good": labels, "weak": labels}
    for fn, name in [(plot_roc, "roc.png"), (plot_det, "det.png")]:
        out = fn(by_model, lab_by, str(tmp_path / name))
        assert os.path.getsize(out) > 1000
    out = plot_score_distributions(scores, labels, str(tmp_path / "dist.png"))
    assert os.path.getsize(out) > 1000
    out = plot_model_comparison(
        {k: {"eer": v["eer"]} for k, v in REFERENCE_RESULTS.items()},
        str(tmp_path / "cmp.png"))
    assert os.path.getsize(out) > 1000


def test_results_latex():
    tex = results_latex({"maze5": {"eer": 0.1, "min_dcf": 0.2, "min_tdcf": 0.3,
                                   "auc": 0.9, "accuracy": 0.8}})
    assert r"\begin{tabular}" in tex and "maze5" in tex


def test_metrics_logger_roundtrip(tmp_path):
    log = MetricsLogger(str(tmp_path / "run1"), also_tensorboard=False)
    for i in range(5):
        log.add_scalar("train/loss", 1.0 / (i + 1), i)
    log.add_scalars({"dev/acc": 0.9, "dev/eer": 0.1}, 4)
    log.close()
    back = read_metrics(str(tmp_path / "run1"))
    assert len(back["train/loss"]) == 5
    assert back["train/loss"][0] == (0, 1.0)
    assert back["dev/acc"] == [(4, 0.9)]


def test_model_summary_and_param_count():
    import jax
    import jax.numpy as jnp
    from adfmsl.analysis import check_compatibility, count_params, model_summary
    from adfmsl.config import make_experiment
    from adfmsl.models import build_model

    exp = make_experiment("maze5")
    exp.data.cut = 4000
    m = build_model(exp.model)
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 4000)), train=False)
    n = count_params(v["params"])
    # maze5 reference scale ~1.06M params (Eval.py:31-39); same order of magnitude
    # (block plans follow maze4.py:192-210, exact fc sizes differ slightly)
    assert 0.5e6 < n < 5e6
    s = model_summary(v["params"])
    assert "TOTAL" in s and "trunk" in s

    diff = check_compatibility(v["params"], v["params"])
    assert not any(diff.values())
    broken = dict(v["params"])
    broken.pop("fc2")
    diff2 = check_compatibility(v["params"], broken)
    assert any("fc2" in k for k in diff2["missing"])


def test_trend_and_landscape_panels(tmp_path):
    """Reference analyzer panels (comprehensive_thesis_analyser.py:406,461) from
    real metrics — baseline/FMSL pairs with improvement annotations."""
    from adfmsl.analysis import plot_fmsl_trend, plot_performance_landscape

    per_model = {k: {"eer": v["eer"]} for k, v in REFERENCE_RESULTS.items()}
    out = plot_fmsl_trend(per_model, str(tmp_path / "trend.png"))
    assert os.path.getsize(out) > 1000
    out = plot_performance_landscape(per_model, str(tmp_path / "landscape.png"))
    assert os.path.getsize(out) > 1000


def test_check_against_reference():
    from adfmsl.analysis import check_against_reference

    per_model = {
        "maze5": {"eer": REFERENCE_RESULTS["maze5"]["eer"] + 0.0005},
        "maze6": {"eer": REFERENCE_RESULTS["maze6"]["eer"] + 0.05},
        "not_published": {"eer": 0.1},
    }
    out = check_against_reference(per_model, tol_eer=0.001)
    assert out["maze5"]["within"] and not out["maze6"]["within"]
    assert "not_published" not in out
    assert out["maze6"]["delta"] == pytest.approx(0.05, abs=1e-9)


def test_cli_analyze_figures_and_regression(tmp_path):
    """adfmsl-analyze --figures --regression over synthetic score files."""
    from adfmsl.cli.analyze import main

    proto = tmp_path / "proto.txt"
    with open(proto, "w") as fh:
        for i in range(N):
            lab = "bonafide" if i % 2 else "spoof"
            fh.write(f"SPK u{i} - A01 {lab}\n")
    sdir = tmp_path / "scores"
    sdir.mkdir()
    for name, sc in [("maze5", GOOD), ("maze5_fmsl", GOOD)]:
        with open(sdir / f"{name}_scores.txt", "w") as fh:
            for u, v in sc.items():
                fh.write(f"{u} {v}\n")
    out = tmp_path / "out"
    rc = main(["--scores_dir", str(sdir), "--protocol", str(proto),
               "--output_dir", str(out), "--figures", "--regression", "0.001"])
    assert rc == 2   # synthetic scores are nowhere near the published EERs
    for f in ["roc.png", "det.png", "model_comparison.png",
              "trend_visualizations.png", "comprehensive_histogram.png",
              "maze5_score_dist.png"]:
        assert (out / f).exists(), f


def test_embedding_dump_and_geometry_figure(fixture_dir, tmp_path, capsys):
    """adfmsl-eval --dump_embeddings -> adfmsl-analyze --embeddings renders the
    real-data geometry panel (replacing the reference's np.random-synthesised
    t-SNE panels, comprehensive_thesis_analyser.py:315-366)."""
    import numpy as np

    from adfmsl.cli.analyze import main as analyze_main
    from adfmsl.cli.evaluate import main as eval_main

    npz = str(tmp_path / "maze5_fmsl_emb.npz")
    rc = eval_main(["--model_type", "maze5_fmsl", "--cut", "4000",
                    "--protocol", fixture_dir["eval"]["protocol"],
                    "--data_dir", fixture_dir["eval"]["audio_dir"],
                    "--batch_size", "6",
                    "--output", str(tmp_path / "s.txt"),
                    "--dump_embeddings", npz])
    assert rc == 0
    with np.load(npz) as z:
        n = len(z["utt_ids"])
        assert n == 16 and z["features"].shape[0] == n
        assert np.isfinite(z["features"]).all()
        assert "prototypes" in z.files and "class_weights" in z.files
        # stored normalized, as the head consumes them
        np.testing.assert_allclose(np.linalg.norm(z["prototypes"], axis=-1),
                                   1.0, rtol=1e-5)

    out_dir = str(tmp_path / "figs")
    rc = analyze_main(["--protocol", fixture_dir["eval"]["protocol"],
                       "--output_dir", out_dir, "--embeddings", npz])
    assert rc == 0
    assert os.path.exists(os.path.join(
        out_dir, "embedding_geometry_maze5_fmsl_emb.png"))


def test_training_curves_figure(tmp_path, fixture_dir):
    """adfmsl-analyze --curves renders per-tag training curves from the JSONL
    metric logs (the figure half of the reference's tensorboardX logging)."""
    from adfmsl.cli.analyze import main as analyze_main
    from adfmsl.utils import MetricsLogger

    log_dir = str(tmp_path / "logs")
    mlog = MetricsLogger(log_dir, also_tensorboard=False)
    for epoch, (loss, acc) in enumerate([(1.0, 0.5), (0.5, 0.8), (0.2, 0.95)]):
        mlog.add_scalars({"train/loss": loss, "dev/acc": acc}, epoch)
    mlog.close()

    out_dir = str(tmp_path / "figs")
    rc = analyze_main(["--protocol", fixture_dir["eval"]["protocol"],
                       "--output_dir", out_dir, "--curves", log_dir])
    assert rc == 0
    assert os.path.exists(os.path.join(out_dir, "training_curves.png"))


@pytest.mark.slow
def test_batch_orchestrator_cli(fixture_dir, tmp_path, capsys):
    """adfmsl-batch trains every model in the YAML plan, scores the eval split,
    and aggregates (model_trainer.py:20-128 analog) — here with two tiny models
    on the synthetic fixture."""
    import yaml

    from adfmsl.cli.batch import main as batch_main

    plan = {"models": ["lcnn1d_lfcc", "lcnn_lfcc"],
            "overrides": {"train.num_epochs": 1, "train.batch_size": 6,
                          "data.cut": 4000,
                          "model.spec_augment.enabled": False},
            "per_model": {"lcnn_lfcc": {"train.optimizer.lr": 2e-4}}}
    cfg = tmp_path / "plan.yaml"
    cfg.write_text(yaml.safe_dump(plan))
    out_dir = str(tmp_path / "batch_out")
    rc = batch_main(["--config", str(cfg),
                     "--train_protocol", fixture_dir["train"]["protocol"],
                     "--train_dir", fixture_dir["train"]["audio_dir"],
                     "--eval_protocol", fixture_dir["eval"]["protocol"],
                     "--eval_dir", fixture_dir["eval"]["audio_dir"],
                     "--output_dir", out_dir])
    assert rc == 0
    for name in plan["models"]:
        assert os.path.exists(os.path.join(out_dir, "scores",
                                           f"{name}_scores.txt"))
    assert os.path.exists(os.path.join(out_dir, "results.csv"))
    assert "lcnn1d_lfcc" in capsys.readouterr().out
