"""End-to-end slice (SURVEY.md section 7 build-order step 3): train maze5 (SincConv ->
SE-ResNet -> focal loss — no pretrained dependency) on the separable synthetic
fixture, produce a reference-format score file on the eval split, and check the EER
beats chance by a wide margin. Also drives the CLI surfaces."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy convergence e2e lane (CLAUDE.md test lanes)

from adfmsl.config import make_experiment
from adfmsl.data import AsvspoofDataset, DataLoader, parse_protocol
from adfmsl.evaluation import compute_eer, evaluate_to_file, read_score_file
from adfmsl.train import Trainer, make_dataset_and_loader


@pytest.fixture(scope="module")
def trained(fixture_dir, tmp_path_factory):
    exp = make_experiment("maze5")
    exp.data.cut = 16000                    # 1 s fixture clips
    exp.train.batch_size = 8
    # BatchNorm running stats start at var=1 and converge at momentum 0.9; eval-mode
    # logits are only meaningful after ~40 steps (0.9^40 ~= 0.015 of init left), so
    # train enough steps for the eval path to see converged statistics — with
    # margin: at exactly 14 epochs (42 steps) the assertion sat on the
    # convergence knife-edge and flipped when the standardized optimizer
    # changed to the reference's AdamW.
    exp.train.num_epochs = 20
    exp.train.optimizer.lr = 1e-3
    exp.model.spec_augment.enabled = False  # keep the tiny run deterministic-ish
    train_proto = parse_protocol(fixture_dir["train"]["protocol"])
    dev_proto = parse_protocol(fixture_dir["dev"]["protocol"])
    train_loader = make_dataset_and_loader(exp, train_proto,
                                           fixture_dir["train"]["audio_dir"],
                                           shuffle=True)
    dev_loader = make_dataset_and_loader(exp, dev_proto,
                                         fixture_dir["dev"]["audio_dir"],
                                         shuffle=False, batch_size=8,
                                         drop_last=False)
    ckpt_dir = tmp_path_factory.mktemp("e2e_ckpt")
    trainer = Trainer(exp, train_loader, dev_loader,
                      checkpoint_dir=str(ckpt_dir))
    history = trainer.fit()
    # Deploy the BEST dev checkpoint, as the reference does (maze5.py keeps
    # best-dev-acc state_dicts).  Training PAST convergence on the 24-utt
    # fixture ends in measured logit saturation: with focal loss pinned at ~0,
    # Adam keeps taking lr-sized steps on tiny consistent gradients (param
    # max-norm reaches ~7.7e3 by epoch 20), eval-mode margins blow past the
    # f32 epsilon of logsumexp, and every log-softmax score cancels to exactly
    # 0.0 — all ties, degenerate EER 0.5 at the final epochs even though the
    # model ranked perfectly a few epochs earlier (torch f32 ties identically).
    best = trainer.ckpt.best_epoch()
    trainer.state, _ = trainer.ckpt.restore(trainer.state, epoch=best)
    return exp, trainer, history


def test_training_learns(trained):
    _, _, history = trained
    assert len(history) == 20
    assert history[-1].train_loss < history[0].train_loss
    # Detection quality is threshold-free: the dev EER must show the
    # separable-by-construction classes separated.  Assert over the HISTORY,
    # not the final epoch: the reference deploys the best dev checkpoint
    # (maze5.py keeps best dev acc) and the final epochs of this deliberately
    # long run sit in the measured saturation regime described in the fixture
    # (all-tie scores, degenerate EER) — final-epoch assertions flip whenever
    # any train-math change shifts the saturation point by an epoch.  A real
    # eval-path bug still fails this: it produces garbage at EVERY epoch.
    assert min(m.dev_eer for m in history) <= 0.1
    assert max(m.dev_acc for m in history) >= 0.75


def test_eval_to_score_file_and_eer(trained, fixture_dir, tmp_path):
    exp, trainer, _ = trained
    eval_proto = parse_protocol(fixture_dir["eval"]["protocol"])
    loader = make_dataset_and_loader(exp, eval_proto,
                                     fixture_dir["eval"]["audio_dir"],
                                     shuffle=False, batch_size=6, drop_last=False)
    score_path = str(tmp_path / "maze5_scores.txt")
    res = evaluate_to_file(trainer.state, loader, score_path,
                           labels=eval_proto.labels, eval_step=trainer.eval_step)
    # exact utterance count despite padded final batch
    scores = read_score_file(score_path)
    assert len(scores) == len(eval_proto)
    assert set(scores) == set(eval_proto.utt_ids)
    assert res.metrics is not None
    assert res.metrics["eer"] <= 0.25
    # score-file EER reproduces in-memory EER
    y = [eval_proto.labels[u] for u in scores]
    eer2, _ = compute_eer(np.asarray(list(scores.values())), np.asarray(y))
    assert eer2 == pytest.approx(res.metrics["eer"], abs=1e-9)


def test_analysis_pipeline(trained, fixture_dir, tmp_path):
    exp, trainer, _ = trained
    from adfmsl.analysis import ScoreFileProcessor, comparison_markdown, results_csv

    eval_proto = parse_protocol(fixture_dir["eval"]["protocol"])
    loader = make_dataset_and_loader(exp, eval_proto,
                                     fixture_dir["eval"]["audio_dir"],
                                     shuffle=False, batch_size=6, drop_last=False)
    sdir = tmp_path / "scores"
    sdir.mkdir()
    evaluate_to_file(trainer.state, loader, str(sdir / "maze5_scores.txt"),
                     eval_step=trainer.eval_step)
    proc = ScoreFileProcessor(str(sdir), fixture_dir["eval"]["protocol"])
    processed = proc.process_all_scores()
    assert "maze5" in processed.per_model
    assert "eer" in processed.per_model["maze5"]
    csv_text = results_csv(processed.per_model)
    assert "maze5" in csv_text
    md = comparison_markdown(processed.per_model)
    assert "maze5" in md and "ref EER" in md
    out = proc.export_for_thesis_analysis(processed, str(tmp_path / "perf.json"))
    assert os.path.exists(out)


def test_cli_analyze(trained, fixture_dir, tmp_path, capsys):
    exp, trainer, _ = trained
    eval_proto = parse_protocol(fixture_dir["eval"]["protocol"])
    loader = make_dataset_and_loader(exp, eval_proto,
                                     fixture_dir["eval"]["audio_dir"],
                                     shuffle=False, batch_size=6, drop_last=False)
    sdir = tmp_path / "scores"
    sdir.mkdir()
    evaluate_to_file(trainer.state, loader, str(sdir / "maze5_scores.txt"),
                     eval_step=trainer.eval_step)
    from adfmsl.cli.analyze import main

    rc = main(["--scores_dir", str(sdir),
               "--protocol", fixture_dir["eval"]["protocol"],
               "--output_dir", str(tmp_path / "out")])
    assert rc == 0
    assert (tmp_path / "out" / "results.csv").exists()
    assert (tmp_path / "out" / "report.md").exists()
    assert "maze5" in capsys.readouterr().out


def test_fmsl_model_trains_end_to_end(fixture_dir):
    """maze5_fmsl (Mode A) short training run: loss decreases, scores produced
    (quality is covered by the maze5 path; this exercises the FMSL head e2e)."""
    exp = make_experiment("maze5_fmsl")
    exp.data.cut = 16000
    exp.train.batch_size = 8
    exp.train.num_epochs = 3
    exp.train.optimizer.lr = 1e-3
    exp.model.spec_augment.enabled = False
    train_proto = parse_protocol(fixture_dir["train"]["protocol"])
    loader = make_dataset_and_loader(exp, train_proto,
                                     fixture_dir["train"]["audio_dir"], shuffle=True)
    trainer = Trainer(exp, loader)
    hist = trainer.fit()
    assert hist[-1].train_loss < hist[0].train_loss
    assert all(np.isfinite(h.train_loss) for h in hist)

    eval_proto = parse_protocol(fixture_dir["eval"]["protocol"])
    eloader = make_dataset_and_loader(exp, eval_proto,
                                      fixture_dir["eval"]["audio_dir"],
                                      shuffle=False, batch_size=8, drop_last=False)
    from adfmsl.evaluation import produce_scores

    res = produce_scores(trainer.state, eloader, trainer.eval_step)
    assert len(res.scores) == len(eval_proto)
    assert np.isfinite(res.scores).all()


def _w2v2_layer_deltas(before, after):
    """Sum of |delta| per wav2vec2 encoder layer key + feature extractor."""
    import jax

    out = {}

    def visit(path, a):
        keys = [getattr(p, "key", None) for p in path]
        if "wav2vec2" not in keys:
            return 0
        b = after
        for p in path:
            b = b[p.key]
        d = float(np.abs(np.asarray(a) - np.asarray(b)).sum())
        tag = next((k for k in keys if isinstance(k, str)
                    and k.startswith("layers_")), None)
        if tag is None and "feature_extractor" in keys:
            tag = "feature_extractor"
        if tag is not None:
            out[tag] = out.get(tag, 0.0) + d
        return 0

    jax.tree_util.tree_map_with_path(visit, before)
    return out


def test_maze6_w2v2_family_trains_end_to_end(fixture_dir):
    """The reference's best model family (maze6.py:510-754): tiny-w2v2 multi-layer
    fusion + partial unfreeze + ASP + AdamW trains — loss drops, dev acc beats
    chance, and ONLY the last-N encoder layers move (optimizer-label plumbing)."""
    import copy

    exp = make_experiment("maze6")
    exp.model.wav2vec2.model_name = "tiny"
    exp.model.wav2vec2.freeze = False
    exp.model.wav2vec2.unfreeze_last_n = 1      # tiny arch: layers_1 only
    exp.data.cut = 4000
    exp.train.batch_size = 8
    # BN running stats need ~40 steps before eval-mode outputs are meaningful
    # (CLAUDE.md); at 3 steps/epoch the dev-acc flip lands around epoch 11-13,
    # so 20 epochs (60 steps) leaves seed margin.
    exp.train.num_epochs = 20
    exp.train.optimizer.lr = 1e-3
    exp.model.spec_augment.enabled = False

    train_proto = parse_protocol(fixture_dir["train"]["protocol"])
    dev_proto = parse_protocol(fixture_dir["dev"]["protocol"])
    loader = make_dataset_and_loader(exp, train_proto,
                                     fixture_dir["train"]["audio_dir"], shuffle=True)
    dev_loader = make_dataset_and_loader(exp, dev_proto,
                                         fixture_dir["dev"]["audio_dir"],
                                         shuffle=False, batch_size=8,
                                         drop_last=False)
    trainer = Trainer(exp, loader, dev_loader)
    import jax

    before = jax.tree_util.tree_map(lambda a: np.array(a), trainer.state.params)
    hist = trainer.fit()
    assert hist[-1].train_loss < hist[0].train_loss
    assert all(np.isfinite(h.train_loss) for h in hist)
    assert hist[-1].dev_acc > 0.5               # beats chance

    deltas = _w2v2_layer_deltas(before, trainer.state.params)
    assert deltas.get("layers_1", 0.0) > 0.0    # unfrozen layer trained
    assert deltas.get("layers_0", 1.0) == 0.0   # frozen layer untouched
    assert deltas.get("feature_extractor", 1.0) == 0.0


def test_maze7_fmsl_mode_c_trains_end_to_end(fixture_dir):
    """Mode C (integrated FMSL loss, maze7_fmsl_standardized.py:179-291): the
    model self-reports its loss and trains on the fixture."""
    exp = make_experiment("maze7_fmsl")
    exp.model.wav2vec2.model_name = "tiny"
    exp.data.cut = 4000
    exp.train.batch_size = 8
    exp.train.num_epochs = 4
    exp.train.optimizer.lr = 1e-3
    assert exp.model.fmsl.mode == "integrated"

    train_proto = parse_protocol(fixture_dir["train"]["protocol"])
    loader = make_dataset_and_loader(exp, train_proto,
                                     fixture_dir["train"]["audio_dir"], shuffle=True)
    trainer = Trainer(exp, loader)
    hist = trainer.fit()
    assert hist[-1].train_loss < hist[0].train_loss
    assert all(np.isfinite(h.train_loss) for h in hist)

    eval_proto = parse_protocol(fixture_dir["eval"]["protocol"])
    eloader = make_dataset_and_loader(exp, eval_proto,
                                      fixture_dir["eval"]["audio_dir"],
                                      shuffle=False, batch_size=8, drop_last=False)
    from adfmsl.evaluation import produce_scores

    res = produce_scores(trainer.state, eloader, trainer.eval_step)
    assert len(res.scores) == len(eval_proto)
    assert np.isfinite(res.scores).all()
