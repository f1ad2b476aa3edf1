"""The thesis's central quality claim, asserted offline (round-4 VERDICT item 4;
round-5 item 5 widened it to multiple seeds and a second model pair).

The reference's analysis compares each baseline maze EER against its FMSL
variant and reports the improvement
(02_Evaluation_Scripts/comprehensive_thesis_analyser.py:175-192;
WUT-Thesis/tex/6-experimental-validation.tex:17 claims FMSL improves EER over
the baseline). No ASVspoof corpus or trained checkpoint exists in this
environment, so the claim is reproduced on a *hard* synthetic fixture
(``SyntheticSpec.class_sep < 1`` blends shared broadband noise into both
classes so trained models land at a nonzero EER).

Round-4's single-seed ordering was thin evidence (the round's own e2e findings
showed final-state assertions are structurally unstable): the gate is now the
MEDIAN over three seeds, per pair — maze5/maze5_fmsl (Mode A refine, sinc
trunk) and maze7/maze7_fmsl (Mode C integrated, w2v2 trunk on the tiny local
encoder). Per-seed inversions are tolerated; a median inversion fails.

Everything is deterministic (fixed seeds, CPU backend via conftest), so the
assertion is a regression gate, not a statistical coin flip.
"""
import os
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from adfmsl.config import make_experiment
from adfmsl.data import SyntheticSpec, generate_fixture, parse_protocol
from adfmsl.evaluation import evaluate_to_file
from adfmsl.train import Trainer, make_dataset_and_loader

SEEDS = [0, 1, 2]


@pytest.fixture(scope="module")
def hard_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("hard_fix")
    # class_sep calibrated on-box: 0.4 puts the maze5 baseline at EER ~0.08
    # (0.25 collapses below chance, 1.0 saturates at 0.0); n_eval=48 keeps the
    # EER granularity at ~0.02 so the comparison isn't quantised away
    info = generate_fixture(str(root), SyntheticSpec(
        n_train=24, n_dev=12, n_eval=48, class_sep=0.4, seed=7))
    return info


def _train_and_eval_eer(name: str, info, seed: int, tiny_w2v2=False) -> float:
    exp = make_experiment(name)
    exp.data.cut = 16000
    exp.train.batch_size = 8
    exp.train.num_epochs = 12            # past BN running-stat convergence
    exp.train.optimizer.lr = 1e-3        # shared lr: seed-matched PAIRS only
    exp.train.optimizer.grad_clip_norm = 1.0
    exp.train.seed = seed
    exp.model.spec_augment.enabled = False
    if tiny_w2v2:
        exp.model.wav2vec2.model_name = "tiny"
    train_proto = parse_protocol(info["train"]["protocol"])
    dev_proto = parse_protocol(info["dev"]["protocol"])
    train_loader = make_dataset_and_loader(exp, train_proto,
                                           info["train"]["audio_dir"],
                                           shuffle=True)
    dev_loader = make_dataset_and_loader(exp, dev_proto,
                                         info["dev"]["audio_dir"],
                                         shuffle=False, batch_size=8,
                                         drop_last=False)
    trainer = Trainer(exp, train_loader, dev_loader)
    trainer.fit()
    eval_proto = parse_protocol(info["eval"]["protocol"])
    loader = make_dataset_and_loader(exp, eval_proto, info["eval"]["audio_dir"],
                                     shuffle=False, batch_size=8,
                                     drop_last=False)
    with tempfile.TemporaryDirectory() as td:
        res = evaluate_to_file(trainer.state, loader,
                               os.path.join(td, f"{name}.txt"),
                               labels=eval_proto.labels,
                               eval_step=trainer.eval_step)
    return float(res.metrics["eer"])


def _pair_medians(base_name, fmsl_name, info, tiny=False):
    bases = [_train_and_eval_eer(base_name, info, s, tiny) for s in SEEDS]
    fmsls = [_train_and_eval_eer(fmsl_name, info, s, tiny) for s in SEEDS]
    assert all(np.isfinite(bases)) and all(np.isfinite(fmsls))
    return bases, fmsls


def test_fmsl_improves_or_matches_baseline_eer_maze5(hard_fixture):
    bases, fmsls = _pair_medians("maze5", "maze5_fmsl", hard_fixture)
    # the fixture is hard enough that the baseline is off the floor in
    # aggregate — the comparison is meaningful, not 0 <= 0
    assert float(np.median(bases)) > 0.0, bases
    assert float(np.median(fmsls)) <= float(np.median(bases)), (fmsls, bases)


def test_fmsl_improves_or_matches_baseline_eer_maze7(hard_fixture):
    bases, fmsls = _pair_medians("maze7", "maze7_fmsl", hard_fixture, tiny=True)
    assert float(np.median(fmsls)) <= float(np.median(bases)), (fmsls, bases)
