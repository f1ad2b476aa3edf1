"""Score-FILE-level literal parity (round-4 VERDICT item 4b).

test_reference_oracle stops at model-forward parity; this closes the last
untested layer of the contract — score semantics + ordering + formatting under
one roof. The literal reference ``produce_evaluation_file`` (maze5.py:415-430,
the copy-paste twin of maze2.py:333-343) runs next to ``evaluation/runner.py``
on the SAME ported checkpoint over the SAME synthetic fixture audio, and the
resulting score files are diffed line by line.

The reference's Dataset loads audio through ``librosa.load`` — stubbed here
with a FUNCTIONAL loader backed by adfmsl's own WAV reader, so both sides
consume bit-identical waveforms. Its eval-protocol parser
(``genSpoof_list(is_eval=True)``) takes column 0 as the utterance id, i.e. it
expects a single-column file list (maze5.py:266-278); the fixture's 5-column
trl drives OUR parser and a derived single-column list drives theirs.
"""
import os
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import jax
import optax

from adfmsl.config import make_experiment
from adfmsl.data import generate_fixture, SyntheticSpec, parse_protocol
from adfmsl.evaluation import evaluate_to_file, read_score_file
from adfmsl.models import build_model
from adfmsl.models.port import (merge_params, port_maze_state_dict,
                                reference_parity_experiment)
from adfmsl.train import make_dataset_and_loader
from adfmsl.train.state import TrainState

from test_port import _randomize_bn_stats
from test_reference_oracle import D_ARGS, load_ref

CUT = 8000


def test_score_file_parity_maze5(tmp_path):
    info = generate_fixture(str(tmp_path / "fix"),
                            SyntheticSpec(n_train=2, n_dev=2, n_eval=16))
    eval_info = info["eval"]

    # ---- literal reference side --------------------------------------------------
    mod = load_ref("01_Models/01_Baseline_Models/maze5.py")
    # functional librosa.load: adfmsl's WAV reader (content-sniffing, the
    # fixture's '<utt>.flac' copies hold WAV bytes); reference calls
    # librosa.load(path, sr=16000) and our fixture is already 16 kHz
    import sys

    from adfmsl.data.audio import read_wav

    def _load(path, sr=None):
        x, file_sr = read_wav(path)
        assert sr is None or sr == file_sr
        return x.astype(np.float32), file_sr

    sys.modules["librosa"].load = _load
    mod.librosa.load = _load

    # reference layout: base_dir/flac/<utt>.flac (maze5.py:334-338 path probe)
    ref_base = tmp_path / "ref_layout"
    (ref_base / "flac").mkdir(parents=True)
    for utt in eval_info["utt_ids"]:
        shutil.copy(os.path.join(eval_info["audio_dir"], utt + ".wav"),
                    ref_base / "flac" / (utt + ".flac"))
    # single-column eval file list for the reference parser
    eval_list_path = tmp_path / "eval_list.txt"
    eval_list_path.write_text("".join(u + "\n" for u in eval_info["utt_ids"]))
    file_list = mod.genSpoof_list(dir_meta=str(eval_list_path), is_eval=True)
    assert file_list == eval_info["utt_ids"]
    dataset = mod.Dataset_ASVspoof_eval(file_list, str(ref_base), cut=CUT)

    tmodel = mod.Model5_RawNetSinc_SpecAugment_FocalLoss(D_ARGS, "cpu").eval()
    rng = np.random.default_rng(3)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    ref_scores_path = str(tmp_path / "ref_scores.txt")
    # batch 6 over 16 utts: exercises the reference's dynamic final batch vs
    # our masked fixed-shape final batch
    mod.produce_evaluation_file(dataset, tmodel, "cpu", ref_scores_path,
                                batch_size=6)

    # ---- adfmsl side (ported checkpoint -> evaluation/runner.py) ------------------
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, stats, report = port_maze_state_dict(sd, "maze5")
    assert report["missing"] == [] and report["unconsumed"] == []

    exp = reference_parity_experiment("maze5")
    exp.data.cut = CUT
    model = build_model(exp.model)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           np.zeros((2, CUT), np.float32), train=False)
    merged = merge_params(variables["params"], params)
    merged_stats = merge_params(variables["batch_stats"], stats)
    state = TrainState.create(model.apply, merged, merged_stats, optax.sgd(0.0))

    proto = parse_protocol(eval_info["protocol"])
    loader = make_dataset_and_loader(exp, proto, eval_info["audio_dir"],
                                     shuffle=False, batch_size=6,
                                     drop_last=False)
    our_scores_path = str(tmp_path / "adfmsl_scores.txt")
    evaluate_to_file(state, loader, our_scores_path, eval_step=None)

    # ---- diff the files ------------------------------------------------------------
    ref_lines = open(ref_scores_path).read().strip().splitlines()
    our_lines = open(our_scores_path).read().strip().splitlines()
    assert len(ref_lines) == len(our_lines) == 16
    # same 'utt score' two-token shape, same utterance ORDER
    assert [l.split()[0] for l in ref_lines] == [l.split()[0] for l in our_lines]
    ref_scores = read_score_file(ref_scores_path)
    our_scores = read_score_file(our_scores_path)
    assert list(ref_scores) == list(our_scores)     # insertion order preserved
    a = np.asarray([ref_scores[u] for u in ref_scores])
    b = np.asarray([our_scores[u] for u in ref_scores])
    np.testing.assert_allclose(b, a, atol=5e-4, rtol=1e-3)
