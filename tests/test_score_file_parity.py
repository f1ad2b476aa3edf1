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


# ---------------------------------------------------------------------------------
# Round-5 breadth (VERDICT r4 next-round #2): one literal file diff per score-
# semantics class — main (GRU + log-softmax, main.py:36-55 writer), maze6 (ASP
# raw logit, maze6.py:497-508), maze7_fmsl (Mode C dict logits, maze7_fmsl_
# standardized.py:433-457), maze6_fmsl (fallback-head dict logits, :565-589).
# ---------------------------------------------------------------------------------

def _stub_librosa(mod):
    import sys

    from adfmsl.data.audio import read_wav

    def _load(path, sr=None):
        x, file_sr = read_wav(path)
        return x.astype(np.float32), file_sr

    sys.modules["librosa"].load = _load
    if hasattr(mod, "librosa"):
        mod.librosa.load = _load


def _ref_layouts(tmp_path, eval_info):
    """Both layouts the reference datasets probe: flat <base>/<utt>.flac and
    <base>/flac/<utt>.flac (fixture WAV bytes behind .flac names)."""
    ref_base = tmp_path / "ref_layout"
    (ref_base / "flac").mkdir(parents=True, exist_ok=True)
    for utt in eval_info["utt_ids"]:
        src = os.path.join(eval_info["audio_dir"], utt + ".wav")
        shutil.copy(src, ref_base / (utt + ".flac"))
        shutil.copy(src, ref_base / "flac" / (utt + ".flac"))
    return str(ref_base)


def _adfmsl_score_file(name, tmodel, eval_info, out_path, cut, batch_size=6,
                       spec_override=None, w2v2_arch=None, drop=("criterion.",),
                       mutate=None):
    from adfmsl.models.mazes import MazeModel

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
          if not any(k.startswith(p) for p in drop)
          and "masked_spec_embed" not in k}
    kw = {"w2v2_arch": w2v2_arch} if w2v2_arch is not None else {}
    params, stats, report = port_maze_state_dict(sd, name, **kw)
    assert report["missing"] == [] and report["unconsumed"] == []

    exp = reference_parity_experiment(name)
    exp.data.cut = cut
    if mutate:
        mutate(exp)
    model = (MazeModel(spec=spec_override, cfg=exp.model) if spec_override
             else build_model(exp.model))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           np.zeros((2, cut), np.float32), train=False)
    state = TrainState.create(
        model.apply, merge_params(variables["params"], params),
        merge_params(variables["batch_stats"], stats), optax.sgd(0.0))
    proto = parse_protocol(eval_info["protocol"])
    loader = make_dataset_and_loader(exp, proto, eval_info["audio_dir"],
                                     shuffle=False, batch_size=batch_size,
                                     drop_last=False)
    evaluate_to_file(state, loader, out_path, eval_step=None)


def _diff_score_files(ref_path, our_path, n, atol=5e-4):
    ref_lines = open(ref_path).read().strip().splitlines()
    our_lines = open(our_path).read().strip().splitlines()
    assert len(ref_lines) == len(our_lines) == n
    assert [l.split()[0] for l in ref_lines] == [l.split()[0] for l in our_lines]
    ref_scores = read_score_file(ref_path)
    our_scores = read_score_file(our_path)
    a = np.asarray([ref_scores[u] for u in ref_scores])
    b = np.asarray([our_scores[u] for u in ref_scores])
    scale = max(float(np.abs(a).max()), 1.0)
    np.testing.assert_allclose(b, a, atol=atol * scale, rtol=1e-3)


def test_score_file_parity_main(tmp_path):
    """main.py:36-55 literal writer (append-mode, batch 128 internally; scores
    are log-softmax[:,1] because RawNet's forward ends in log_softmax). The
    reference repo ships no model.py/data_utils.py, so the model is the TRawNet
    twin and the dataset a minimal (pad-to-cut) eval Dataset; the WRITER and
    the score semantics are the literal parity surface here."""
    import sys
    import types

    from test_port import TRawNet

    # main.py's unresolvable imports (not shipped in the reference)
    for name, attrs in [("model", {"RawNet": TRawNet}),
                        ("data_utils", {"genSpoof_list": None,
                                        "Dataset_ASVspoof2019_train": None,
                                        "Dataset_ASVspoof2021_eval": None}),
                        ("core_scripts", {}),
                        ("core_scripts.startup_config",
                         {"set_random_seed": lambda *a, **k: None})]:
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)

    mod = load_ref("01_Models/01_Baseline_Models/main.py")
    info = generate_fixture(str(tmp_path / "fix"),
                            SyntheticSpec(n_train=2, n_dev=2, n_eval=10))
    eval_info = info["eval"]
    ref_base = _ref_layouts(tmp_path, eval_info)

    cut = 8000
    tmodel = TRawNet(gru_layers=2).eval()
    rng = np.random.default_rng(30)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)

    from adfmsl.data.audio import read_wav
    from adfmsl.data.pad import tile_pad

    class _EvalSet(torch.utils.data.Dataset):
        def __init__(self, ids, base):
            self.ids, self.base = ids, base

        def __len__(self):
            return len(self.ids)

        def __getitem__(self, i):
            x, _ = read_wav(os.path.join(self.base, self.ids[i] + ".flac"))
            return torch.from_numpy(tile_pad(x.astype(np.float32), cut)), self.ids[i]

    ref_scores_path = str(tmp_path / "ref_scores.txt")
    mod.produce_evaluation_file(_EvalSet(eval_info["utt_ids"], ref_base),
                                tmodel, "cpu", ref_scores_path)

    our_path = str(tmp_path / "ours.txt")

    def mutate(exp):
        exp.model.architecture.nb_gru_layer = 2

    _adfmsl_score_file("main", tmodel, eval_info, our_path, cut, mutate=mutate)
    _diff_score_files(ref_scores_path, our_path, 10)


def test_score_file_parity_maze6(tmp_path, monkeypatch):
    import dataclasses

    from adfmsl.models.mazes import SPECS
    from adfmsl.models.w2v2 import W2V2Arch
    from test_reference_oracle import _patch_hub

    _patch_hub(monkeypatch)
    mod = load_ref("01_Models/01_Baseline_Models/maze6.py")
    _stub_librosa(mod)
    info = generate_fixture(str(tmp_path / "fix"),
                            SyntheticSpec(n_train=2, n_dev=2, n_eval=10))
    eval_info = info["eval"]
    ref_base = _ref_layouts(tmp_path, eval_info)

    d_args = dict(D_ARGS, wav2vec2_output_dim=64,
                  wav2vec2_output_layers=[0, 1, 2],
                  wav2vec2_freeze_cnn=True, wav2vec2_unfrozen_transformers=0,
                  transformer_num_layers=4)
    tmodel = mod.Model_Maze6(d_args, "cpu").eval()
    rng = np.random.default_rng(31)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)

    dataset = mod.Dataset_ASVspoof_eval(eval_info["utt_ids"], ref_base, cut=CUT)
    ref_scores_path = str(tmp_path / "ref_scores.txt")
    mod.produce_evaluation_file(dataset, tmodel, "cpu", ref_scores_path,
                                batch_size=4)

    spec = dataclasses.replace(SPECS["maze6"], proj_dim=64,
                               fusion_layers=(0, 1, 2))

    def mutate(exp):
        exp.model.wav2vec2.model_name = "tiny"
        exp.model.wav2vec2.fusion_layers = [0, 1, 2]

    our_path = str(tmp_path / "ours.txt")
    _adfmsl_score_file("maze6", tmodel, eval_info, our_path, CUT, batch_size=4,
                       spec_override=spec, w2v2_arch=W2V2Arch.tiny(),
                       mutate=mutate)
    _diff_score_files(ref_scores_path, our_path, 10)


def test_score_file_parity_maze7_fmsl(tmp_path, monkeypatch):
    from adfmsl.models.w2v2 import W2V2Arch
    from test_reference_oracle import _patch_hub

    _patch_hub(monkeypatch)
    mod = load_ref("01_Models/02_FMSL_Enhanced_Models/maze7_fmsl_standardized.py")
    _stub_librosa(mod)
    info = generate_fixture(str(tmp_path / "fix"),
                            SyntheticSpec(n_train=2, n_dev=2, n_eval=10))
    eval_info = info["eval"]
    ref_base = _ref_layouts(tmp_path, eval_info)

    d_args = dict(D_ARGS, wav2vec2_output_dim=64)
    tmodel = mod.Model7_RawNet_Wav2Vec2_FMSL_Standardized(d_args, "cpu").eval()
    rng = np.random.default_rng(32)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)

    dataset = mod.Dataset_ASVspoof_eval(eval_info["utt_ids"], ref_base, cut=CUT)
    ref_scores_path = str(tmp_path / "ref_scores.txt")
    mod.produce_evaluation_file(dataset, tmodel, "cpu", ref_scores_path,
                                batch_size=4)

    def mutate(exp):
        exp.model.wav2vec2.model_name = "tiny"

    our_path = str(tmp_path / "ours.txt")
    _adfmsl_score_file("maze7_fmsl", tmodel, eval_info, our_path, CUT,
                       batch_size=4, w2v2_arch=W2V2Arch.tiny(), mutate=mutate)
    _diff_score_files(ref_scores_path, our_path, 10)


def test_score_file_parity_maze6_fmsl(tmp_path, monkeypatch):
    import dataclasses

    from adfmsl.models.mazes import SPECS
    from adfmsl.models.w2v2 import W2V2Arch
    from test_reference_oracle import _patch_hub

    _patch_hub(monkeypatch)
    mod = load_ref("01_Models/02_FMSL_Enhanced_Models/maze6_fmsl_standardized.py")
    _stub_librosa(mod)
    info = generate_fixture(str(tmp_path / "fix"),
                            SyntheticSpec(n_train=2, n_dev=2, n_eval=10))
    eval_info = info["eval"]
    ref_base = _ref_layouts(tmp_path, eval_info)

    d_args = dict(D_ARGS, wav2vec2_base_dim=64,
                  wav2vec2_output_layers=[0, 1, 2],
                  use_spec_augment_w2v2=False)
    tmodel = mod.Model6_RawNet_Wav2Vec2_FMSL_Standardized(d_args, "cpu").eval()
    rng = np.random.default_rng(33)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)

    dataset = mod.Dataset_ASVspoof_eval(eval_info["utt_ids"], ref_base, cut=CUT)
    ref_scores_path = str(tmp_path / "ref_scores.txt")
    mod.produce_evaluation_file(dataset, tmodel, "cpu", ref_scores_path,
                                batch_size=4)
    # the literal model silently disabled its own FMSL on first eval forward
    assert not tmodel.use_fmsl

    spec = dataclasses.replace(SPECS["maze6_fmsl"], fusion_layers=(0, 1, 2))

    def mutate(exp):
        exp.model.wav2vec2.model_name = "tiny"
        exp.model.wav2vec2.fusion_layers = [0, 1, 2]

    our_path = str(tmp_path / "ours.txt")
    _adfmsl_score_file("maze6_fmsl", tmodel, eval_info, our_path, CUT,
                       batch_size=4, spec_override=spec,
                       w2v2_arch=W2V2Arch.tiny(), mutate=mutate)
    _diff_score_files(ref_scores_path, our_path, 10)
