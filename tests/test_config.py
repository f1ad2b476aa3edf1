import dataclasses

from adfmsl.config import (
    ALL_MODELS,
    ExperimentConfig,
    get_standardized_config,
    load_yaml,
    make_experiment,
    save_yaml,
    verify_all,
)

# The canonical contract the reference standardizes on
# (Thesis/06_Utilities/fmsl_standardized_config.py:36-79).
EXPECTED_BASELINE = {
    "filts": [128, [128, 128], [128, 256]],
    "nb_fc_node": 1024,
    "nb_classes": 2,
    "sample_rate": 16000,
    "first_conv": 251,
    "dropout_rate": 0.3,
    "fc_dropout": 0.5,
    "wav2vec2_model_name": "facebook/wav2vec2-base-960h",
    "wav2vec2_output_dim": 768,
    "wav2vec2_freeze": True,
    "batch_size": 12,
    "lr": 0.0001,
    "weight_decay": 0.0001,
    "grad_clip_norm": 1.0,
    "num_epochs": 5,
    "seed": 1234,
}
EXPECTED_FMSL_EXTRA = {
    "fmsl_type": "prototype",
    "fmsl_n_prototypes": 3,
    "fmsl_s": 32.0,
    "fmsl_m": 0.45,
    "fmsl_enable_lsa": False,
    "fmsl_lsa_strength": 0.1,
}


def test_standardized_baseline_contract():
    cfg = get_standardized_config("baseline")
    for k, v in EXPECTED_BASELINE.items():
        assert cfg[k] == v, k


def test_standardized_fmsl_contract():
    cfg = get_standardized_config("fmsl")
    for k, v in {**EXPECTED_BASELINE, **EXPECTED_FMSL_EXTRA}.items():
        assert cfg[k] == v, k


def test_all_models_construct():
    for name in ALL_MODELS:
        exp = make_experiment(name)
        assert exp.model.name == name
        assert (exp.model.fmsl is not None) == name.endswith("_fmsl")


def test_fmsl_drift_preserved_and_suppressible():
    drifted = make_experiment("maze6_fmsl", drift=True)
    assert drifted.model.fmsl.n_prototypes == 8
    assert drifted.model.fmsl.s == 5.0
    clean = make_experiment("maze6_fmsl", drift=False)
    assert clean.model.fmsl.n_prototypes == 3
    assert clean.model.fmsl.s == 32.0


def test_verifier_reports_consistency():
    rep = verify_all()
    assert rep.all_canonical_ok
    assert all(rep.pair_consistent.values())
    assert "maze6_fmsl" in rep.fmsl_drift
    assert "CONFIG VERIFICATION" in rep.summary()


def test_yaml_roundtrip(tmp_path):
    exp = make_experiment("maze5_fmsl")
    p = tmp_path / "exp.yaml"
    save_yaml(exp, str(p))
    back = load_yaml(str(p))
    assert dataclasses.asdict(back) == dataclasses.asdict(exp)


def test_overrides():
    exp = make_experiment("maze5", **{"train.batch_size": 4, "model.dtype": "float32"})
    assert exp.train.batch_size == 4
    assert exp.model.dtype == "float32"
