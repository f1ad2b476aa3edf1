"""Literal-reference parity oracles.

Unlike test_port.py (whose torch oracles are re-typed twins of the reference
topology), this module imports the ACTUAL reference implementations from
/root/reference/Thesis — maze4.py, maze5.py, 06_Utilities/fmsl_advanced.py,
maze4_fmsl_standardized.py, maze5_fmsl_standardized.py and
main_fmsl_standardized.py — with only their unused heavy deps (librosa,
torchaudio, tensorboardX) stubbed in sys.modules, and asserts ported-forward
parity against them. A misreading of the reference encoded in both the adfmsl
model and a re-typed twin would pass test_port; it cannot pass here.

The reference classes are instantiated with the exact runtime configs their
__main__ blocks build (maze5.py:459-474, main_fmsl_standardized.py:357-368),
their state dicts are ported through adfmsl.models.port, and eval-mode forwards
must agree within f32 tolerance.

Also asserted literally: the reference's latent defects we deliberately fixed —
AdvancedFMSLSystem.forward returns 'logits' only when use_integrated_loss and
never returns 'loss' (fmsl_advanced.py:287-304), so RawNetWithFMSL KeyErrors in
BOTH modes (main_fmsl_standardized.py:160-174) and maze4_fmsl KeyErrors at train
time (maze4_fmsl_standardized.py:330-336).
"""
import importlib.util
import math
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from adfmsl.models import build_model
from adfmsl.models.port import (merge_params, port_maze_state_dict,
                                reference_parity_experiment)

from test_port import TRawNet, _randomize_bn_stats  # re-typed twin, for the stub RawNet

REF = "/root/reference/Thesis"
UTIL = os.path.join(REF, "06_Utilities")
CUT = 4000

# the exact runtime d_args of maze4.py:446-461 / maze5.py:459-474 (identical;
# the fmsl_standardized variants reuse it)
D_ARGS = {
    "filts": [128, [128, 128], [128, 256]],
    "first_conv": 251,
    "sample_rate": 16000,
    "nb_fc_node": 1024,
    "fc_dropout": 0.5,
    "nb_classes": 2,
    "use_spec_augment_raw": True,
    "spec_aug_freq_mask_param_raw": 10,
    "spec_aug_n_freq_masks_raw": 1,
    "spec_aug_time_mask_param_raw": 10,
    "spec_aug_n_time_masks_raw": 1,
}


def _install_stubs():
    """The reference imports librosa / torchaudio.transforms / tensorboardX at
    module scope but the model classes never call them in eval mode (SpecAugment
    is training-only); stub just enough for import + construction."""
    if "librosa" not in sys.modules:
        sys.modules["librosa"] = types.ModuleType("librosa")
    if "tensorboardX" not in sys.modules:
        tb = types.ModuleType("tensorboardX")

        class _Writer:
            def __init__(self, *a, **k): pass
            def add_scalar(self, *a, **k): pass

        tb.SummaryWriter = _Writer
        sys.modules["tensorboardX"] = tb
    if "torchaudio" not in sys.modules:
        class _Mask(tnn.Module):
            # parameterless; eval-mode forwards never reach these modules
            def __init__(self, *a, **k):
                super().__init__()

            def forward(self, x):
                return x

        tr = types.ModuleType("torchaudio.transforms")
        tr.FrequencyMasking = _Mask
        tr.TimeMasking = _Mask
        ta = types.ModuleType("torchaudio")
        ta.transforms = tr
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tr


_LOADED = {}


def load_ref(relpath):
    """Import a reference source file by path, exactly as written."""
    if relpath in _LOADED:
        return _LOADED[relpath]
    _install_stubs()
    path = os.path.join(REF, relpath)
    name = "ref_" + os.path.basename(relpath)[:-3]
    sys.path.insert(0, UTIL)   # fmsl files do `from fmsl_advanced import ...`
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(UTIL)
    _LOADED[relpath] = mod
    return mod


def _port_and_apply(tmodel, name, x_np, drop_keys=()):
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    for k in list(sd):
        if k in drop_keys or any(k.startswith(p) for p in drop_keys):
            del sd[k]
    params, stats, report = port_maze_state_dict(sd, name)
    assert report["missing"] == []
    assert report["unconsumed"] == []

    exp = reference_parity_experiment(name)
    exp.data.cut = x_np.shape[-1]
    model = build_model(exp.model)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x_np), train=False)
    merged = merge_params(variables["params"], params)
    merged_stats = merge_params(variables["batch_stats"], stats)
    return model.apply({"params": merged, "batch_stats": merged_stats},
                       jnp.asarray(x_np), train=False)


# ---- maze4 / maze5 baselines (the literal classes) -------------------------------

@pytest.mark.parametrize("relpath,clsname,name", [
    ("01_Models/01_Baseline_Models/maze4.py",
     "Model4_RawNetSinc_SpecAugment", "maze4"),
    ("01_Models/01_Baseline_Models/maze5.py",
     "Model5_RawNetSinc_SpecAugment_FocalLoss", "maze5"),
])
def test_literal_maze_baseline_forward_parity(relpath, clsname, name):
    mod = load_ref(relpath)
    tmodel = getattr(mod, clsname)(D_ARGS, "cpu").eval()
    rng = np.random.default_rng(0)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((3, CUT)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()    # log-softmax (maze4.py:246)

    out = _port_and_apply(tmodel, name, x)
    got = np.asarray(jax.nn.log_softmax(out["logits"], axis=-1))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["scores"]), ref[:, 1],
                               atol=2e-4, rtol=1e-3)


# ---- maze5_fmsl (Mode A refine: fc1 -> FMSL -> fc2) ------------------------------

def test_literal_maze5_fmsl_forward_parity():
    mod = load_ref("01_Models/02_FMSL_Enhanced_Models/maze5_fmsl_standardized.py")
    cls = mod.Model5_RawNetSinc_SpecAugment_FocalLoss_FMSL_Standardized
    tmodel = cls(D_ARGS, "cpu").eval()
    rng = np.random.default_rng(1)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((3, CUT)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()    # log-softmax (:332)

    # criterion.weight is the CE class-weight buffer (:295), not a model param
    out = _port_and_apply(tmodel, "maze5_fmsl", x, drop_keys=("criterion.",))
    got = np.asarray(jax.nn.log_softmax(out["logits"], axis=-1))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


# ---- maze4_fmsl (Mode C integrated: pooled -> FMSL AM-softmax logits) ------------

def test_literal_maze4_fmsl_forward_parity():
    mod = load_ref("01_Models/02_FMSL_Enhanced_Models/maze4_fmsl_standardized.py")
    cls = mod.Model4_RawNetSinc_SpecAugment_FMSL_Standardized
    tmodel = cls(D_ARGS, "cpu").eval()
    rng = np.random.default_rng(2)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((3, CUT)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x), training=False)
    ref_logits = ref["logits"].numpy()               # s * cosine, eval mode

    out = _port_and_apply(tmodel, "maze4_fmsl", x)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref_logits,
                               atol=2e-4, rtol=1e-3)


def test_literal_maze4_fmsl_train_keyerror():
    """fmsl_advanced's forward NEVER returns 'loss', so the literal maze4_fmsl
    train path (maze4_fmsl_standardized.py:330-336 `fmsl_output['loss']`)
    KeyErrors — the latent defect adfmsl's fixed contract (heads/fmsl.py:8-12)
    deliberately repairs."""
    mod = load_ref("01_Models/02_FMSL_Enhanced_Models/maze4_fmsl_standardized.py")
    cls = mod.Model4_RawNetSinc_SpecAugment_FMSL_Standardized
    tmodel = cls(D_ARGS, "cpu").train()
    x = torch.randn(2, CUT)
    labels = torch.tensor([0, 1])
    with pytest.raises(KeyError):
        tmodel(x, labels, training=True)


# ---- AdvancedFMSLSystem itself vs FMSLHead ---------------------------------------

def _fmsl_variables(ref):
    """Map the literal AdvancedFMSLSystem parameters onto FMSLHead's tree."""
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "proj": {"kernel": sd["projection.0.weight"].T,
                 "bias": sd["projection.0.bias"]},
        "proj_bn": {"scale": sd["projection.1.weight"],
                    "bias": sd["projection.1.bias"]},
        "prototypes": sd["prototypes"],
        "weight": sd["weight"],
        "temperature": sd["temperature"],
    }
    stats = {"proj_bn": {"mean": sd["projection.1.running_mean"],
                         "var": sd["projection.1.running_var"]}}
    return {"params": jax.tree.map(jnp.asarray, params),
            "batch_stats": jax.tree.map(jnp.asarray, stats)}


def _make_head(d, s, m, integrated=True):
    from adfmsl.config.base import FMSLConfig
    from adfmsl.heads.fmsl import FMSLHead

    cfg = FMSLConfig(n_prototypes=3, s=s, m=m, enable_lsa=False)
    return FMSLHead(cfg=cfg, input_dim=d, n_classes=2)


def test_literal_fmsl_system_eval_parity():
    fa = load_ref("06_Utilities/fmsl_advanced.py")
    d = 48
    ref = fa.AdvancedFMSLSystem(input_dim=d, n_classes=2, n_prototypes=3,
                                s=32.0, m=0.45, use_integrated_loss=True).eval()
    rng = np.random.default_rng(3)
    with torch.no_grad():
        _randomize_bn_stats(ref, rng)
        ref.temperature.copy_(torch.tensor(0.7))
    x = rng.standard_normal((5, d)).astype(np.float32)
    with torch.no_grad():
        ro = ref(torch.from_numpy(x), training=False)

    head = _make_head(d, 32.0, 0.45)
    out = head.apply(_fmsl_variables(ref), jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out["embeddings"]),
                               ro["normalized_embeddings"].numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["prototype_similarity"]),
                               ro["prototype_similarity"].numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["logits"]), ro["logits"].numpy(),
                               atol=1e-4, rtol=1e-4)


def test_literal_fmsl_angular_margin_parity():
    """Training-time AM-softmax margin, compared on identical normalized
    features (direct method call — dodges the stochastic projection dropout)."""
    from adfmsl.heads.fmsl import am_softmax_logits, l2_normalize

    fa = load_ref("06_Utilities/fmsl_advanced.py")
    d = 32
    ref = fa.AdvancedFMSLSystem(input_dim=d, n_classes=2, n_prototypes=3,
                                s=32.0, m=0.45, use_integrated_loss=True).eval()
    rng = np.random.default_rng(4)
    feats = rng.standard_normal((6, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    labels = np.array([0, 1, 0, 1, 1, 0])

    with torch.no_grad():
        ref_logits = ref.compute_angular_margin_logits(
            torch.from_numpy(feats), torch.from_numpy(labels),
            training=True).numpy()
    w = jnp.asarray(ref.weight.detach().numpy())
    got = am_softmax_logits(jnp.asarray(feats), w, 32.0, 0.45,
                            jnp.asarray(labels), train=True)
    np.testing.assert_allclose(np.asarray(got), ref_logits, atol=1e-4, rtol=1e-4)

    # eval: no margin, just s * cosine
    with torch.no_grad():
        ref_eval = ref.compute_angular_margin_logits(
            torch.from_numpy(feats), training=False).numpy()
    got_eval = am_softmax_logits(jnp.asarray(feats), w, 32.0, 0.45, train=False)
    np.testing.assert_allclose(np.asarray(got_eval), ref_eval,
                               atol=1e-4, rtol=1e-4)


def test_literal_fmsl_loss_parity():
    """compute_fmsl_loss (fmsl_advanced.py:320-359) vs adfmsl's integrated loss
    formula. adfmsl uses the non-negative prototype term (1 - max_sim) where the
    reference uses -max_sim: identical gradients, constant +0.1 offset when any
    spoof sample is present — asserted exactly."""
    from adfmsl.heads.fmsl import l2_normalize
    from adfmsl.heads.losses import cross_entropy

    fa = load_ref("06_Utilities/fmsl_advanced.py")
    d = 32
    ref = fa.AdvancedFMSLSystem(input_dim=d, n_classes=2, n_prototypes=3,
                                s=2.0, m=0.1, use_integrated_loss=True).eval()
    with torch.no_grad():
        ref.temperature.copy_(torch.tensor(0.6))
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((8, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    labels = np.array([0, 1, 0, 1, 1, 0, 0, 1])   # spoof present

    with torch.no_grad():
        ref_loss = float(ref.compute_fmsl_loss(torch.from_numpy(feats),
                                               torch.from_numpy(labels)))

    # adfmsl formula, functionally (mirrors heads/fmsl.py:97-110)
    from adfmsl.heads.fmsl import am_softmax_logits
    e = jnp.asarray(feats)
    lab = jnp.asarray(labels)
    logits = am_softmax_logits(e, jnp.asarray(ref.weight.detach().numpy()),
                               2.0, 0.1, lab, train=True)
    ce = jnp.mean(cross_entropy(logits, lab))
    proto = e @ l2_normalize(jnp.asarray(ref.prototypes.detach().numpy()),
                             axis=-1).T
    proto = proto / jnp.maximum(jnp.asarray(0.6), 0.01)
    best = jnp.max(proto, axis=-1)
    spoof = (lab == 0).astype(jnp.float32)
    proto_loss = jnp.sum((1.0 - best) * spoof) / jnp.maximum(jnp.sum(spoof), 1.0)
    mine = float(ce + 0.1 * proto_loss)
    assert abs((mine - 0.1) - ref_loss) < 1e-5


def test_literal_fmsl_forward_contract_defect():
    """use_integrated_loss=False: the literal forward omits 'logits' entirely
    and no mode ever returns 'loss' (fmsl_advanced.py:287-304)."""
    fa = load_ref("06_Utilities/fmsl_advanced.py")
    ref = fa.AdvancedFMSLSystem(input_dim=16, n_classes=2,
                                use_integrated_loss=False).eval()
    with torch.no_grad():
        out = ref(torch.randn(4, 16), training=False)
    assert "logits" not in out and "loss" not in out
    ref2 = fa.AdvancedFMSLSystem(input_dim=16, n_classes=2,
                                 use_integrated_loss=True).eval()
    with torch.no_grad():
        out2 = ref2(torch.randn(4, 16), torch.tensor([0, 1, 0, 1]),
                    training=True)
    assert "logits" in out2 and "loss" not in out2


# ---- main_fmsl: literal RawNetWithFMSL composition -------------------------------

class _StubRawNet(TRawNet):
    """Stand-in for the EXTERNAL `maze.RawNet` main_fmsl_standardized.py:30
    imports (the Tak et al. RawNet2 baseline — not shipped in the reference
    repo). RawNetWithFMSL re-drives the layers attribute-by-attribute
    (main_fmsl_standardized.py:101-157), so only the attribute layout matters;
    this forward is never called."""

    def __init__(self, model_config, device):
        super().__init__(gru_layers=2, fmsl=False)
        self.avgpool = tnn.AdaptiveAvgPool1d(1)
        self.sig = tnn.Sigmoid()
        self.selu = tnn.SELU(inplace=False)


def _load_main_fmsl():
    _install_stubs()
    if "maze" not in sys.modules:
        mz = types.ModuleType("maze")
        mz.RawNet = _StubRawNet
        mz.genSpoof_list = lambda *a, **k: ([], {})
        mz.Dataset_ASVspoof2019_train = object
        mz.Dataset_ASVspoof2021_eval = object
        sys.modules["maze"] = mz
    return load_ref("01_Models/02_FMSL_Enhanced_Models/main_fmsl_standardized.py")


def _main_fmsl_model_config():
    # main_fmsl_standardized.py:357-368
    return {"backbone_output_dim": 1024, "fmsl_type": "prototype",
            "fmsl_n_prototypes": 3, "fmsl_s": 32.0, "fmsl_m": 0.45,
            "fmsl_enable_lsa": True}


def test_literal_main_fmsl_keyerror():
    """use_integrated_loss=False (main_fmsl_standardized.py:88) means
    fmsl_output has no 'logits': the literal model crashes in BOTH train and
    eval forwards — the reference's main_fmsl was never runnable as written."""
    mod = _load_main_fmsl()
    tmodel = mod.RawNetWithFMSL(_main_fmsl_model_config(), "cpu").eval()
    x = torch.randn(2, 8000)
    with torch.no_grad(), pytest.raises(KeyError):
        tmodel(x, training=False)


def test_literal_main_fmsl_embedding_parity():
    """The recoverable literal semantics: backbone -> fc1_gru -> FMSL normalized
    embeddings (main_fmsl_standardized.py:103-160). adfmsl 'main_fmsl' (Mode B
    replace) must reproduce those embeddings bit-for-bit and emit the AM-softmax
    logits the reference *intended* (s=32 * cosine against the FMSL weights)."""
    mod = _load_main_fmsl()
    tmodel = mod.RawNetWithFMSL(_main_fmsl_model_config(), "cpu").eval()
    rng = np.random.default_rng(6)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((2, 8000)).astype(np.float32)

    # literal path up to the FMSL system output (forward crashes at 'logits',
    # so drive the same attribute sequence and stop at fmsl_system)
    with torch.no_grad():
        t = torch.from_numpy(x)
        b = tmodel.backbone
        h = b.Sinc_conv(t.unsqueeze(1))
        h = torch.nn.functional.max_pool1d(torch.abs(h), 3)
        h = b.selu(b.first_bn(h))
        for i in range(6):
            hi = getattr(b, f"block{i}")(h)
            y = b.sig(getattr(b, f"fc_attention{i}")(
                b.avgpool(hi).view(hi.size(0), -1)))
            h = hi * y.unsqueeze(-1) + y.unsqueeze(-1)
        h = b.selu(b.bn_before_gru(h))
        out, _ = b.gru(h.permute(0, 2, 1))
        feat = b.fc1_gru(out[:, -1, :])
        fo = tmodel.fmsl_system(feat, training=False)
        ref_emb = fo["normalized_embeddings"].numpy()
        w = torch.nn.functional.normalize(tmodel.fmsl_system.weight, p=2, dim=-1)
        intended_logits = (32.0 * (fo["normalized_embeddings"] @ w.T)).numpy()

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
          if not k.startswith("criterion.")
          and not k.startswith("backbone.fc2_gru.")}
    params, stats, report = port_maze_state_dict(sd, "main_fmsl")
    assert report["missing"] == []
    assert report["unconsumed"] == []

    exp = reference_parity_experiment("main_fmsl")
    exp.data.cut = 8000
    exp.model.architecture.nb_gru_layer = 2
    model = build_model(exp.model)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x), train=False)
    out = model.apply({"params": merge_params(variables["params"], params),
                       "batch_stats": merge_params(variables["batch_stats"], stats)},
                      jnp.asarray(x), train=False)
    scale = max(float(np.abs(intended_logits).max()), 1.0)
    np.testing.assert_allclose(np.asarray(out["features"]), ref_emb,
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["logits"]), intended_logits,
                               atol=1e-3 * scale, rtol=1e-3)


# ---- maze7_fmsl: literal w2v2-trunk model (tiny local w2v2 via patched hub) ------

def test_literal_maze7_fmsl_forward_parity(monkeypatch):
    """Literal Model7_RawNet_Wav2Vec2_FMSL_Standardized (maze7_fmsl_standardized
    .py:179-291) with transformers' from_pretrained patched to a tiny local
    random-init Wav2Vec2Model (zero egress; weights are ported either way).
    This is the family whose TAdaptBlock trunk the literal oracle uncovered."""
    import transformers

    from test_port import _tiny_hf_w2v2
    from adfmsl.models.mazes import MazeModel
    from adfmsl.models.w2v2 import W2V2Arch

    tiny = _tiny_hf_w2v2()
    fe = transformers.Wav2Vec2FeatureExtractor(do_normalize=True,
                                               return_attention_mask=False)
    monkeypatch.setattr(transformers.Wav2Vec2Processor, "from_pretrained",
                        classmethod(lambda cls, name, **kw: fe))
    monkeypatch.setattr(transformers.Wav2Vec2Model, "from_pretrained",
                        classmethod(lambda cls, name, **kw: tiny))

    mod = load_ref("01_Models/02_FMSL_Enhanced_Models/maze7_fmsl_standardized.py")
    d_args = dict(D_ARGS, wav2vec2_output_dim=64)
    tmodel = mod.Model7_RawNet_Wav2Vec2_FMSL_Standardized(d_args, "cpu").eval()
    rng = np.random.default_rng(7)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((2, CUT)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x), training=False)
    ref_logits = ref["logits"].numpy()

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
          if "masked_spec_embed" not in k}
    params, stats, report = port_maze_state_dict(sd, "maze7_fmsl",
                                                 w2v2_arch=W2V2Arch.tiny())
    assert report["missing"] == []
    assert report["unconsumed"] == []

    exp = reference_parity_experiment("maze7_fmsl")
    exp.data.cut = CUT
    exp.model.wav2vec2.model_name = "tiny"
    model = build_model(exp.model)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x), train=False)
    out = model.apply(
        {"params": merge_params(variables["params"], params),
         "batch_stats": merge_params(variables["batch_stats"], stats)},
        jnp.asarray(x), train=False)
    scale = max(float(np.abs(ref_logits).max()), 1.0)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref_logits,
                               atol=1e-3 * scale, rtol=1e-3)


# ---- w2v2 baselines + fmsl variants: literal classes, tiny local w2v2 -----------

def _patch_hub(monkeypatch):
    """from_pretrained -> tiny local random-init Wav2Vec2 (zero egress; the
    weights are ported, so random init is fine). The processor duck-type is an
    HF feature extractor: zero-mean/unit-var per utterance, like the models'
    manual normalisation."""
    import transformers

    from test_port import _tiny_hf_w2v2

    tiny = _tiny_hf_w2v2()
    fe = transformers.Wav2Vec2FeatureExtractor(do_normalize=True,
                                               return_attention_mask=False)
    monkeypatch.setattr(transformers.Wav2Vec2Processor, "from_pretrained",
                        classmethod(lambda cls, name, **kw: fe))
    monkeypatch.setattr(transformers.Wav2Vec2Model, "from_pretrained",
                        classmethod(lambda cls, name, **kw: tiny))
    return tiny


def _port_w2v2(tmodel, name, x, spec_override=None, drop=("criterion.",),
               mode_override=None):
    from adfmsl.models.mazes import MazeModel
    from adfmsl.models.w2v2 import W2V2Arch

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
          if not any(k.startswith(p) for p in drop)}
    params, stats, report = port_maze_state_dict(sd, name,
                                                 w2v2_arch=W2V2Arch.tiny())
    assert report["missing"] == [], report["missing"]
    assert report["unconsumed"] == [], report["unconsumed"]

    exp = reference_parity_experiment(name)
    exp.data.cut = x.shape[-1]
    exp.model.wav2vec2.model_name = "tiny"
    if mode_override and exp.model.fmsl is not None:
        exp.model.fmsl.mode = mode_override
    model = (MazeModel(spec=spec_override, cfg=exp.model) if spec_override
             else build_model(exp.model))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x), train=False)
    return model.apply(
        {"params": merge_params(variables["params"], params),
         "batch_stats": merge_params(variables["batch_stats"], stats)},
        jnp.asarray(x), train=False)


def test_literal_maze2_forward_parity(monkeypatch):
    """maze2.py:119-193 — incl. its file-local block drift (1x1 skip on channel
    change only, maze2.py:52) that the 'maze2' semantics reproduce."""
    _patch_hub(monkeypatch)
    mod = load_ref("01_Models/01_Baseline_Models/maze2.py")
    d_args = dict(D_ARGS, wav2vec2_output_dim=64)
    tmodel = mod.Model7_RawNet_Wav2Vec2_SpecAug_FocalLoss(d_args, "cpu").eval()
    rng = np.random.default_rng(10)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((2, CUT)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()        # log-softmax
    out = _port_w2v2(tmodel, "maze2", x)
    got = np.asarray(jax.nn.log_softmax(out["logits"], axis=-1))
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_literal_maze3_forward_parity(monkeypatch):
    """maze3.py:101-164 Model_Maze5 with the :994 runtime config
    (nb_fc_node=1024 — the literal oracle corrected the spec)."""
    _patch_hub(monkeypatch)
    mod = load_ref("01_Models/01_Baseline_Models/maze3.py")
    d_args = dict(D_ARGS, wav2vec2_output_dim=64)
    tmodel = mod.Model_Maze5(d_args, "cpu").eval()
    rng = np.random.default_rng(11)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((2, CUT)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()        # raw logits
    out = _port_w2v2(tmodel, "maze3", x)
    scale = max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref,
                               atol=1e-3 * scale, rtol=1e-3)


def test_literal_maze6_forward_parity(monkeypatch):
    """maze6.py:182-267 Model_Maze6: multi-level fusion (3 taps on the tiny
    model; runtime uses [0,6,12,18,24] on large), projection, SE trunk,
    4-layer transformer, Linear-attention ASP (std), raw logits."""
    import dataclasses

    from adfmsl.models.mazes import SPECS

    _patch_hub(monkeypatch)
    mod = load_ref("01_Models/01_Baseline_Models/maze6.py")
    d_args = dict(D_ARGS, wav2vec2_output_dim=64,
                  wav2vec2_output_layers=[0, 1, 2],
                  wav2vec2_freeze_cnn=True, wav2vec2_unfrozen_transformers=0,
                  transformer_num_layers=4)
    tmodel = mod.Model_Maze6(d_args, "cpu").eval()
    rng = np.random.default_rng(12)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((2, CUT)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()        # raw logits
    # tiny w2v2: projected_dim falls back to wav2vec2_output_dim (=64) and the
    # fusion has 3 taps; the canonical spec (1024-d projection, 5 taps) only
    # parameterises conditions/shapes, so override those two
    spec = dataclasses.replace(SPECS["maze6"], proj_dim=64,
                               fusion_layers=(0, 1, 2))
    out = _port_w2v2(tmodel, "maze6", x, spec_override=spec)
    scale = max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref,
                               atol=1e-3 * scale, rtol=1e-3)


def test_literal_maze8_fmsl_keyerror_and_recoverable_parity(monkeypatch):
    """maze8_fmsl_standardized.py:228-264: unlike maze7_fmsl (integrated=True),
    maze8_fmsl builds its FMSL with use_integrated_loss=False yet reads
    `fmsl_output['logits']` unconditionally — the literal forward KeyErrors in
    BOTH modes (same defect family as main_fmsl/maze3_fmsl). Recoverable
    semantics: TAdaptBlock trunk -> pooled -> FMSL intended AM logits (s=2)."""
    _patch_hub(monkeypatch)
    mod = load_ref("01_Models/02_FMSL_Enhanced_Models/maze8_fmsl_standardized.py")
    d_args = dict(D_ARGS, wav2vec2_output_dim=64)
    tmodel = mod.Model8_RawNet_Wav2Vec2_FMSL_Standardized(d_args, "cpu").eval()
    rng = np.random.default_rng(13)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((2, CUT)).astype(np.float32)
    with torch.no_grad(), pytest.raises(KeyError):
        tmodel(torch.from_numpy(x), training=False)

    with torch.no_grad():
        t = torch.from_numpy(x)
        h = tmodel.feature_projection(tmodel.wav2vec2_extractor(t))
        h = tmodel.selu(tmodel.first_bn(h))
        h = tmodel.se0(tmodel.block0(h))
        for blk, se in zip(tmodel.res_blocks, tmodel.se_blocks):
            h = se(blk(h))
        pooled = tmodel.global_pool(h).squeeze(-1)
        fo = tmodel.fmsl_system(pooled, training=False)
        emb = fo["normalized_embeddings"]
        w = torch.nn.functional.normalize(tmodel.fmsl_system.weight, p=2, dim=-1)
        intended = (2.0 * (emb @ w.T)).numpy()

    out = _port_w2v2(tmodel, "maze8_fmsl", x)
    np.testing.assert_allclose(np.asarray(out["features"]), emb.numpy(),
                               atol=1e-3, rtol=1e-3)
    scale = max(float(np.abs(intended).max()), 1.0)
    np.testing.assert_allclose(np.asarray(out["logits"]), intended,
                               atol=1e-3 * scale, rtol=1e-3)


def test_literal_maze6_fmsl_fallback_parity(monkeypatch):
    """maze6_fmsl_standardized.py:213-382 FULL literal forward. The FMSL logits
    KeyError is swallowed at :345-361 and the fallback classifier scores — the
    reference's best-overall model (EER 0.0257) never actually uses its FMSL
    logits. The ported model under parity semantics ('fallback' mode, Conv-attn
    variance ASP) must match the literal output bit-comparably."""
    import dataclasses

    from adfmsl.models.mazes import SPECS

    _patch_hub(monkeypatch)
    mod = load_ref("01_Models/02_FMSL_Enhanced_Models/maze6_fmsl_standardized.py")
    d_args = dict(D_ARGS, wav2vec2_base_dim=64,
                  wav2vec2_output_layers=[0, 1, 2],
                  use_spec_augment_w2v2=False)
    tmodel = mod.Model6_RawNet_Wav2Vec2_FMSL_Standardized(d_args, "cpu").eval()
    assert tmodel.use_fmsl
    rng = np.random.default_rng(14)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((2, CUT)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x), training=False)
    assert not tmodel.use_fmsl   # the literal silently disabled its own FMSL
    ref_logits = ref["logits"].numpy()                   # fallback classifier
    spec = dataclasses.replace(SPECS["maze6_fmsl"], fusion_layers=(0, 1, 2))
    out = _port_w2v2(tmodel, "maze6_fmsl", x, spec_override=spec)
    scale = max(float(np.abs(ref_logits).max()), 1.0)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref_logits,
                               atol=1e-3 * scale, rtol=1e-3)


def test_literal_maze3_fmsl_keyerror_and_recoverable_parity(monkeypatch):
    """maze3_fmsl_standardized.py:219-256: `fmsl_output['logits']` with
    use_integrated_loss=False KeyErrors in BOTH modes (same defect family as
    main_fmsl). The recoverable semantics — trunk -> transformer -> pooled ->
    FMSL embeddings + intended AM-softmax logits — must match adfmsl's
    maze3_fmsl (Mode B replace)."""
    _patch_hub(monkeypatch)
    mod = load_ref("01_Models/02_FMSL_Enhanced_Models/maze3_fmsl_standardized.py")
    d_args = dict(D_ARGS, wav2vec2_output_dim=64)
    tmodel = mod.Model3_RawNetSinc_SE_Transformer_FMSL_Standardized(
        d_args, "cpu").eval()
    rng = np.random.default_rng(15)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((2, CUT)).astype(np.float32)
    with torch.no_grad(), pytest.raises(KeyError):
        tmodel(torch.from_numpy(x), training=False)

    with torch.no_grad():
        t = torch.from_numpy(x)
        h = tmodel.feature_projection(tmodel.wav2vec2_extractor(t))
        for b in tmodel.blocks:
            h = b(h)
        h = tmodel.final_block(h)
        h = tmodel.transformer(h)
        pooled = tmodel.global_pool(h).squeeze(-1)
        fo = tmodel.fmsl_system(pooled, training=False)
        emb = fo["normalized_embeddings"]
        w = torch.nn.functional.normalize(tmodel.fmsl_system.weight, p=2, dim=-1)
        intended = (32.0 * (emb @ w.T)).numpy()

    out = _port_w2v2(tmodel, "maze3_fmsl", x)
    np.testing.assert_allclose(np.asarray(out["features"]), emb.numpy(),
                               atol=1e-3, rtol=1e-3)
    scale = max(float(np.abs(intended).max()), 1.0)
    np.testing.assert_allclose(np.asarray(out["logits"]), intended,
                               atol=1e-3 * scale, rtol=1e-3)


def test_literal_maze2_fmsl_crash_and_recoverable_parity(monkeypatch):
    """maze2_fmsl_standardized.py:466-470: pooled 256-d features pass through a
    lazily-created Linear(256,512) into an FMSL built with input_dim=256 — the
    literal forward ALWAYS crashes on the shape mismatch. The recoverable
    checkpoint semantics (pooled 256 feeds the FMSL directly) must match
    adfmsl's maze2_fmsl."""
    _patch_hub(monkeypatch)
    mod = load_ref("01_Models/02_FMSL_Enhanced_Models/maze2_fmsl_standardized.py")
    d_args = dict(D_ARGS, wav2vec2_output_dim=64)
    tmodel = mod.Model2_Wav2Vec2_SpecAugment_Focal_FMSL(d_args, "cpu").eval()
    rng = np.random.default_rng(16)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((2, CUT)).astype(np.float32)
    with torch.no_grad(), pytest.raises(RuntimeError):
        tmodel(torch.from_numpy(x), training=False)

    with torch.no_grad():
        t = torch.from_numpy(x)
        h = tmodel.feature_projection(tmodel.wav2vec2_extractor(t))
        h = tmodel.selu(tmodel.first_bn(h))
        h = tmodel.block2(tmodel.block1(tmodel.block0(h)))
        pooled = tmodel.avg_pool(h).squeeze(-1)          # (B, 256)
        fo = tmodel.fmsl_system(pooled, training=False)
        emb = fo["normalized_embeddings"]
        w = torch.nn.functional.normalize(tmodel.fmsl_system.weight, p=2, dim=-1)
        intended = (32.0 * (emb @ w.T)).numpy()

    # the dead lazy fmsl_projection never materialises in a no-grad eval crash,
    # so the state dict is exactly the checkpoint-compatible subset
    out = _port_w2v2(tmodel, "maze2_fmsl", x)
    np.testing.assert_allclose(np.asarray(out["features"]), emb.numpy(),
                               atol=1e-3, rtol=1e-3)
    scale = max(float(np.abs(intended).max()), 1.0)
    np.testing.assert_allclose(np.asarray(out["logits"]), intended,
                               atol=1e-3 * scale, rtol=1e-3)


# ---- maze7 / maze8 baselines: literal classes ------------------------------------

@pytest.mark.parametrize("relpath,clsname,name", [
    ("01_Models/01_Baseline_Models/maze7.py", None, "maze7"),
    ("01_Models/01_Baseline_Models/maze8.py", None, "maze8"),
])
def test_literal_maze7_maze8_forward_parity(monkeypatch, relpath, clsname, name):
    """maze7.py:144-217 / maze8.py:193-277 (conv-FMSL layer) — the w2v2 + maze5
    block trunk baselines, literal classes with a tiny local w2v2."""
    _patch_hub(monkeypatch)
    mod = load_ref(relpath)
    cls = next(getattr(mod, n) for n in dir(mod)
               if n.startswith("Model") and "RawNet_Wav2Vec2" in n)
    d_args = dict(D_ARGS, wav2vec2_output_dim=64)
    tmodel = cls(d_args, "cpu").eval()
    rng = np.random.default_rng(17)
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((2, CUT)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x))
        ref = (ref.numpy() if isinstance(ref, torch.Tensor)
               else ref["logits"].numpy())
    out = _port_w2v2(tmodel, name, x)
    got = np.asarray(jax.nn.log_softmax(out["logits"], axis=-1))
    scale = max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(got, ref, atol=1e-3 * scale, rtol=1e-3)
