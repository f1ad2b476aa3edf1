"""Checkpoint-porting parity tests: an independent torch implementation of the
reference maze4/maze5 topology (state-dict key layout per maze4.py:165-247 /
maze5_fmsl_standardized.py:214-332) is random-initialised, ported via
adfmsl.models.port, and the Flax forward must match the torch forward within f32
tolerance — the same methodology as test_w2v2.py."""
import math
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from adfmsl.models import build_model
from adfmsl.models.port import (merge_params, port_maze_state_dict,
                                reference_parity_experiment)

CUT = 4000
SR = 16000


# ---- independent torch reference topology (test-only) ---------------------------

class TSinc(tnn.Module):
    """Trainable sinc filterbank with the reference's formula/params
    (maze4.py:38-103 contract: low_hz_/band_hz_ (C,1), hann periodic=False,
    h = 2f*sinc(2f*pi*n), VALID conv)."""

    def __init__(self, c=128, k=251, sr=SR):
        super().__init__()
        self.k, self.sr = k, sr
        low = 30.0
        high = sr / 2 - 100.0
        mel = np.linspace(2595 * np.log10(1 + low / 700),
                          2595 * np.log10(1 + high / 700), c + 1)
        hz = 700 * (10 ** (mel / 2595) - 1)
        self.low_hz_ = tnn.Parameter(torch.tensor(hz[:-1], dtype=torch.float32).view(-1, 1))
        self.band_hz_ = tnn.Parameter(torch.tensor(np.diff(hz), dtype=torch.float32).view(-1, 1))
        n = (k - 1) / 2.0
        self.register_buffer("n_", torch.arange(-n, n + 1).view(1, -1) / sr)
        self.register_buffer("window_", torch.hann_window(k, periodic=False))

    def forward(self, x):                              # (B, 1, T)
        low = 50.0 + torch.abs(self.low_hz_)
        high = torch.clamp(low + 50.0 + torch.abs(self.band_hz_), 50.0, self.sr / 2)
        f_lo, f_hi = low / self.sr, high / self.sr
        h = (2 * f_hi * torch.sinc(2 * f_hi * math.pi * self.n_)
             - 2 * f_lo * torch.sinc(2 * f_lo * math.pi * self.n_))
        filt = (self.window_ * h).view(-1, 1, self.k)
        return tF.conv1d(x, filt)


class TSE(tnn.Module):
    def __init__(self, c, r=16):
        super().__init__()
        self.fc = tnn.Sequential(tnn.Linear(c, c // r, bias=False), tnn.ReLU(),
                                 tnn.Linear(c // r, c, bias=False), tnn.Sigmoid())

    def forward(self, x):                              # (B, C, T)
        y = self.fc(x.mean(dim=2))
        return x * y.unsqueeze(-1)


class TRes(tnn.Module):
    """Reference Residual_Block_SE semantics (maze4.py:105-147)."""

    def __init__(self, cin, cout, first=False, stride=1, p=0.3,
                 skip_on_stride=True):
        super().__init__()
        self.first, self.stride = first, stride
        if not first:
            self.bn1 = tnn.BatchNorm1d(cin)
        self.conv1 = tnn.Conv1d(cin, cout, 3, padding=1)
        self.bn2 = tnn.BatchNorm1d(cout)
        self.dropout = tnn.Dropout(p)
        self.conv2 = tnn.Conv1d(cout, cout, 3, padding=1)
        # maze2.py:52's drift: `(in != out) or (stride != 1 and first)` — no 1x1
        # skip on its stride-2 same-channel blocks (skip_on_stride=False)
        if cin != cout or (stride != 1 and skip_on_stride):
            self.conv_downsample = tnn.Conv1d(cin, cout, 1)
        self.pool = (tnn.AvgPool1d(2 * stride - 1, stride, stride - 1)
                     if stride > 1 else None)

    def forward(self, x):
        h = x if self.first else tF.relu(self.bn1(x))
        h = self.conv1(h)
        h = self.conv2(self.dropout(tF.relu(self.bn2(h))))
        skip = self.conv_downsample(x) if hasattr(self, "conv_downsample") else x
        out = h + skip
        return self.pool(out) if self.pool is not None else out


class TFMSL(tnn.Module):
    """Reference AdvancedFMSLSystem param layout (fmsl_advanced.py:103-150);
    eval forward = project -> l2 normalize."""

    def __init__(self, d, n_proto=3):
        super().__init__()
        self.projection = tnn.Sequential(tnn.Linear(d, d), tnn.BatchNorm1d(d),
                                         tnn.ReLU(), tnn.Dropout(0.1))
        self.prototypes = tnn.Parameter(torch.randn(n_proto, d))
        self.weight = tnn.Parameter(torch.randn(2, d))
        self.temperature = tnn.Parameter(torch.tensor(1.0))

    def forward(self, x):
        return tF.normalize(self.projection(x), p=2, dim=-1)


class TMaze5(tnn.Module):
    """Model5_RawNetSinc_SpecAugment_FocalLoss layer plan (maze5.py:178-264)."""

    def __init__(self, fmsl=False):
        super().__init__()
        self.sinc_conv = TSinc()
        self.first_bn = tnn.BatchNorm1d(128)
        self.block0 = TRes(128, 128, first=True)
        self.se0 = TSE(128)
        plan = [(128, 128), (128, 128), (128, 128), (128, 256)]
        self.res_blocks = tnn.ModuleList(TRes(a, b, stride=2) for a, b in plan)
        self.se_blocks = tnn.ModuleList(TSE(b) for _, b in plan)
        self.fc1 = tnn.Linear(256, 1024)
        self.dropout_fc = tnn.Dropout(0.5)
        self.fc2 = tnn.Linear(1024 if fmsl else 1024, 2)
        self.fmsl_system = TFMSL(1024) if fmsl else None

    def forward(self, x):                              # (B, T)
        h = self.sinc_conv(x.unsqueeze(1))
        h = tF.selu(self.first_bn(h))
        h = self.se0(self.block0(h))
        for blk, se in zip(self.res_blocks, self.se_blocks):
            h = se(blk(h))
        h = h.mean(dim=2)
        h = self.dropout_fc(self.fc1(h))
        if self.fmsl_system is not None:
            h = self.fmsl_system(h)
        return tF.log_softmax(self.fc2(h), dim=-1)


def _randomize_bn_stats(model, rng):
    """Make running stats non-trivial so BN parity is actually exercised."""
    for mod in model.modules():
        if isinstance(mod, tnn.BatchNorm1d):
            c = mod.running_mean.shape[0]
            mod.running_mean.copy_(torch.tensor(
                rng.standard_normal(c).astype(np.float32) * 0.5))
            mod.running_var.copy_(torch.tensor(
                (rng.random(c).astype(np.float32) * 2.0 + 0.5)))


def _port_and_apply(tmodel, name, x_np):
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, stats, report = port_maze_state_dict(sd, name)
    assert report["missing"] == []
    assert report["unconsumed"] == []

    exp = reference_parity_experiment(name)
    exp.data.cut = CUT
    model = build_model(exp.model)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x_np), train=False)
    merged = merge_params(variables["params"], params)
    merged_stats = merge_params(variables["batch_stats"], stats)
    return model.apply({"params": merged, "batch_stats": merged_stats},
                       jnp.asarray(x_np), train=False)


@pytest.mark.parametrize("name", ["maze5", "maze5_fmsl"])
def test_ported_maze_forward_parity(name):
    rng = np.random.default_rng(0)
    tmodel = TMaze5(fmsl=name.endswith("_fmsl")).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((3, CUT)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    out = _port_and_apply(tmodel, name, x)
    got = np.asarray(jax.nn.log_softmax(out["logits"], axis=-1))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)
    # score semantics: log-softmax[:, 1]
    np.testing.assert_allclose(np.asarray(out["scores"]), ref[:, 1],
                               atol=2e-4, rtol=1e-3)


def test_ported_maze4_matches_maze5_topology():
    """maze4 shares maze5's layer plan (maze4.py:165-247 vs maze5.py:178-264 —
    only the loss differs); the porter must accept it identically."""
    rng = np.random.default_rng(1)
    tmodel = TMaze5().eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((2, CUT)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    out = _port_and_apply(tmodel, "maze4", x)
    np.testing.assert_allclose(np.asarray(jax.nn.log_softmax(out["logits"], -1)),
                               ref, atol=2e-4, rtol=1e-3)


def test_rich_dict_checkpoint_unwrap(tmp_path):
    """The reference's resume checkpoints wrap the state dict
    (maze3.py:850-880); load_torch_state_dict must unwrap them."""
    from adfmsl.models.port import load_torch_state_dict

    tmodel = TMaze5().eval()
    p = str(tmp_path / "rich.pth")
    torch.save({"epoch": 3, "model_state_dict": tmodel.state_dict(),
                "loss": 0.5}, p)
    sd = load_torch_state_dict(p)
    assert "sinc_conv.low_hz_" in sd
    assert sd["fc1.weight"].shape == (1024, 256)


# ---- RawNet2 (main / main_fmsl) parity ------------------------------------------

class TRawBlock(tnn.Module):
    """ASVspoof-baseline RawNet residual block semantics (re-driven in
    main_fmsl_standardized.py:121-146): leaky 0.3, k3 convs, 1x1 skip on channel
    change, MaxPool1d(3)."""

    def __init__(self, cin, cout, first=False):
        super().__init__()
        self.first = first
        if not first:
            self.bn1 = tnn.BatchNorm1d(cin)
        self.conv1 = tnn.Conv1d(cin, cout, 3, padding=1)
        self.bn2 = tnn.BatchNorm1d(cout)
        self.conv2 = tnn.Conv1d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_downsample = tnn.Conv1d(cin, cout, 1)
        self.mp = tnn.MaxPool1d(3)

    def forward(self, x):
        h = x if self.first else tF.leaky_relu(self.bn1(x), 0.3)
        h = self.conv1(h)
        h = self.conv2(tF.leaky_relu(self.bn2(h), 0.3))
        skip = self.conv_downsample(x) if hasattr(self, "conv_downsample") else x
        return self.mp(h + skip)


class TRawNet(tnn.Module):
    """RawNet2 topology with the reference's attribute/key layout
    (main_fmsl_standardized.py:101-157): Sinc_conv, block0-5, fc_attention0-5,
    bn_before_gru, stacked batch-first GRU, fc1_gru (+ fc2_gru / fmsl_system)."""

    def __init__(self, gru_layers=2, fmsl=False):
        super().__init__()
        self.Sinc_conv = TSinc()
        self.first_bn = tnn.BatchNorm1d(128)
        plan = [(128, 128), (128, 128), (128, 256), (256, 256), (256, 256),
                (256, 256)]
        for i, (a, b) in enumerate(plan):
            setattr(self, f"block{i}", TRawBlock(a, b, first=(i == 0)))
            setattr(self, f"fc_attention{i}", tnn.Linear(b, b))
        self.bn_before_gru = tnn.BatchNorm1d(256)
        self.gru = tnn.GRU(256, 1024, num_layers=gru_layers, batch_first=True)
        self.fc1_gru = tnn.Linear(1024, 1024)
        if fmsl:
            self.fmsl_system = TFMSL(1024)
            self.fmsl_s = 32.0
        else:
            self.fc2_gru = tnn.Linear(1024, 2)

    def forward(self, x):
        h = self.Sinc_conv(x.unsqueeze(1))
        h = tF.max_pool1d(torch.abs(h), 3)
        h = tF.selu(self.first_bn(h))
        for i in range(6):
            hi = getattr(self, f"block{i}")(h)
            y = torch.sigmoid(getattr(self, f"fc_attention{i}")(hi.mean(dim=2)))
            h = hi * y.unsqueeze(-1) + y.unsqueeze(-1)
        h = tF.selu(self.bn_before_gru(h))
        out, _ = self.gru(h.permute(0, 2, 1))
        feat = self.fc1_gru(out[:, -1, :])
        if hasattr(self, "fmsl_system"):
            emb = self.fmsl_system(feat)
            w = tF.normalize(self.fmsl_system.weight, p=2, dim=-1)
            return self.fmsl_s * (emb @ w.T)        # eval AM-softmax logits
        return tF.log_softmax(self.fc2_gru(feat), dim=-1)


@pytest.mark.parametrize("name,prefix", [("main", ""), ("main_fmsl", "backbone.")])
def test_ported_rawnet_forward_parity(name, prefix):
    rng = np.random.default_rng(4)
    is_fmsl = name.endswith("_fmsl")
    tmodel = TRawNet(gru_layers=2, fmsl=is_fmsl).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)

    sd = {}
    for k, v in tmodel.state_dict().items():
        if k.startswith(("fmsl_system.",)) or not prefix:
            sd[k] = v.detach().numpy()
        else:
            sd[prefix + k] = v.detach().numpy()
    params, stats, report = port_maze_state_dict(sd, name)
    assert report["missing"] == []
    assert report["unconsumed"] == []
    assert report["gru_layers"] == 2

    x = rng.standard_normal((2, 8000)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    exp = reference_parity_experiment(name)
    exp.data.cut = 8000
    exp.model.architecture.nb_gru_layer = 2
    model = build_model(exp.model)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x), train=False)
    merged = merge_params(variables["params"], params)
    merged_stats = merge_params(variables["batch_stats"], stats)
    out = model.apply({"params": merged, "batch_stats": merged_stats},
                      jnp.asarray(x), train=False)
    got = np.asarray(out["logits"] if is_fmsl
                     else jax.nn.log_softmax(out["logits"], axis=-1))
    scale = max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(got, ref, atol=1e-3 * scale, rtol=1e-3)


# ---- w2v2-trunk families (maze2 / maze3 / maze7 / maze8 ± fmsl) ------------------

transformers = pytest.importorskip("transformers")


def _tiny_hf_w2v2():
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    cfg = Wav2Vec2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, conv_dim=(32, 32), conv_kernel=(10, 3),
        conv_stride=(5, 2), feat_extract_norm="group",
        do_stable_layer_norm=False, num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16)
    return Wav2Vec2Model(cfg).eval()


class TW2V2Wrap(tnn.Module):
    """Reference Wav2Vec2FeatureExtractor semantics (maze7.py:38-84): processor
    zero-mean/unit-var normalisation -> HF model -> (B, C, T)."""

    def __init__(self):
        super().__init__()
        self.model = _tiny_hf_w2v2()

    def forward(self, x):
        x = (x - x.mean(dim=1, keepdim=True)) / torch.sqrt(
            x.var(dim=1, keepdim=True, unbiased=False) + 1e-7)
        return self.model(x).last_hidden_state.permute(0, 2, 1)


class TConvFMSL(tnn.Module):
    """maze8.py:76-131 FMSLLayer key layout."""

    def __init__(self, c=128, nf=64, k=7, p=0.1):
        super().__init__()
        self.freq_modulation = tnn.Sequential(
            tnn.Conv1d(c, nf, k, padding=k // 2), tnn.BatchNorm1d(nf),
            tnn.ReLU(), tnn.Dropout(p))
        self.spectral_enhancement = tnn.Sequential(
            tnn.Conv1d(nf, nf, 3, padding=1), tnn.BatchNorm1d(nf),
            tnn.ReLU(), tnn.Dropout(p))
        self.freq_attention = tnn.Sequential(
            tnn.AdaptiveAvgPool1d(1), tnn.Conv1d(nf, nf // 4, 1), tnn.ReLU(),
            tnn.Conv1d(nf // 4, nf, 1), tnn.Sigmoid())
        self.output_projection = tnn.Conv1d(nf, c, 1)

    def forward(self, x):
        h = self.spectral_enhancement(self.freq_modulation(x))
        return x + self.output_projection(h * self.freq_attention(h))


class TAdaptBlock(tnn.Module):
    """maze4/7/8_fmsl_standardized.py:112-162 'adaptive' block (literal-oracle
    finding, test_reference_oracle.py): dropout after conv2, and the stride is
    applied by pooling + adaptive-resampling the SKIP only — the conv branch
    (and hence the block output) keeps the full sequence length."""

    def __init__(self, cin, cout, first=False, stride=1, p=0.3):
        super().__init__()
        self.first, self.stride = first, stride
        if not first:
            self.bn1 = tnn.BatchNorm1d(cin)
        self.conv1 = tnn.Conv1d(cin, cout, 3, padding=1)
        self.bn2 = tnn.BatchNorm1d(cout)
        self.dropout = tnn.Dropout(p)
        self.conv2 = tnn.Conv1d(cout, cout, 3, padding=1)
        if cin != cout or stride != 1:
            self.conv_downsample = tnn.Conv1d(cin, cout, 1)
        self.pool = (tnn.AvgPool1d(2 * stride - 1, stride, stride - 1)
                     if stride > 1 else None)

    def forward(self, x):
        if not self.first:
            x = tF.relu(self.bn1(x))
        out = tF.relu(self.bn2(self.conv1(x)))
        out = self.dropout(self.conv2(out))
        skip = self.conv_downsample(x) if hasattr(self, "conv_downsample") else x
        if self.pool is not None:
            skip = self.pool(skip)
        if skip.size(-1) != out.size(-1):
            skip = tF.adaptive_avg_pool1d(skip, out.size(-1))
        return out + skip


class TMaze7(tnn.Module):
    """maze7.py:144-217 / maze8.py:193-277 (conv_fmsl) / fmsl variants (which
    carry the TAdaptBlock trunk, maze7/8_fmsl_standardized.py:112-162)."""

    def __init__(self, conv_fmsl=False, fmsl=False, fmsl_s=32.0):
        super().__init__()
        blk = TAdaptBlock if fmsl else TRes
        self.wav2vec2_extractor = TW2V2Wrap()
        self.feature_projection = tnn.Conv1d(64, 128, 1)
        self.first_bn = tnn.BatchNorm1d(128)
        self.block0 = blk(128, 128, first=True)
        self.se0 = TSE(128)
        plan = [(128, 128), (128, 128), (128, 128), (128, 256)]
        self.res_blocks = tnn.ModuleList(blk(a, b, stride=2) for a, b in plan)
        self.se_blocks = tnn.ModuleList(TSE(b) for _, b in plan)
        if conv_fmsl:
            self.fmsl_layer = TConvFMSL(128)
        if fmsl:
            self.fmsl_system = TFMSL(256)
            self.fmsl_s = fmsl_s
        else:
            self.fc1 = tnn.Linear(256, 1024)
            self.fc2 = tnn.Linear(1024, 2)

    def forward(self, x):
        h = self.feature_projection(self.wav2vec2_extractor(x))
        h = tF.selu(self.first_bn(h))
        if hasattr(self, "fmsl_layer"):
            h = self.fmsl_layer(h)
        h = self.se0(self.block0(h))
        for blk, se in zip(self.res_blocks, self.se_blocks):
            h = se(blk(h))
        h = h.mean(dim=2)
        if hasattr(self, "fmsl_system"):
            emb = self.fmsl_system(h)
            w = tF.normalize(self.fmsl_system.weight, p=2, dim=-1)
            return self.fmsl_s * (emb @ w.T)
        return tF.log_softmax(self.fc2(self.fc1(h)), dim=-1)


class TMaze2(tnn.Module):
    """maze2.py:119-193: BN over the w2v2 dim, 6 SE blocks, BN + plain torch
    TransformerEncoder at d=256, fc1/fc2, LogSoftmax."""

    def __init__(self):
        super().__init__()
        self.wav2vec2_extractor = TW2V2Wrap()
        self.first_bn = tnn.BatchNorm1d(64)
        plan = [(64, 128, 1), (128, 128, 2), (128, 128, 2), (128, 128, 2),
                (128, 256, 2), (256, 256, 2)]
        for i, (a, b, s) in enumerate(plan):
            setattr(self, f"block{i}", TRes(a, b, first=(i == 0), stride=s,
                                            skip_on_stride=False))
            setattr(self, f"se{i}", TSE(b))
        self.bn_before_transformer = tnn.BatchNorm1d(256)
        layer = tnn.TransformerEncoderLayer(
            d_model=256, nhead=8, dim_feedforward=2048, dropout=0.1,
            activation="relu", batch_first=True)
        self.transformer_encoder = tnn.TransformerEncoder(layer, num_layers=2)
        self.fc1 = tnn.Linear(256, 1024)
        self.fc2 = tnn.Linear(1024, 2)

    def forward(self, x):
        h = tF.selu(self.first_bn(self.wav2vec2_extractor(x)))
        for i in range(6):
            h = getattr(self, f"se{i}")(getattr(self, f"block{i}")(h))
        h = self.bn_before_transformer(h).permute(0, 2, 1)
        h = self.transformer_encoder(h).permute(0, 2, 1)
        return tF.log_softmax(self.fc2(self.fc1(h.mean(dim=2))), dim=-1)


class TM3Block(tnn.Module):
    """maze3.py:206-263 variant: internal SE pre-add, 'shortcut' skip, always
    AvgPool1d(3, 2, 1)."""

    def __init__(self, cin, cout, first=False, p=0.3):
        super().__init__()
        self.first = first
        if not first:
            self.bn1 = tnn.BatchNorm1d(cin)
        self.conv1 = tnn.Conv1d(cin, cout, 3, padding=1)
        self.bn2 = tnn.BatchNorm1d(cout)
        self.dropout = tnn.Dropout(p)
        self.conv2 = tnn.Conv1d(cout, cout, 3, padding=1)
        self.se = TSE(cout)
        if cin != cout:
            self.shortcut = tnn.Conv1d(cin, cout, 1)
        self.pool = tnn.AvgPool1d(3, 2, 1)

    def forward(self, x):
        h = x if self.first else tF.relu(self.bn1(x))
        h = self.conv1(h)
        h = self.se(self.conv2(self.dropout(tF.relu(self.bn2(h)))))
        skip = self.shortcut(x) if hasattr(self, "shortcut") else x
        return self.pool(h + skip)


class TMaze3(tnn.Module):
    """maze3.py:101-164: projection, 3 maze3-variant blocks, MLP classifier."""

    def __init__(self):
        super().__init__()
        self.wav2vec2_extractor = TW2V2Wrap()
        self.feature_projection = tnn.Conv1d(64, 128, 1)
        self.blocks = tnn.ModuleList([TM3Block(128, 128, first=True),
                                      TM3Block(128, 128)])
        self.final_block = TM3Block(128, 256)
        self.classifier = tnn.Sequential(tnn.Linear(256, 1024), tnn.ReLU(),
                                         tnn.Dropout(0.5), tnn.Linear(1024, 2))

    def forward(self, x):
        h = self.feature_projection(self.wav2vec2_extractor(x))
        for b in self.blocks:
            h = b(h)
        h = self.final_block(h)
        return self.classifier(h.mean(dim=2))


def _port_w2v2_model(tmodel, name, x, spec_override=None):
    from adfmsl.models.mazes import MazeModel, SPECS
    from adfmsl.models.w2v2 import W2V2Arch

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, stats, report = port_maze_state_dict(sd, name,
                                                 w2v2_arch=W2V2Arch.tiny())
    assert report["missing"] == []
    assert report["unconsumed"] == []

    exp = reference_parity_experiment(name)
    exp.data.cut = x.shape[1]
    exp.model.wav2vec2.model_name = "tiny"
    model = (MazeModel(spec=spec_override, cfg=exp.model) if spec_override
             else build_model(exp.model))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x), train=False)
    merged = merge_params(variables["params"], params)
    merged_stats = merge_params(variables["batch_stats"], stats)
    return model.apply({"params": merged, "batch_stats": merged_stats},
                       jnp.asarray(x), train=False)


@pytest.mark.parametrize("name", ["maze7", "maze8", "maze7_fmsl", "maze8_fmsl"])
def test_ported_maze7_family_forward_parity(name):
    rng = np.random.default_rng(5)
    torch.manual_seed(5)
    is_fmsl = name.endswith("_fmsl")
    # AM-softmax scale follows the per-model drift (config/standardized.py)
    drift_s = {"maze7_fmsl": 5.0, "maze8_fmsl": 2.0}.get(name, 32.0)
    tmodel = TMaze7(conv_fmsl=(name == "maze8"), fmsl=is_fmsl,
                    fmsl_s=drift_s).eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((2, CUT)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    out = _port_w2v2_model(tmodel, name, x)
    got = np.asarray(out["logits"] if is_fmsl
                     else jax.nn.log_softmax(out["logits"], axis=-1))
    scale = max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(got, ref, atol=1e-3 * scale, rtol=1e-3)


def test_ported_maze2_forward_parity():
    rng = np.random.default_rng(6)
    torch.manual_seed(6)
    tmodel = TMaze2().eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((2, CUT)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    # spec has 6 transformer layers; the test torch model carries 2, so build
    # MazeModel with a 2-layer spec directly (the registry closure captures the
    # canonical spec at import)
    import dataclasses

    from adfmsl.models.mazes import SPECS

    spec2 = dataclasses.replace(SPECS["maze2"], transformer=(256, 8, 2, 2048))
    out = _port_w2v2_model(tmodel, "maze2", x, spec_override=spec2)
    got = np.asarray(jax.nn.log_softmax(out["logits"], axis=-1))
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_ported_maze3_forward_parity():
    rng = np.random.default_rng(7)
    torch.manual_seed(7)
    tmodel = TMaze3().eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((2, CUT)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    out = _port_w2v2_model(tmodel, "maze3", x)
    got = np.asarray(out["logits"])
    scale = max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(got, ref, atol=1e-3 * scale, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["scores"]), ref[:, 1],
                               atol=1e-3 * scale)


# ---- maze6 family + maze3_fmsl ---------------------------------------------------

class TW2V2Fusion(tnn.Module):
    """Multi-level extractor (maze6.py:103-165): concat selected hidden states.
    Indices clip to the tiny arch's depth the same way the flax side does."""

    def __init__(self, layers=(0, 6, 12, 18, 24)):
        super().__init__()
        self.model = _tiny_hf_w2v2()
        self.layers = layers

    def forward(self, x):
        x = (x - x.mean(dim=1, keepdim=True)) / torch.sqrt(
            x.var(dim=1, keepdim=True, unbiased=False) + 1e-7)
        hs = self.model(x, output_hidden_states=True).hidden_states
        taps = [hs[min(i, len(hs) - 1)] for i in self.layers]
        return torch.cat(taps, dim=-1).permute(0, 2, 1)


class TASP(tnn.Module):
    """maze6.py:167-180 AttentiveStatisticsPooling."""

    def __init__(self, c, hidden=128):
        super().__init__()
        self.attention_mlp = tnn.Sequential(tnn.Linear(c, hidden), tnn.Tanh(),
                                            tnn.Linear(hidden, 1))

    def forward(self, x):                                # (B, C, T)
        h = x.permute(0, 2, 1)
        w = tF.softmax(self.attention_mlp(h), dim=1)
        mean = (h * w).sum(dim=1)
        std = torch.sqrt((((h - mean.unsqueeze(1)) ** 2) * w).sum(dim=1) + 1e-6)
        return torch.cat([mean, std], dim=1)


class TPlainBlock(tnn.Module):
    """maze3/6_fmsl_standardized.py:48-94: bias-free convs, conv stride,
    pre-activation feeds both branches, 'shortcut' skip."""

    def __init__(self, cin, cout, first=False, stride=1, p=0.3):
        super().__init__()
        self.first = first
        if not first:
            self.bn1 = tnn.BatchNorm1d(cin)
        self.conv1 = tnn.Conv1d(cin, cout, 3, stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm1d(cout)
        self.conv2 = tnn.Conv1d(cout, cout, 3, padding=1, bias=False)
        self.shortcut = (tnn.Conv1d(cin, cout, 1, stride, bias=False)
                         if stride != 1 or cin != cout else tnn.Identity())
        self.dropout = tnn.Dropout(p)

    def forward(self, x):
        if not self.first:
            x = tF.relu(self.bn1(x))
        h = tF.relu(self.bn2(self.conv1(x)))
        h = self.dropout(self.conv2(h))
        return h + self.shortcut(x)


class TMaze6(tnn.Module):
    """maze6.py:182-267 (2 transformer layers for the test)."""

    def __init__(self):
        super().__init__()
        self.wav2vec2_extractor = TW2V2Fusion()
        self.feature_projection = tnn.Conv1d(64 * 5, 1024, 1)
        self.first_bn = tnn.BatchNorm1d(1024)
        self.block0 = TRes(1024, 128, first=True)
        self.se0 = TSE(128)
        plan = [(128, 128), (128, 128), (128, 128), (128, 256)]
        self.res_blocks = tnn.ModuleList(TRes(a, b, stride=2) for a, b in plan)
        self.se_blocks = tnn.ModuleList(TSE(b) for _, b in plan)
        self.bn_before_transformer = tnn.BatchNorm1d(256)
        layer = tnn.TransformerEncoderLayer(256, 8, 2048, 0.1, "relu",
                                            batch_first=True)
        self.transformer_encoder = tnn.TransformerEncoder(layer, 2)
        self.attentive_pooling = TASP(256)
        self.fc1 = tnn.Linear(512, 1024)
        self.fc2 = tnn.Linear(1024, 2)

    def forward(self, x):
        h = self.feature_projection(self.wav2vec2_extractor(x))
        h = tF.relu(self.first_bn(h))
        h = self.se0(self.block0(h))
        for blk, se in zip(self.res_blocks, self.se_blocks):
            h = se(blk(h))
        h = self.bn_before_transformer(h).permute(0, 2, 1)
        h = self.transformer_encoder(h).permute(0, 2, 1)
        h = self.attentive_pooling(h)
        return self.fc2(self.fc1(h))                     # raw logits


class TASPConvVar(tnn.Module):
    """maze6_fmsl_standardized.py:189-211 ASP variant: Conv1d(k=1) attention and
    mean || raw VARIANCE (no sqrt/eps) — the literal oracle's finding."""

    def __init__(self, c, hidden=128):
        super().__init__()
        self.attention = tnn.Sequential(tnn.Conv1d(c, hidden, 1), tnn.Tanh(),
                                        tnn.Conv1d(hidden, 1, 1),
                                        tnn.Softmax(dim=2))

    def forward(self, x):                                # (B, C, T)
        w = self.attention(x)
        mean = (w * x).sum(dim=2)
        var = (w * (x - mean.unsqueeze(2)) ** 2).sum(dim=2)
        return torch.cat([mean, var], dim=1)


class TMaze6FMSL(tnn.Module):
    """maze6_fmsl_standardized.py:213-382. The FMSL logits path KeyErrors at
    runtime (use_integrated_loss=False) and the except silently scores through
    the fallback classifier (:345-361) — so the twin's forward IS the
    classifier; the FMSL system rides along as (dead) ported weights."""

    def __init__(self):
        super().__init__()
        self.wav2vec2_extractor = TW2V2Fusion()
        self.feature_projection = tnn.Conv1d(64 * 5, 128, 1)
        self.first_bn = tnn.BatchNorm1d(128)
        self.block0 = TPlainBlock(128, 128, first=True)
        self.se0 = TSE(128)
        self.res_blocks = tnn.ModuleList([TPlainBlock(128, 128, stride=2),
                                          TPlainBlock(128, 256, stride=2)])
        self.se_blocks = tnn.ModuleList([TSE(128), TSE(256)])
        self.attentive_pooling = TASPConvVar(256)
        self.fmsl_system = TFMSL(512, n_proto=8)
        self.classifier = tnn.Sequential(tnn.Linear(512, 1024), tnn.ReLU(),
                                         tnn.Dropout(0.5), tnn.Linear(1024, 2))

    def forward(self, x):
        h = self.feature_projection(self.wav2vec2_extractor(x))
        h = tF.selu(self.first_bn(h))
        h = self.se0(self.block0(h))
        for blk, se in zip(self.res_blocks, self.se_blocks):
            h = se(blk(h))
        h = self.attentive_pooling(h)
        return self.classifier(h)                        # raw logits


class TM2Block(tnn.Module):
    """maze2_fmsl_standardized.py:50-92: the TPlainBlock layout but with the
    SEBlock INSIDE the block, gating the conv branch BEFORE the residual add."""

    def __init__(self, cin, cout, first=False, stride=1, p=0.3):
        super().__init__()
        self.first = first
        if not first:
            self.bn1 = tnn.BatchNorm1d(cin)
        self.conv1 = tnn.Conv1d(cin, cout, 3, stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm1d(cout)
        self.conv2 = tnn.Conv1d(cout, cout, 3, padding=1, bias=False)
        self.se = TSE(cout)
        self.shortcut = (tnn.Conv1d(cin, cout, 1, stride, bias=False)
                         if stride != 1 or cin != cout else tnn.Identity())
        self.dropout = tnn.Dropout(p)

    def forward(self, x):
        if not self.first:
            x = tF.relu(self.bn1(x))
        h = tF.relu(self.bn2(self.conv1(x)))
        h = self.se(self.dropout(self.conv2(h)))
        return h + self.shortcut(x)


class TMaze2FMSL(tnn.Module):
    """maze2_fmsl_standardized.py:394-487 under the FIXED head semantics the
    port targets: the pooled 256-d trunk feeds the FMSL system directly. The
    reference forward instead lazily creates a Linear(256,512) whose output
    hits the 256-d FMSL projection — an unconditional shape crash (:466-470),
    so no live checkpoint can carry that layer."""

    def __init__(self):
        super().__init__()
        self.wav2vec2_extractor = TW2V2Wrap()
        self.feature_projection = tnn.Conv1d(64, 128, 1)
        self.first_bn = tnn.BatchNorm1d(128)
        self.block0 = TM2Block(128, 128, first=True)
        self.block1 = TM2Block(128, 128, stride=2)
        self.block2 = TM2Block(128, 256)
        self.fmsl_system = TFMSL(256, n_proto=3)

    def forward(self, x):
        h = self.feature_projection(self.wav2vec2_extractor(x))
        h = tF.selu(self.first_bn(h))
        h = self.block2(self.block1(self.block0(h)))
        emb = self.fmsl_system(h.mean(dim=2))
        w = tF.normalize(self.fmsl_system.weight, p=2, dim=-1)
        return 32.0 * (emb @ w.T)   # canonical s (maze2_fmsl has no drift)


class TCustomTransformer(tnn.Module):
    """maze3_fmsl_standardized.py:98-137 custom encoder."""

    def __init__(self, input_dim=256, hidden=512, layers=2, heads=8):
        super().__init__()
        self.input_projection = tnn.Linear(input_dim, hidden)
        self.positional_encoding = tnn.Parameter(torch.randn(1, 1000, hidden))
        layer = tnn.TransformerEncoderLayer(hidden, heads, hidden * 4, 0.1,
                                            "relu", batch_first=True)
        self.transformer = tnn.TransformerEncoder(layer, layers)
        self.output_projection = tnn.Linear(hidden, input_dim)

    def forward(self, x):                                # (B, C, T)
        h = self.input_projection(x.transpose(1, 2))
        h = h + self.positional_encoding[:, : h.size(1), :]
        h = self.output_projection(self.transformer(h))
        return h.transpose(1, 2)


class TMaze3FMSL(tnn.Module):
    """maze3_fmsl_standardized.py:139-256 (blocks carry no SE)."""

    def __init__(self):
        super().__init__()
        self.wav2vec2_extractor = TW2V2Wrap()
        self.feature_projection = tnn.Conv1d(64, 128, 1)
        self.blocks = tnn.ModuleList([TPlainBlock(128, 128, first=True),
                                      TPlainBlock(128, 128)])
        self.final_block = TPlainBlock(128, 256)
        self.transformer = TCustomTransformer(256, 512, 2, 8)
        self.fmsl_system = TFMSL(256)

    def forward(self, x):
        h = self.feature_projection(self.wav2vec2_extractor(x))
        for b in self.blocks:
            h = b(h)
        h = self.transformer(self.final_block(h))
        h = h.mean(dim=2)
        emb = self.fmsl_system(h)
        w = tF.normalize(self.fmsl_system.weight, p=2, dim=-1)
        return 32.0 * (emb @ w.T)


def test_ported_maze6_forward_parity():
    import dataclasses

    from adfmsl.models.mazes import SPECS

    rng = np.random.default_rng(8)
    torch.manual_seed(8)
    tmodel = TMaze6().eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((2, CUT)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    spec2 = dataclasses.replace(SPECS["maze6"], transformer=(256, 8, 2, 2048))
    out = _port_w2v2_model(tmodel, "maze6", x, spec_override=spec2)
    scale = max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref,
                               atol=1e-3 * scale, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["scores"]), ref[:, 1],
                               atol=1e-3 * scale)


def test_ported_maze6_fmsl_forward_parity():
    rng = np.random.default_rng(9)
    torch.manual_seed(9)
    tmodel = TMaze6FMSL().eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((2, CUT)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    out = _port_w2v2_model(tmodel, "maze6_fmsl", x)
    scale = max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref,
                               atol=1e-3 * scale, rtol=1e-3)


def test_ported_maze3_fmsl_forward_parity():
    import dataclasses

    from adfmsl.models.mazes import SPECS

    rng = np.random.default_rng(10)
    torch.manual_seed(10)
    tmodel = TMaze3FMSL().eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((2, CUT)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    spec2 = dataclasses.replace(SPECS["maze3_fmsl"],
                                transformer=(512, 8, 2, 2048))
    out = _port_w2v2_model(tmodel, "maze3_fmsl", x, spec_override=spec2)
    scale = max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref,
                               atol=1e-3 * scale, rtol=1e-3)


def test_ported_maze2_fmsl_forward_parity():
    rng = np.random.default_rng(11)
    torch.manual_seed(11)
    tmodel = TMaze2FMSL().eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, rng)
    x = rng.standard_normal((2, CUT)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    out = _port_w2v2_model(tmodel, "maze2_fmsl", x)
    scale = max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref,
                               atol=1e-3 * scale, rtol=1e-3)


def test_convert_maze_cli_end_to_end(tmp_path):
    """Product path: torch .pth -> adfmsl-convert-maze -> adfmsl-eval restores
    the checkpoint (+ its reference-parity experiment.yaml) and scores a
    synthetic eval split with the exact utterance count."""
    from adfmsl.cli.convert_maze import main as convert_main
    from adfmsl.cli.evaluate import main as eval_main
    from adfmsl.data.synthetic import SyntheticSpec, generate_fixture

    torch.manual_seed(11)
    tmodel = TMaze5().eval()
    pth = str(tmp_path / "maze5.pth")
    torch.save(tmodel.state_dict(), pth)
    ckpt_dir = str(tmp_path / "ported")
    rc = convert_main(["--torch_ckpt", pth, "--model_type", "maze5",
                       "--out", ckpt_dir, "--cut", str(CUT)])
    assert rc == 0
    assert os.path.exists(os.path.join(ckpt_dir, "experiment.yaml"))

    info = generate_fixture(str(tmp_path / "fix"),
                            SyntheticSpec(n_train=4, n_dev=2, n_eval=6,
                                          duration=0.3))
    score_path = str(tmp_path / "scores.txt")
    rc = eval_main(["--model_type", "maze5", "--model_path", ckpt_dir,
                    "--protocol", info["eval"]["protocol"],
                    "--data_dir", info["eval"]["audio_dir"],
                    "--batch_size", "4", "--output", score_path])
    assert rc == 0
    lines = open(score_path).read().strip().splitlines()
    assert len(lines) == 6
    scores = {l.split()[0]: float(l.split()[1]) for l in lines}
    assert all(np.isfinite(v) for v in scores.values())

    # restored scores match the torch model directly on the same audio
    from adfmsl.data import parse_protocol
    from adfmsl.data.pipeline import AsvspoofDataset

    proto = parse_protocol(info["eval"]["protocol"])
    ds = AsvspoofDataset(proto, info["eval"]["audio_dir"], cut=CUT)
    audio = np.stack([ds.load(u)[0] for u in proto.utt_ids])
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(audio)).numpy()[:, 1]
    got = np.asarray([scores[u] for u in proto.utt_ids])
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)
