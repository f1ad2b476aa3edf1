"""Port reference torch ``.pth`` maze checkpoints to adfmsl Flax params.

The reference's eval layer loads trained state dicts with
``load_state_dict(strict=False)`` (Maze5_eval.py:321 ``check_model_compatibility``,
comprehensive_evaluation.py:411-435). This module is the adfmsl equivalent: it maps
torch state-dict keys onto the MazeModel param/batch-stats trees so published
reference checkpoints evaluate in this framework. Use together with the
reference-parity config knobs (``architecture.sinc_formula='reference'``,
``architecture.block_semantics='reference'`` — see ``reference_parity_experiment``)
so the forward pass reproduces the torch semantics.

Covered families:
- sinc trunk (maze4 / maze5, Model4/5_RawNetSinc_SpecAugment*, maze4.py:165-247)
- maze4_fmsl (Mode C) / maze5_fmsl (Mode A refiner, maze5_fmsl_standardized.py:214-332)
- RawNet2 main / main_fmsl (layer re-drive main_fmsl_standardized.py:101-157,
  incl. stacked torch nn.GRU -> flax GRUCell gate unpacking)
- Wav2Vec2 backbones port via models/pretrained.py (w2v2-trunk maze models reuse
  the trunk/head mappings).
- maze2_fmsl ports under FIXED head semantics (see its branch below): its
  reference forward crashes unconditionally on the lazy-projection shape bug
  (maze2_fmsl_standardized.py:466-470), so the porter implements the file's
  stated checkpoint contract (FMSL at the pooled 256-d trunk dim).

All 16 reference models are covered.

Layout conventions: torch Conv1d (out, in, k) -> flax (k, in, out); torch Linear
(out, in) -> flax kernel (in, out); torch BatchNorm1d weight/bias/running_mean/
running_var -> flax scale/bias + batch_stats mean/var. The reference SEBlock's
Linears are bias-free (maze4.py:149-163); flax Dense biases are filled with zeros.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def _t(a) -> np.ndarray:
    """torch tensor / array -> float32 numpy."""
    if hasattr(a, "detach"):
        a = a.detach().cpu().numpy()
    return np.asarray(a, dtype=np.float32)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a ``.pth``/``.pt`` checkpoint into {key: np.ndarray}. Accepts both bare
    state dicts and the reference's rich-dict checkpoints carrying
    'model_state_dict' (maze3.py:850-880)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _t(v) for k, v in obj.items() if hasattr(v, "shape")}


class _Mapper:
    """Accumulates (params, batch_stats) assignments, tracking consumed torch keys."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = dict(sd)
        self.params: Dict[str, Any] = {}
        self.stats: Dict[str, Any] = {}
        self.missing: list = []

    def _set(self, tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def take(self, key: str) -> Optional[np.ndarray]:
        if key not in self.sd:
            self.missing.append(key)
            return None
        return self.sd.pop(key)

    def conv(self, tkey: str, *path: str, bias: bool = True):
        w = self.take(f"{tkey}.weight")
        if w is not None:
            self._set(self.params, path + ("kernel",), np.transpose(w, (2, 1, 0)))
        if bias:
            b = self.take(f"{tkey}.bias")
            if b is not None:
                self._set(self.params, path + ("bias",), b)

    def dense(self, tkey: str, *path: str, bias: bool = True,
              zero_bias_dim: Optional[int] = None):
        w = self.take(f"{tkey}.weight")
        if w is not None:
            self._set(self.params, path + ("kernel",), w.T)
            if zero_bias_dim is not None:
                self._set(self.params, path + ("bias",),
                          np.zeros(w.shape[0], dtype=np.float32))
        if bias:
            b = self.take(f"{tkey}.bias")
            if b is not None:
                self._set(self.params, path + ("bias",), b)

    def bn(self, tkey: str, *path: str):
        w, b = self.take(f"{tkey}.weight"), self.take(f"{tkey}.bias")
        m, v = self.take(f"{tkey}.running_mean"), self.take(f"{tkey}.running_var")
        self.sd.pop(f"{tkey}.num_batches_tracked", None)
        if w is not None:
            self._set(self.params, path + ("scale",), w)
        if b is not None:
            self._set(self.params, path + ("bias",), b)
        if m is not None:
            self._set(self.stats, path + ("mean",), m)
        if v is not None:
            self._set(self.stats, path + ("var",), v)

    def raw(self, tkey: str, *path: str, reshape=None):
        a = self.take(tkey)
        if a is not None:
            if reshape is not None:
                a = a.reshape(reshape)
            self._set(self.params, path, a)

    def se(self, tkey: str, *path: str):
        """Reference SEBlock: fc.0 / fc.2, bias-free (maze4.py:149-163)."""
        self.dense(f"{tkey}.fc.0", *path, "fc1", bias=False)
        self.dense(f"{tkey}.fc.2", *path, "fc2", bias=False)

    def res_block(self, tkey: str, *path: str, first: bool = False,
                  skip_key: str = "conv_downsample"):
        """Reference Residual_Block_SE (maze4.py:105-147) -> adfmsl ResBlockSE.
        maze3's file-local variant names the 1x1 skip 'shortcut' and nests its
        SEBlock inside ('se', maze3.py:206-263)."""
        if not first:
            self.bn(f"{tkey}.bn1", *path, "bn1")
        self.conv(f"{tkey}.conv1", *path, "conv1")
        self.bn(f"{tkey}.bn2", *path, "bn2")
        self.conv(f"{tkey}.conv2", *path, "conv2")
        if any(k.startswith(f"{tkey}.se.") for k in self.sd):
            self.se(f"{tkey}.se", *path, "se")
        if any(k.startswith(f"{tkey}.{skip_key}.") for k in self.sd):
            self.conv(f"{tkey}.{skip_key}", *path, "downsample")

    def res_block_plain(self, tkey: str, *path: str, first: bool = False):
        """The fmsl-file block variant (maze3/6_fmsl_standardized.py:48-94):
        bias-free convs, 'shortcut' skip (Identity when unused)."""
        if not first:
            self.bn(f"{tkey}.bn1", *path, "bn1")
        self.conv(f"{tkey}.conv1", *path, "conv1", bias=False)
        self.bn(f"{tkey}.bn2", *path, "bn2")
        self.conv(f"{tkey}.conv2", *path, "conv2", bias=False)
        if f"{tkey}.shortcut.weight" in self.sd:
            self.conv(f"{tkey}.shortcut", *path, "downsample", bias=False)

    def asp(self, tkey: str, *path: str):
        """AttentiveStatisticsPooling (maze6.py:167-180): attention_mlp.0/.2."""
        self.dense(f"{tkey}.attention_mlp.0", *path, "att1")
        self.dense(f"{tkey}.attention_mlp.2", *path, "att2")

    def asp_conv(self, tkey: str, *path: str):
        """maze6_fmsl's Conv1d-attention ASP (maze6_fmsl_standardized.py:189-197):
        attention.0 (A,C,1) / attention.2 (1,A,1) k=1 convs == Dense att1/att2."""
        for tsub, dest in ((f"{tkey}.attention.0", "att1"),
                           (f"{tkey}.attention.2", "att2")):
            w = self.take(f"{tsub}.weight")
            b = self.take(f"{tsub}.bias")
            if w is not None:
                self._set(self.params, (*path, dest, "kernel"), w[:, :, 0].T)
            if b is not None:
                self._set(self.params, (*path, dest, "bias"), b)

    def conv_fmsl(self, tkey: str, *path: str):
        """maze8's FMSLLayer (maze8.py:76-131) -> blocks.ConvFMSLLayer."""
        self.conv(f"{tkey}.freq_modulation.0", *path, "freq_mod_conv")
        self.bn(f"{tkey}.freq_modulation.1", *path, "freq_mod_bn")
        self.conv(f"{tkey}.spectral_enhancement.0", *path, "spec_enh_conv")
        self.bn(f"{tkey}.spectral_enhancement.1", *path, "spec_enh_bn")
        for idx, name in ((1, "att1"), (3, "att2")):   # 1x1 convs on (B,C,1) == Dense
            w = self.take(f"{tkey}.freq_attention.{idx}.weight")
            if w is not None:
                self._set(self.params, path + (name, "kernel"), w[:, :, 0].T)
                b = self.take(f"{tkey}.freq_attention.{idx}.bias")
                if b is not None:
                    self._set(self.params, path + (name, "bias"), b)
        self.conv(f"{tkey}.output_projection", *path, "out_proj")

    def gru(self, tkey: str, *path: str):
        """torch stacked nn.GRU -> flax GRUCell stack (blocks.GRU naming).

        torch packs gates as rows [r; z; n] in weight_ih_l{k} (3H, in) /
        weight_hh_l{k} (3H, H) with two bias vectors. Flax GRUCell keeps one
        bias per input gate (b_ir+b_hr and b_iz+b_hz merge exactly because
        r = sigma(W_ir x + b_ir + W_hr h + b_hr)) and a separate hn bias
        (n = tanh(W_in x + b_in + r*(W_hn h + b_hn)) in both frameworks)."""
        k = 0
        while f"{tkey}.weight_ih_l{k}" in self.sd:
            wih = self.take(f"{tkey}.weight_ih_l{k}")
            whh = self.take(f"{tkey}.weight_hh_l{k}")
            bih = self.take(f"{tkey}.bias_ih_l{k}")
            bhh = self.take(f"{tkey}.bias_hh_l{k}")
            h = whh.shape[1]
            cell = "cell" if k == 0 else f"cell{k}"

            def g(a, i):   # gate slice i in torch order r, z, n
                return a[i * h:(i + 1) * h]

            for i, gate in enumerate(("r", "z", "n")):
                self._set(self.params, path + (cell, f"i{gate}", "kernel"),
                          g(wih, i).T)
                self._set(self.params, path + (cell, f"h{gate}", "kernel"),
                          g(whh, i).T)
            self._set(self.params, path + (cell, "ir", "bias"),
                      g(bih, 0) + g(bhh, 0))
            self._set(self.params, path + (cell, "iz", "bias"),
                      g(bih, 1) + g(bhh, 1))
            self._set(self.params, path + (cell, "in", "bias"), g(bih, 2))
            self._set(self.params, path + (cell, "hn", "bias"), g(bhh, 2))
            k += 1
        if k == 0:
            self.missing.append(f"{tkey}.weight_ih_l0")
        return k

    def fmsl(self, tkey: str, *path: str):
        """Reference AdvancedFMSLSystem (fmsl_advanced.py:103-150) -> FMSLHead."""
        self.dense(f"{tkey}.projection.0", *path, "proj")
        self.bn(f"{tkey}.projection.1", *path, "proj_bn")
        self.raw(f"{tkey}.prototypes", *path, "prototypes")
        self.raw(f"{tkey}.weight", *path, "weight")
        self.raw(f"{tkey}.temperature", *path, "temperature", reshape=())

    def torch_encoder_layer(self, tkey: str, *path: str, d: int, heads: int):
        """torch nn.TransformerEncoderLayer -> blocks.TransformerEncoderLayer
        (post-LN, ReLU FFN). in_proj packs q/k/v rows; flax attention kernels are
        (d, heads, head_dim) / out (heads, head_dim, d)."""
        hd = d // heads
        wqkv = self.take(f"{tkey}.self_attn.in_proj_weight")
        bqkv = self.take(f"{tkey}.self_attn.in_proj_bias")
        if wqkv is not None:
            for i, gate in enumerate(("query", "key", "value")):
                w = wqkv[i * d:(i + 1) * d]
                self._set(self.params, path + ("self_attn", gate, "kernel"),
                          w.T.reshape(d, heads, hd))
                if bqkv is not None:
                    self._set(self.params, path + ("self_attn", gate, "bias"),
                              bqkv[i * d:(i + 1) * d].reshape(heads, hd))
        wo = self.take(f"{tkey}.self_attn.out_proj.weight")
        if wo is not None:
            self._set(self.params, path + ("self_attn", "out", "kernel"),
                      wo.T.reshape(heads, hd, d))
            self._set(self.params, path + ("self_attn", "out", "bias"),
                      self.take(f"{tkey}.self_attn.out_proj.bias"))
        for tname, fname in (("norm1", "norm1"), ("norm2", "norm2")):
            w, b = self.take(f"{tkey}.{tname}.weight"), self.take(f"{tkey}.{tname}.bias")
            if w is not None:
                self._set(self.params, path + (fname, "scale"), w)
                self._set(self.params, path + (fname, "bias"), b)
        self.dense(f"{tkey}.linear1", *path, "ff1")
        self.dense(f"{tkey}.linear2", *path, "ff2")

    def w2v2_backbone(self, prefix: str, arch=None):
        """'<prefix>wav2vec2_extractor.model.*' HF keys -> params['wav2vec2']
        via models.w2v2.port_hf_state_dict (arch inferred when not given)."""
        from adfmsl.models.w2v2 import W2V2Arch, port_hf_state_dict

        pre = f"{prefix}wav2vec2_extractor.model."
        hf = {k[len(pre):]: self.sd.pop(k) for k in list(self.sd)
              if k.startswith(pre)}
        # masked_spec_embed exists in HF checkpoints but is inference-irrelevant
        hf.pop("masked_spec_embed", None)
        if not hf:
            self.missing.append(pre + "*")
            return
        if arch is None:
            hidden = hf["feature_projection.projection.weight"].shape[0]
            n_layers = 1 + max(int(k.split(".")[2]) for k in hf
                               if k.startswith("encoder.layers."))
            arch = W2V2Arch.large_960h() if hidden >= 1024 else W2V2Arch.base()
            if (hidden, n_layers) not in ((768, 12), (1024, 24)):
                raise ValueError(
                    f"cannot infer W2V2Arch for hidden={hidden}, layers="
                    f"{n_layers}; pass w2v2_arch explicitly")
        self.params["wav2vec2"] = port_hf_state_dict(hf, arch)


def port_maze_state_dict(sd: Dict[str, np.ndarray], model_name: str,
                         w2v2_arch=None
                         ) -> Tuple[Dict[str, Any], Dict[str, Any], Dict[str, Any]]:
    """torch state dict -> (params, batch_stats, report) for MazeModel.

    ``report`` carries 'missing' (expected-but-absent torch keys) and 'unconsumed'
    (torch keys with no adfmsl destination) — the analog of the reference's
    strict=False missing/unexpected key listing (comprehensive_evaluation.py:411-435).
    """
    m = _Mapper(sd)
    is_fmsl = model_name.endswith("_fmsl")
    base = model_name[:-5] if is_fmsl else model_name

    if base == "main":
        # RawNet2 backbone re-driven layer by layer in the reference
        # (main_fmsl_standardized.py:101-157); main_fmsl prefixes 'backbone.'
        pre = "backbone." if any(k.startswith("backbone.") for k in m.sd) else ""
        m.raw(f"{pre}Sinc_conv.low_hz_", "encoder", "sinc", "low_hz", reshape=(-1,))
        m.raw(f"{pre}Sinc_conv.band_hz_", "encoder", "sinc", "band_hz", reshape=(-1,))
        m.sd.pop(f"{pre}Sinc_conv.n_", None)
        m.sd.pop(f"{pre}Sinc_conv.window_", None)
        m.bn(f"{pre}first_bn", "encoder", "first_bn")
        for i in range(6):
            blk = f"{pre}block{i}"
            if any(k.startswith(f"{blk}.bn1.") for k in m.sd):
                m.bn(f"{blk}.bn1", "encoder", f"block{i}", "bn1")
            m.conv(f"{blk}.conv1", "encoder", f"block{i}", "conv1")
            m.bn(f"{blk}.bn2", "encoder", f"block{i}", "bn2")
            m.conv(f"{blk}.conv2", "encoder", f"block{i}", "conv2")
            if any(k.startswith(f"{blk}.conv_downsample.") for k in m.sd):
                m.conv(f"{blk}.conv_downsample", "encoder", f"block{i}", "downsample")
            m.dense(f"{pre}fc_attention{i}", "encoder", f"fc_attention{i}")
        m.bn(f"{pre}bn_before_gru", "encoder", "bn_before_gru")
        n_gru = m.gru(f"{pre}gru", "encoder", "gru")
        m.dense(f"{pre}fc1_gru", "encoder", "fc1_gru")
        if is_fmsl:
            # Mode B (main_fmsl_standardized.py:160-174): fc1_gru output feeds
            # the FMSL system directly (no projection layer on either side).
            m.fmsl("fmsl_system", "fmsl")
        else:
            # original RawNet head is fc1_gru -> fc2_gru and adfmsl 'main'
            # matches it exactly (SPECS['main'].fc1=None since round 5 — the
            # earlier identity-filled extra fc1 was a structural drift whose
            # parameters TRAINED away from identity, caught by the train-parity
            # harness); fc2_gru maps straight onto the fc2 head
            for k in ("fc2_gru", "fc2"):
                if f"{k}.weight" in m.sd:
                    m.dense(k, "fc2")
                    break
    elif base in ("maze4", "maze5"):
        m.raw("sinc_conv.low_hz_", "sinc", "low_hz", reshape=(-1,))
        m.raw("sinc_conv.band_hz_", "sinc", "band_hz", reshape=(-1,))
        # derived constants some exports register as buffers (time axis, window)
        m.sd.pop("sinc_conv.n_", None)
        m.sd.pop("sinc_conv.window_", None)
        m.bn("first_bn", "first_bn")
        # block0 + 4 strided blocks; SE applied post-block in the reference
        m.res_block("block0", "trunk", "block0", first=True)
        m.se("se0", "trunk", "block0", "se")
        for i in range(4):
            m.res_block(f"res_blocks.{i}", "trunk", f"block{i + 1}")
            m.se(f"se_blocks.{i}", "trunk", f"block{i + 1}", "se")
        if model_name == "maze4_fmsl":
            # Mode C (maze4_fmsl_standardized.py:216-347): pooled feeds the FMSL
            # system directly (no projection layer on either side).
            m.fmsl("fmsl_system", "fmsl")
        else:
            m.dense("fc1", "fc1")
            m.dense("fc2", "fc2")
            if is_fmsl:   # maze5_fmsl Mode A: fc1 -> FMSL refiner -> fc2
                m.fmsl("fmsl_system", "fmsl")
    elif model_name in ("maze7", "maze8", "maze7_fmsl", "maze8_fmsl"):
        # maze7.py:144-217 / maze8.py:193-277 and their fmsl variants share the
        # trunk: 1x1 projection -> first BN+SELU -> block0 + 4 strided SE blocks
        m.w2v2_backbone("", arch=w2v2_arch)
        m.conv("feature_projection", "proj")
        m.bn("first_bn", "first_bn")
        m.res_block("block0", "trunk", "block0", first=True)
        m.se("se0", "trunk", "block0", "se")
        for i in range(4):
            m.res_block(f"res_blocks.{i}", "trunk", f"block{i + 1}")
            m.se(f"se_blocks.{i}", "trunk", f"block{i + 1}", "se")
        if model_name == "maze8":
            m.conv_fmsl("fmsl_layer", "conv_fmsl")
        if is_fmsl:
            # pooled 256 feeds the FMSL system directly (maze7_fmsl_standardized
            # .py:179-291); no projection layer on either side
            m.fmsl("fmsl_system", "fmsl")
        else:
            m.dense("fc1", "fc1")
            m.dense("fc2", "fc2")
    elif model_name == "maze2":
        # maze2.py:119-193: no projection; BN over the w2v2 dim, 6 SE blocks,
        # BN + plain torch TransformerEncoder at d=256
        m.w2v2_backbone("", arch=w2v2_arch)
        m.bn("first_bn", "first_bn")
        m.res_block("block0", "trunk", "block0", first=True)
        m.se("se0", "trunk", "block0", "se")
        for i in range(1, 6):
            m.res_block(f"block{i}", "trunk", f"block{i}")
            m.se(f"se{i}", "trunk", f"block{i}", "se")
        m.bn("bn_before_transformer", "bn_before_transformer")
        i = 0
        while any(k.startswith(f"transformer_encoder.layers.{i}.") for k in m.sd):
            m.torch_encoder_layer(f"transformer_encoder.layers.{i}",
                                  "transformer", f"layer{i}", d=256, heads=8)
            i += 1
        m.dense("fc1", "fc1")
        m.dense("fc2", "fc2")
    elif model_name == "maze6":
        # maze6.py:182-267: multi-level fusion projection -> BN/ReLU -> block0 +
        # 4 strided blocks -> BN + plain 4-layer transformer -> ASP -> fc1/fc2
        m.w2v2_backbone("", arch=w2v2_arch)
        m.conv("feature_projection", "proj")
        m.bn("first_bn", "first_bn")
        m.res_block("block0", "trunk", "block0", first=True)
        m.se("se0", "trunk", "block0", "se")
        for i in range(4):
            m.res_block(f"res_blocks.{i}", "trunk", f"block{i + 1}")
            m.se(f"se_blocks.{i}", "trunk", f"block{i + 1}", "se")
        m.bn("bn_before_transformer", "bn_before_transformer")
        i = 0
        while any(k.startswith(f"transformer_encoder.layers.{i}.") for k in m.sd):
            m.torch_encoder_layer(f"transformer_encoder.layers.{i}",
                                  "transformer", f"layer{i}", d=256, heads=8)
            i += 1
        m.asp("attentive_pooling", "asp")
        m.dense("fc1", "fc1")
        m.dense("fc2", "fc2")
    elif model_name == "maze6_fmsl":
        # maze6_fmsl_standardized.py:213-382: fmsl_plain blocks, ASP, FMSL at
        # 512 (2x256); the NaN-fallback 'classifier' is dropped
        m.w2v2_backbone("", arch=w2v2_arch)
        m.conv("feature_projection", "proj")
        m.bn("first_bn", "first_bn")
        m.res_block_plain("block0", "trunk", "block0", first=True)
        m.se("se0", "trunk", "block0", "se")
        for i in range(2):
            m.res_block_plain(f"res_blocks.{i}", "trunk", f"block{i + 1}")
            m.se(f"se_blocks.{i}", "trunk", f"block{i + 1}", "se")
        m.asp_conv("attentive_pooling", "asp")   # the file's Conv1d-attn ASP
        m.fmsl("fmsl_system", "fmsl")
        # the 'fallback' classifier is the checkpoint's LIVE head (the FMSL
        # logits path KeyErrors and is silently swallowed,
        # maze6_fmsl_standardized.py:345-361) — map it to fc1/fc2
        m.dense("classifier.0", "fc1")
        m.dense("classifier.3", "fc2")
        m.sd.pop("criterion.weight", None)
    elif model_name == "maze3_fmsl":
        # maze3_fmsl_standardized.py:139-256: fmsl_plain blocks (no SE), custom
        # in-proj/pos-emb transformer (:98-137), FMSL at 256
        m.w2v2_backbone("", arch=w2v2_arch)
        m.conv("feature_projection", "proj")
        m.res_block_plain("blocks.0", "trunk", "block0", first=True)
        m.res_block_plain("blocks.1", "trunk", "block1")
        m.res_block_plain("final_block", "trunk", "block2")
        m.dense("transformer.input_projection", "transformer", "in_proj")
        pe = m.take("transformer.positional_encoding")
        if pe is not None:
            m._set(m.params, ("transformer", "pos_embedding"), pe.reshape(pe.shape[-2:]))
        i = 0
        while any(k.startswith(f"transformer.transformer.layers.{i}.") for k in m.sd):
            m.torch_encoder_layer(f"transformer.transformer.layers.{i}",
                                  "transformer", f"layer{i}", d=512, heads=8)
            i += 1
        m.dense("transformer.output_projection", "transformer", "out_proj")
        m.fmsl("fmsl_system", "fmsl")
    elif model_name == "maze2_fmsl":
        # maze2_fmsl_standardized.py:394-487 under FIXED semantics. The
        # reference forward cannot run: pooled 256-d features pass through a
        # lazily-created Linear(256,512) into an FMSL system built with
        # input_dim=256 (:427-434 "Use 256 dimensions to match checkpoint" vs
        # :466-470) — an unconditional shape crash, so the lazy projection is
        # dead weight in any checkpoint. Port the checkpoint-compatible intent:
        # pooled 256 feeds the FMSL system directly (no projection layer).
        m.w2v2_backbone("", arch=w2v2_arch)
        m.conv("feature_projection", "proj")
        m.bn("first_bn", "first_bn")
        for i in range(3):   # :417-420 blocks: bias-free convs, internal SE
            m.res_block_plain(f"block{i}", "trunk", f"block{i}", first=(i == 0))
            if any(k.startswith(f"block{i}.se.") for k in m.sd):
                m.se(f"block{i}.se", "trunk", f"block{i}", "se")
        m.sd.pop("fmsl_projection.weight", None)   # the dead lazy Linear
        m.sd.pop("fmsl_projection.bias", None)
        m.fmsl("fmsl_system", "fmsl")
    elif model_name == "maze3":
        # maze3.py:101-164: projection, three maze3-variant blocks (internal SE,
        # 'shortcut' skip), MLP classifier with ReLU
        m.w2v2_backbone("", arch=w2v2_arch)
        m.conv("feature_projection", "proj")
        m.res_block("blocks.0", "trunk", "block0", first=True, skip_key="shortcut")
        m.res_block("blocks.1", "trunk", "block1", skip_key="shortcut")
        m.res_block("final_block", "trunk", "block2", skip_key="shortcut")
        m.dense("classifier.0", "fc1")
        m.dense("classifier.3", "fc2")
    else:
        raise ValueError(
            f"no torch->flax mapping for {model_name!r} (all 16 reference "
            f"models are supported; maze2_fmsl ports under fixed semantics — "
            f"its reference forward crashes on its own FMSL input-dim bug, "
            f"maze2_fmsl_standardized.py:466-470, SURVEY.md 2.3)")

    report = {"missing": list(m.missing), "unconsumed": sorted(m.sd.keys())}
    if base == "main":
        report["gru_layers"] = n_gru   # build the model with nb_gru_layer=this
    return m.params, m.stats, report


def reference_parity_experiment(model_name: str, drift: bool = True):
    """An ExperimentConfig whose forward semantics match the reference torch model
    bit-comparably (for evaluating ported checkpoints)."""
    from adfmsl.config import make_experiment

    exp = make_experiment(model_name, drift=drift)
    exp.model.architecture.sinc_formula = "reference"
    exp.model.architecture.block_semantics = "reference"
    exp.model.dtype = "float32"   # torch reference runs f32 end to end
    if model_name == "maze6_fmsl" and exp.model.fmsl is not None:
        # literal live path: the FMSL logits KeyError is swallowed and the
        # fallback classifier scores (maze6_fmsl_standardized.py:345-361)
        exp.model.fmsl.mode = "fallback"
    return exp


def merge_params(template: Dict[str, Any], ported: Dict[str, Any],
                 path: str = "") -> Dict[str, Any]:
    """Overlay ported leaves onto a freshly-initialised param tree, checking shapes.
    Leaves absent from ``ported`` keep their init values (strict=False analog)."""
    out = {}
    for k, tv in template.items():
        pv = ported.get(k) if isinstance(ported, dict) else None
        where = f"{path}/{k}"
        if isinstance(tv, dict):
            out[k] = merge_params(tv, pv or {}, where)
        elif pv is None:
            out[k] = tv
        else:
            tshape = tuple(getattr(tv, "shape", ()))
            if tuple(pv.shape) != tshape:
                raise ValueError(
                    f"shape mismatch at {where}: checkpoint {pv.shape} vs model "
                    f"{tshape}")
            out[k] = np.asarray(pv, dtype=np.float32)
    return out
