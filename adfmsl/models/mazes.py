"""The maze model zoo: one composable architecture, 16+ registry entries.

The reference ships 16 standalone files each re-assembling the same parts (SURVEY.md
2.4). Here a single ``MazeModel`` composes: front end (SincConv / Wav2Vec2 /
RawNet encoder) -> optional 1x1 projection -> SpecAugment -> SE-residual trunk ->
optional Transformer -> pooling (avg / attentive-stats) -> classifier or FMSL head.
Per-maze wiring lives in declarative ``MazeSpec`` entries citing the reference file
each reproduces.

Output contract (all models): dict with
  'logits'  (B, 2) raw logits,
  'scores'  (B,)   the per-utterance CM score EXACTLY as the reference's eval writes it
                   (log-softmax[:,1] for LogSoftmax models — maze2.py:333-343 —
                   or raw logit[:,1] for maze6-style raw-logit models),
  'features'(B, D) pooled embedding,
  'loss'    scalar, present when the model computes its own loss (FMSL modes B/C)
            and labels were given.
Canonical label polarity: bonafide=1, spoof=0.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from adfmsl.config.base import FMSLConfig, ModelConfig
from adfmsl.heads.fmsl import FMSLHead
from adfmsl.models.blocks import (
    AttentiveStatsPooling,
    ConvFMSLLayer,
    PlainTransformerEncoder,
    ResStack,
    TransformerEncoderStack,
)
from adfmsl.models.rawnet import RawNetEncoder
from adfmsl.models.sincnet import SincConv
from adfmsl.models.w2v2 import W2V2Arch, Wav2Vec2Encoder
from adfmsl.ops.specaugment import spec_augment
from adfmsl.utils.registry import Registry

model_registry = Registry("model")


@dataclass(frozen=True)
class MazeSpec:
    name: str
    frontend: str                                   # 'sinc' | 'w2v2' | 'rawnet'
    ref: str = ""                                   # reference file reproduced
    proj_dim: Optional[int] = None                  # 1x1 conv after front end
    first_bn_act: Optional[str] = None              # 'selu' | 'relu' after front end
    blocks: Tuple[Tuple[int, int, int], ...] = ()   # (cin, cout, stride)
    transformer: Optional[Tuple[int, int, int, int]] = None   # (d, heads, layers, ff)
    # True: torch-style nn.TransformerEncoder at the trunk dim with a BN in
    # front, no in/out projection or positional embedding (maze2/maze6).
    # False: the custom in-proj + learned-pos-emb encoder
    # (maze3_fmsl_standardized.py:98-137).
    transformer_plain: bool = False
    conv_fmsl: bool = False                         # maze8's old conv FMSL layer
    pooling: str = "avg"                            # 'avg' | 'asp'
    fc1: Optional[int] = 1024
    fc1_act: Optional[str] = None                   # 'relu' between fc1 and dropout (maze3)
    score: str = "log_softmax"                      # 'log_softmax' | 'logit'
    fmsl_input_dim: int = 512                       # Dense before FMSLHead
    fusion_layers: Optional[Tuple[int, ...]] = None # maze6 w2v2 taps
    # Structural block variant used when architecture.block_semantics='reference'
    # (maze3's file-local Residual_Block_SE differs from maze4's — SURVEY 2.2).
    block_variant: Optional[str] = None
    use_se: bool = True                             # maze3_fmsl's blocks have no SE
    asp_std: bool = True    # maze6_fmsl's ASP concatenates raw VARIANCE (:189-211)


def _pooled_dim(spec: MazeSpec, trunk_dim: int) -> int:
    return 2 * trunk_dim if spec.pooling == "asp" else trunk_dim


class MazeModel(nn.Module):
    spec: MazeSpec
    cfg: ModelConfig

    def _w2v2_arch(self) -> W2V2Arch:
        w = self.cfg.wav2vec2
        if w.model_name == "tiny":
            return W2V2Arch.tiny()
        if w.model_name == "tiny4":            # 4-way head-shardable test arch
            return W2V2Arch.tiny(num_heads=4)
        if w.output_dim >= 1024:
            return W2V2Arch.large_960h()
        return W2V2Arch.base()

    @nn.compact
    def __call__(self, x: jnp.ndarray, labels: Optional[jnp.ndarray] = None,
                 train: bool = False, mask: Optional[jnp.ndarray] = None):
        spec, cfg = self.spec, self.cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        out = {}

        # ---- front end -> (B, T, C) or (B, D) for rawnet -------------------------
        if spec.frontend == "rawnet":
            feats = RawNetEncoder(sinc_channels=cfg.architecture.filts[0],
                                  sinc_kernel=cfg.architecture.first_conv,
                                  feature_dim=cfg.architecture.nb_fc_node,
                                  gru_layers=cfg.architecture.nb_gru_layer,
                                  sinc_formula=cfg.architecture.sinc_formula,
                                  fused_eval_frontend=cfg.extra.get(
                                      "fused_eval_frontend", False),
                                  fused_train_frontend=cfg.extra.get(
                                      "fused_train_frontend", False),
                                  fused_eval_trunk=cfg.extra.get(
                                      "fused_eval_trunk", False),
                                  dtype=dtype, name="encoder")(x, train=train)
            pooled = feats
        else:
            if spec.frontend == "sinc":
                h = SincConv(cfg.architecture.filts[0], cfg.architecture.first_conv,
                             cfg.architecture.sample_rate,
                             formula=cfg.architecture.sinc_formula,
                             # f32 parity checkpoints need exact conv passes on
                             # TPU (DEFAULT = 1-pass bf16 there)
                             precision=("highest" if cfg.dtype == "float32"
                                        else None),
                             name="sinc")(x, train=train)
            elif spec.frontend == "w2v2":
                enc = Wav2Vec2Encoder(arch=self._w2v2_arch(), dtype=dtype,
                                      remat_layers=cfg.wav2vec2.remat_layers,
                                      remat_extractor=cfg.wav2vec2.remat_extractor,
                                      name="wav2vec2")
                if spec.fusion_layers:
                    _, hs = enc(x, train=train, output_hidden_states=True)
                    taps = [hs[min(i, len(hs) - 1)] for i in spec.fusion_layers]
                    h = jnp.concatenate(taps, axis=-1)     # (B, T, n_taps*H)
                else:
                    h = enc(x, train=train)
                if cfg.wav2vec2.freeze:
                    h = jax.lax.stop_gradient(h)
            else:
                raise ValueError(f"unknown frontend {spec.frontend!r}")

            if spec.proj_dim:
                h = nn.Conv(spec.proj_dim, (1,), dtype=dtype, name="proj")(h)
            if spec.first_bn_act:
                # Keep the front-end glue at trunk width (train AND eval): the
                # f32 BN+SELU over (B, T, C) is otherwise a full HBM round trip
                # at double width before the trunk casts down — BN batch stats
                # stay f32 inside flax; only the normalize output narrows.
                if dtype == jnp.bfloat16:
                    h = h.astype(jnp.bfloat16)
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 dtype=dtype, name="first_bn")(h)
                h = nn.selu(h) if spec.first_bn_act == "selu" else nn.relu(h)

            if cfg.spec_augment.enabled and train:
                sa = cfg.spec_augment
                key = self.make_rng("specaugment")
                # features are (B, T, C): C is the freq/channel axis; the
                # channels_last path draws bit-identical masks without the two
                # full-tensor transposes (+ their backward twins)
                h = spec_augment(h, key, sa.freq_mask_param, sa.time_mask_param,
                                 sa.n_freq_masks, sa.n_time_masks, sa.semantics,
                                 channels_last=True)

            if spec.conv_fmsl:
                h = ConvFMSLLayer(h.shape[-1], name="conv_fmsl")(h, train=train)

            if spec.blocks:
                semantics = cfg.architecture.block_semantics
                if semantics == "reference" and spec.block_variant:
                    semantics = spec.block_variant
                h = ResStack(spec.blocks, cfg.architecture.dropout_rate,
                             semantics=semantics, use_se=spec.use_se,
                             fused_eval=cfg.extra.get("fused_eval_trunk",
                                                      False),
                             dtype=dtype, name="trunk")(h, train=train)

            if spec.transformer:
                d, heads, layers, ff = spec.transformer
                if spec.transformer_plain:
                    # maze2.py:158-166 / maze6.py:235-241: BN then a torch-style
                    # encoder straight at the trunk dim
                    h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                     name="bn_before_transformer")(h)
                    h = PlainTransformerEncoder(
                        d_model=d, n_heads=heads, n_layers=layers, d_ff=ff,
                        dropout_rate=cfg.architecture.transformer_dropout,
                        dtype=dtype, name="transformer")(h, train=train)
                else:
                    h = TransformerEncoderStack(
                        in_dim=h.shape[-1], d_model=d, n_heads=heads,
                        n_layers=layers, d_ff=ff, out_dim=h.shape[-1],
                        dropout_rate=cfg.architecture.transformer_dropout,
                        dtype=dtype, name="transformer")(h, train=train)

            if spec.pooling == "asp":
                pooled = AttentiveStatsPooling(h.shape[-1], use_std=spec.asp_std,
                                               name="asp")(h)
            else:
                pooled = jnp.mean(h, axis=1)
            pooled = pooled.astype(jnp.float32)

        # ---- head ----------------------------------------------------------------
        fmsl_cfg = cfg.fmsl
        if fmsl_cfg is None:
            feats = pooled
            if spec.fc1:
                feats = nn.Dense(spec.fc1, name="fc1")(pooled)
                if spec.fc1_act == "relu":   # maze3 classifier (maze3.py:137-142)
                    feats = nn.relu(feats)
                feats = nn.Dropout(cfg.architecture.fc_dropout,
                                   deterministic=not train)(feats)
            logits = nn.Dense(cfg.architecture.nb_classes, name="fc2")(feats)
            out["features"] = feats
        elif fmsl_cfg.mode == "refine":
            # Mode A (maze5_fmsl_standardized.py:297-336): pooled -> fc1 -> dropout
            # -> FMSL refiner (input dim = nb_fc_node) -> normalized embeddings ->
            # fc2; loss stays external. Matches the reference layer order so
            # ported checkpoints evaluate bit-comparably.
            fdim = spec.fc1 or cfg.architecture.nb_fc_node
            h2 = nn.Dense(fdim, name="fc1")(pooled)
            h2 = nn.Dropout(cfg.architecture.fc_dropout,
                            deterministic=not train)(h2)
            head = FMSLHead(fmsl_cfg, input_dim=fdim, name="fmsl")
            fout = head(h2, labels=labels, train=train, mask=mask)
            out["features"] = fout["embeddings"]
            out["prototype_similarity"] = fout["prototype_similarity"]
            logits = nn.Dense(cfg.architecture.nb_classes, name="fc2")(
                fout["embeddings"])
        elif fmsl_cfg.mode == "fallback":
            # The literal maze6_fmsl LIVE path (maze6_fmsl_standardized.py:345-361,
            # literal-oracle finding): use_integrated_loss=False means the FMSL
            # forward has no 'logits'; the try/except silently switches to the
            # fallback classifier, so the trained checkpoint scores through
            # fc1/ReLU/Dropout/fc2 and the FMSL system is dead weight (no
            # gradient ever reaches it through the loss). Reproduced exactly for
            # ported-checkpoint parity; the fixed default for maze6_fmsl stays
            # 'replace' (config/standardized.py FMSL_MODES).
            # the reference feeds the pooled trunk straight into the FMSL
            # system (fmsl_input_dim == pooled dim for every assembly) — an
            # inserted projection Dense would be a trainable structural drift
            # (same class as the removed 'main' fc1; round-5 parity harness)
            fdim = spec.fmsl_input_dim
            assert pooled.shape[-1] == fdim, (pooled.shape, fdim)
            head = FMSLHead(fmsl_cfg, input_dim=fdim, name="fmsl")
            fout = head(pooled, labels=labels, train=train, mask=mask)
            out["features"] = fout["embeddings"]
            out["prototype_similarity"] = fout["prototype_similarity"]
            h2 = nn.Dense(spec.fc1, name="fc1")(pooled)
            h2 = nn.relu(h2)
            h2 = nn.Dropout(cfg.architecture.fc_dropout,
                            deterministic=not train)(h2)
            logits = nn.Dense(cfg.architecture.nb_classes, name="fc2")(h2)
        else:
            # Modes B/C: pooled trunk -> FMSL system directly (see the
            # fallback branch's drift note)
            fdim = spec.fmsl_input_dim
            assert pooled.shape[-1] == fdim, (pooled.shape, fdim)
            head = FMSLHead(fmsl_cfg, input_dim=fdim, name="fmsl")
            fout = head(pooled, labels=labels, train=train, mask=mask)
            out["features"] = fout["embeddings"]
            out["prototype_similarity"] = fout["prototype_similarity"]
            logits = fout["logits"]
            if labels is not None:
                out["loss"] = (fout["loss"] if fmsl_cfg.mode == "integrated"
                               else fout["ce_loss"])

        out["logits"] = logits
        if spec.score == "log_softmax":
            out["scores"] = jax.nn.log_softmax(logits, axis=-1)[:, 1]
        else:
            out["scores"] = logits[:, 1]
        return out


# -------------------------------------------------------------------------------
# Registry entries (block plans follow the reference assemblies, SURVEY.md 2.4)
# -------------------------------------------------------------------------------

_SINC_BLOCKS = ((128, 128, 1), (128, 128, 2), (128, 128, 2), (128, 128, 2),
                (128, 256, 2))                       # maze4.py:192-210
# maze2.py:143-155: block0 (w2v2_dim->128, s1) then 5 strided blocks following
# filts [128,[128,128],[128,256]] pair-walk, ending 256->256
_W2V2_BLOCKS_MAZE2 = ((768, 128, 1), (128, 128, 2), (128, 128, 2), (128, 128, 2),
                      (128, 256, 2), (256, 256, 2))
# maze6.py:213-231: block0 (projected 1024 -> 128) + the maze4-style strided walk
_W2V2_BLOCKS_MAZE6 = ((1024, 128, 1), (128, 128, 2), (128, 128, 2), (128, 128, 2),
                      (128, 256, 2))
# maze3.py:118-132: three blocks, each with its built-in stride-2 overlap pool
_W2V2_BLOCKS_MAZE3 = ((128, 128, 2), (128, 128, 2), (128, 256, 2))

SPECS = {
    # fc1=None: the literal RawNet head is fc1_gru -> fc2_gru with nothing in
    # between (test_port.TRawNet; main_fmsl_standardized.py:101-157) — the
    # generic fc1 stage would be a trainable structural drift here
    "main": MazeSpec("main", "rawnet", ref="01_Baseline_Models/main.py:182",
                     score="log_softmax", fc1=None),
    "maze2": MazeSpec("maze2", "w2v2", ref="maze2.py:119-193",
                      blocks=_W2V2_BLOCKS_MAZE2,
                      transformer=(256, 8, 6, 2048), transformer_plain=True,
                      first_bn_act="selu", fc1=1024, block_variant="maze2"),
    # classifier = Linear(256, nb_fc_node=1024) -> ReLU -> Dropout -> Linear
    # (maze3.py:137-143 with the :994 runtime config — literal-oracle check)
    "maze3": MazeSpec("maze3", "w2v2", ref="maze3.py:101-164", proj_dim=128,
                      blocks=_W2V2_BLOCKS_MAZE3, fc1=1024, fc1_act="relu",
                      score="logit", block_variant="maze3"),
    "maze4": MazeSpec("maze4", "sinc", ref="maze4.py:165-247",
                      first_bn_act="selu", blocks=_SINC_BLOCKS, fc1=1024),
    "maze5": MazeSpec("maze5", "sinc", ref="maze5.py:178-264",
                      first_bn_act="selu", blocks=_SINC_BLOCKS, fc1=1024),
    "maze6": MazeSpec("maze6", "w2v2", ref="maze6.py:182-267", proj_dim=1024,
                      first_bn_act="relu", blocks=_W2V2_BLOCKS_MAZE6,
                      transformer=(256, 8, 4, 2048), transformer_plain=True,
                      pooling="asp", fc1=1024, score="logit",
                      fusion_layers=(0, 6, 12, 18, 24)),
    "maze7": MazeSpec("maze7", "w2v2", ref="maze7.py:144-217", proj_dim=128,
                      first_bn_act="selu", blocks=_SINC_BLOCKS, fc1=1024),
    "maze8": MazeSpec("maze8", "w2v2", ref="maze8.py:193-277", proj_dim=128,
                      first_bn_act="selu", blocks=_SINC_BLOCKS, conv_fmsl=True,
                      fc1=1024),
}

_FMSL_DIMS = {
    # fmsl head input dims per reference wiring (SURVEY.md 2.4)
    "main": 1024,     # fc1_gru output (main_fmsl_standardized.py:160)
    "maze2": 256,     # checkpoint dim; overridden spec below documents the fix
    "maze3": 256,     # maze3_fmsl_standardized.py:139-256
    "maze4": 256,     # maze4_fmsl_standardized.py:216-347 (pooled trunk dim)
    "maze5": 256,     # unused: refine mode takes fc1's dim (maze5_fmsl_standardized.py:297-336)
    "maze6": 512,     # ASP 2x256 (maze6_fmsl_standardized.py:286-288)
    "maze7": 256,
    "maze8": 256,
}

# Mode B/C eval files carry RAW logits[:,1] (maze2_fmsl_standardized.py:603);
# only Mode A (maze5_fmsl, which keeps the original LogSoftmax head) stays
# log-softmax.
_FMSL_SCORE = {base: ("log_softmax" if base == "maze5" else "logit")
               for base in SPECS}

for base, s in list(SPECS.items()):
    SPECS[f"{base}_fmsl"] = MazeSpec(
        f"{base}_fmsl", s.frontend, ref=s.ref + " + fmsl_advanced.py:103-359",
        proj_dim=s.proj_dim, first_bn_act=s.first_bn_act, blocks=s.blocks,
        transformer=s.transformer, transformer_plain=s.transformer_plain,
        conv_fmsl=False, pooling=s.pooling, fc1=s.fc1, fc1_act=s.fc1_act,
        score=_FMSL_SCORE[base], fmsl_input_dim=_FMSL_DIMS[base],
        fusion_layers=s.fusion_layers)

# maze4/7/8_fmsl_standardized.py:112-162 ship a DIFFERENT file-local block than
# their baselines (caught by the literal-reference oracle): dropout after conv2
# and the stride handled by pooling + adaptive-resampling the SKIP only, so the
# trunk never downsamples under reference semantics.
for _n in ("maze4_fmsl", "maze7_fmsl", "maze8_fmsl"):
    SPECS[_n] = dataclasses.replace(SPECS[_n], block_variant="fmsl_adaptive")

# The FMSL-standardized files re-assemble their OWN (smaller) trunks rather than
# reusing the baseline's — override where they differ (SURVEY.md 2.4).
SPECS["maze2_fmsl"] = MazeSpec(
    "maze2_fmsl", "w2v2", ref="maze2_fmsl_standardized.py:394-487",
    proj_dim=128, first_bn_act="selu",
    blocks=((128, 128, 1), (128, 128, 2), (128, 256, 1)),
    # FMSL at the pooled trunk dim, per the reference's stated checkpoint
    # contract ("Use 256 dimensions to match checkpoint", :427-434). The file's
    # forward instead lazily creates a Linear(256,512) whose output feeds the
    # 256-d FMSL projection — an unconditional shape crash (:466-470, SURVEY.md
    # 2.3); the fixed semantics drop that dead projection.
    fc1=1024, score="logit", fmsl_input_dim=256,
    block_variant="fmsl_se")   # :50-92 block: internal SE, pre-add
SPECS["maze3_fmsl"] = MazeSpec(
    "maze3_fmsl", "w2v2", ref="maze3_fmsl_standardized.py:139-256",
    proj_dim=128,
    blocks=((128, 128, 1), (128, 128, 1), (128, 256, 1)),
    transformer=(512, 8, 6, 2048),   # custom in-proj/pos-emb encoder (:98-137)
    fc1=256, score="logit", fmsl_input_dim=256,
    block_variant="fmsl_plain", use_se=False)   # :48-94 blocks carry no SE
SPECS["maze6_fmsl"] = MazeSpec(
    "maze6_fmsl", "w2v2", ref="maze6_fmsl_standardized.py:213-382",
    proj_dim=128, first_bn_act="selu",
    blocks=((128, 128, 1), (128, 128, 2), (128, 256, 2)),
    # fc1=1024: the fallback classifier Linear(512,1024)/ReLU/Dropout/Linear
    # (:310-317) — the checkpoint's LIVE head (see 'fallback' mode); the ASP
    # variant concatenates raw variance (:189-211)
    pooling="asp", fc1=1024, fc1_act="relu", score="logit", fmsl_input_dim=512,
    fusion_layers=(0, 6, 12, 18, 24), block_variant="fmsl_plain",
    asp_std=False)

for _name, _spec in SPECS.items():
    model_registry.register(_name, (lambda sp: lambda cfg: MazeModel(spec=sp, cfg=cfg))(_spec))


def build_model(cfg: ModelConfig) -> nn.Module:
    """Build any registry model from its ModelConfig."""
    return model_registry.get(cfg.name)(cfg)
