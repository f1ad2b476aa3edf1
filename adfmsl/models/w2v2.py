"""Wav2Vec2 encoder, implemented natively in Flax.

The reference wraps HF's torch Wav2Vec2 and round-trips every batch through the CPU
processor (maze2.py:85-117 — the signature inefficiency SURVEY.md 3.1 flags). Here the
whole front end is a Flax module that runs under jit on device: zero-mean/unit-var
normalisation (the processor's only numeric effect for this model family), conv
feature extractor, feature projection, convolutional positional embedding, transformer
encoder with optional multi-layer taps (maze6.py:103-165 fusion) and partial
freezing handled at the optimizer level (adfmsl.train.optim).

Weight porting: ``port_hf_state_dict`` maps a HF torch state_dict (from a LOCAL
checkpoint file — this environment has no network egress) onto this module's params.
Architecture follows the public wav2vec2 description (base: 7 conv layers, 512 ch,
strides 5/2/2/2/2/2/2, kernels 10/3/3/3/3/2/2, group-norm on layer 0, post-LN
transformer; 'stable layer norm' variant supported for lv60-style checkpoints).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class W2V2Arch:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    feat_extract_norm: str = "group"     # 'group' (base) | 'layer' (large-lv60/xlsr)
    do_stable_layer_norm: bool = False   # True for lv60-style checkpoints
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5

    @staticmethod
    def base() -> "W2V2Arch":
        return W2V2Arch()

    @staticmethod
    def large_960h() -> "W2V2Arch":
        return W2V2Arch(hidden_size=1024, num_layers=24, num_heads=16,
                        intermediate_size=4096)

    @staticmethod
    def tiny(num_heads: int = 2) -> "W2V2Arch":
        """For tests: 2 conv layers, 2 transformer layers. ``num_heads=4``
        ('tiny4') keeps the same sizes but is 4-way head-shardable — used by
        the driver's 2dp x 4tp dry-run phase (__graft_entry__)."""
        return W2V2Arch(hidden_size=64, num_layers=2, num_heads=num_heads,
                        intermediate_size=128, conv_dim=(32, 32),
                        conv_kernel=(10, 3), conv_stride=(5, 2))


class _ConvLayer(nn.Module):
    arch: W2V2Arch
    index: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):                                  # (B, T, C)
        a = self.arch
        x = nn.Conv(a.conv_dim[self.index], (a.conv_kernel[self.index],),
                    strides=(a.conv_stride[self.index],), padding="VALID",
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        if a.feat_extract_norm == "group" and self.index == 0:
            x = nn.GroupNorm(num_groups=a.conv_dim[0], epsilon=a.layer_norm_eps,
                             name="group_norm")(x)
        elif a.feat_extract_norm == "layer":
            x = nn.LayerNorm(epsilon=a.layer_norm_eps, name="layer_norm")(x)
        return nn.gelu(x, approximate=False)


class _FeatureExtractor(nn.Module):
    arch: W2V2Arch
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):                                  # (B, T) raw audio
        h = x[:, :, None]
        for i in range(len(self.arch.conv_dim)):
            h = _ConvLayer(self.arch, i, dtype=self.dtype, name=f"conv_layers_{i}")(h)
        return h                                            # (B, T', conv_dim[-1])


class _PositionalConvEmbedding(nn.Module):
    arch: W2V2Arch
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):                                  # (B, T, H)
        a = self.arch
        k = a.num_conv_pos_embeddings
        # HF pads SAME then trims one step when k is even
        h = nn.Conv(a.hidden_size, (k,), padding=[(k // 2, k // 2)],
                    feature_group_count=a.num_conv_pos_embedding_groups,
                    dtype=self.dtype, name="conv")(x)
        if k % 2 == 0:
            h = h[:, :-1, :]
        return nn.gelu(h, approximate=False)


class _EncoderLayer(nn.Module):
    arch: W2V2Arch
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = self.arch
        pre = a.do_stable_layer_norm
        h = nn.LayerNorm(epsilon=a.layer_norm_eps, name="layer_norm")(x) if pre else x
        attn = nn.MultiHeadDotProductAttention(
            num_heads=a.num_heads, dtype=self.dtype, dropout_rate=self.dropout_rate,
            deterministic=not train, name="attention")(h, h)
        x = x + attn
        if not pre:
            x = nn.LayerNorm(epsilon=a.layer_norm_eps, name="layer_norm")(x)
        h = nn.LayerNorm(epsilon=a.layer_norm_eps, name="final_layer_norm")(x) if pre else x
        h = nn.Dense(a.intermediate_size, dtype=self.dtype, name="intermediate_dense")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(a.hidden_size, dtype=self.dtype, name="output_dense")(h)
        x = x + h
        if not pre:
            x = nn.LayerNorm(epsilon=a.layer_norm_eps, name="final_layer_norm")(x)
        return x


class Wav2Vec2Encoder(nn.Module):
    """Raw waveform (B, T) -> last hidden state (B, T', H), optionally all layer taps.

    ``normalize_input=True`` applies the Wav2Vec2Processor's per-utterance
    zero-mean/unit-variance normalisation on device (replacing the reference's
    GPU->CPU numpy round trip, maze2.py:100-115).
    """

    arch: W2V2Arch = field(default_factory=W2V2Arch.base)
    normalize_input: bool = True
    dropout_rate: float = 0.0
    # jax.checkpoint each transformer layer: activations are recomputed in the
    # backward pass so training peak memory scales with ONE layer instead of
    # num_layers — the lever that fits w2v2-large fine-tuning at larger batch
    # on a single chip (param trees are unchanged; ports stay compatible).
    remat_layers: bool = False
    # jax.checkpoint the whole conv feature extractor: its pyramid of
    # (B, T_i, 512) activations (846 MB at layer0 for large/b64/4 s) is what
    # OOMed batch 64 even with per-layer encoder remat (round-3 PERF ladder);
    # saving only the raw waveform trades one extractor recompute for ~1.6 GB
    # of saved residuals.
    remat_extractor: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 output_hidden_states: bool = False):
        a = self.arch
        if self.normalize_input:
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            x = (x - mean) / jnp.sqrt(var + 1e-7)

        fe_cls = (nn.remat(_FeatureExtractor) if self.remat_extractor
                  else _FeatureExtractor)
        h = fe_cls(a, dtype=self.dtype, name="feature_extractor")(x)
        h = nn.LayerNorm(epsilon=a.layer_norm_eps, name="feature_projection_norm")(h)
        h = nn.Dense(a.hidden_size, dtype=self.dtype, name="feature_projection")(h)

        pos = _PositionalConvEmbedding(a, dtype=self.dtype, name="pos_conv_embed")(h)
        h = h + pos
        if not a.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=a.layer_norm_eps, name="encoder_layer_norm")(h)

        hidden_states = [h]
        # static_argnums=(2,): 'train' (0 = module, 1 = h) must stay a Python
        # bool inside the checkpointed fn (dropout branches on it)
        layer_cls = (nn.remat(_EncoderLayer, static_argnums=(2,))
                     if self.remat_layers else _EncoderLayer)
        for i in range(a.num_layers):
            h = layer_cls(a, self.dropout_rate, dtype=self.dtype,
                          name=f"layers_{i}")(h, train)
            hidden_states.append(h)
        if a.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=a.layer_norm_eps, name="encoder_layer_norm")(h)
            hidden_states[-1] = h
        if output_hidden_states:
            return h, hidden_states
        return h


# ---------------------------------------------------------------------------------
# HF torch checkpoint porting
# ---------------------------------------------------------------------------------

def _t(x):
    return np.ascontiguousarray(np.asarray(x))


def port_hf_state_dict(sd: dict, arch: W2V2Arch) -> dict:
    """Map a HF torch Wav2Vec2Model state_dict (numpy-convertible values, keys under
    'feature_extractor'/'feature_projection'/'encoder') to this module's param tree."""
    sd = { (k[len("wav2vec2."):] if k.startswith("wav2vec2.") else k): v
           for k, v in sd.items() }
    p: dict = {}

    fe: dict = {}
    for i in range(len(arch.conv_dim)):
        layer: dict = {
            "conv": {"kernel": _t(sd[f"feature_extractor.conv_layers.{i}.conv.weight"]).transpose(2, 1, 0)}
        }
        if arch.feat_extract_norm == "group" and i == 0:
            layer["group_norm"] = {
                "scale": _t(sd["feature_extractor.conv_layers.0.layer_norm.weight"]),
                "bias": _t(sd["feature_extractor.conv_layers.0.layer_norm.bias"]),
            }
        elif arch.feat_extract_norm == "layer":
            layer["layer_norm"] = {
                "scale": _t(sd[f"feature_extractor.conv_layers.{i}.layer_norm.weight"]),
                "bias": _t(sd[f"feature_extractor.conv_layers.{i}.layer_norm.bias"]),
            }
        fe[f"conv_layers_{i}"] = layer
    p["feature_extractor"] = fe

    p["feature_projection_norm"] = {
        "scale": _t(sd["feature_projection.layer_norm.weight"]),
        "bias": _t(sd["feature_projection.layer_norm.bias"]),
    }
    p["feature_projection"] = {
        "kernel": _t(sd["feature_projection.projection.weight"]).T,
        "bias": _t(sd["feature_projection.projection.bias"]),
    }

    # positional conv: HF stores weight-norm (weight_g, weight_v) or plain weight
    base = "encoder.pos_conv_embed.conv"
    if f"{base}.weight_g" in sd or f"{base}.parametrizations.weight.original0" in sd:
        gk = f"{base}.weight_g" if f"{base}.weight_g" in sd else f"{base}.parametrizations.weight.original0"
        vk = f"{base}.weight_v" if f"{base}.weight_v" in sd else f"{base}.parametrizations.weight.original1"
        g, v = _t(sd[gk]), _t(sd[vk])            # torch weight_norm dim=2: g (1,1,K)
        norm = np.sqrt((v * v).sum(axis=(0, 1), keepdims=True))
        w = v * (g.reshape(1, 1, -1) / np.maximum(norm, 1e-12))
    else:
        w = _t(sd[f"{base}.weight"])
    p["pos_conv_embed"] = {
        "conv": {"kernel": w.transpose(2, 1, 0), "bias": _t(sd[f"{base}.bias"])}
    }

    p["encoder_layer_norm"] = {
        "scale": _t(sd["encoder.layer_norm.weight"]),
        "bias": _t(sd["encoder.layer_norm.bias"]),
    }

    H, nH = arch.hidden_size, arch.num_heads
    hd = H // nH
    for i in range(arch.num_layers):
        e = f"encoder.layers.{i}"
        def qkv(name):
            wq = _t(sd[f"{e}.attention.{name}.weight"]).T.reshape(H, nH, hd)
            bq = _t(sd[f"{e}.attention.{name}.bias"]).reshape(nH, hd)
            return {"kernel": wq, "bias": bq}
        p[f"layers_{i}"] = {
            "attention": {
                "query": qkv("q_proj"), "key": qkv("k_proj"), "value": qkv("v_proj"),
                "out": {
                    "kernel": _t(sd[f"{e}.attention.out_proj.weight"]).T.reshape(nH, hd, H),
                    "bias": _t(sd[f"{e}.attention.out_proj.bias"]),
                },
            },
            "layer_norm": {
                "scale": _t(sd[f"{e}.layer_norm.weight"]),
                "bias": _t(sd[f"{e}.layer_norm.bias"]),
            },
            "intermediate_dense": {
                "kernel": _t(sd[f"{e}.feed_forward.intermediate_dense.weight"]).T,
                "bias": _t(sd[f"{e}.feed_forward.intermediate_dense.bias"]),
            },
            "output_dense": {
                "kernel": _t(sd[f"{e}.feed_forward.output_dense.weight"]).T,
                "bias": _t(sd[f"{e}.feed_forward.output_dense.bias"]),
            },
            "final_layer_norm": {
                "scale": _t(sd[f"{e}.final_layer_norm.weight"]),
                "bias": _t(sd[f"{e}.final_layer_norm.bias"]),
            },
        }
    return p


def load_pretrained(path: str, arch: W2V2Arch) -> dict:
    """Load a local HF checkpoint (.safetensors / torch .bin / .pt) -> param tree."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = {k: v.numpy() for k, v in torch.load(path, map_location="cpu",
                                                  weights_only=True).items()}
    return port_hf_state_dict(sd, arch)
