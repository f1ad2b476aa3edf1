"""ResNet-18 on log-mel spectrograms.

BASELINE.json config #2: "Log-mel (80-bin) spectrogram + ResNet18 classifier". Standard
ResNet-18 basic-block layout (2-2-2-2) over the on-device log-mel front end, bf16
trunk on the MXU.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from adfmsl.config.base import ModelConfig
from adfmsl.models.mazes import model_registry
from adfmsl.ops.cmvn import cmvn
from adfmsl.ops.lfcc import logmel


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype, name="proj")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name="proj_bn")(x)
        return nn.relu(h + x)


class ResNet18(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, labels=None, train: bool = False, mask=None):
        fe = self.cfg.frontend
        feats = logmel(x, self.cfg.architecture.sample_rate, fe.n_fft, fe.hop_length,
                       fe.win_length, fe.n_mels, fe.fmin, fe.fmax, fe.log_eps,
                       precision=fe.dsp_precision, fused_power=fe.fused_power)
        if fe.cmvn:
            feats = cmvn(feats)
        # the DSP front end is parameterless: its VJP can only feed d/d(audio),
        # which no caller uses — cut it so the backward never retraverses the
        # DFT pipeline (round-3 train-throughput fix, VERDICT #9)
        feats = jax.lax.stop_gradient(feats)
        h = feats[..., None]
        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32

        h = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=dtype, name="stem")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=dtype, name="stem_bn")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")

        for i, (ch, n_blocks) in enumerate([(64, 2), (128, 2), (256, 2), (512, 2)]):
            for j in range(n_blocks):
                stride = 2 if (j == 0 and i > 0) else 1
                h = BasicBlock(ch, stride, dtype=dtype,
                               name=f"layer{i}_{j}")(h, train=train)

        h = jnp.mean(h, axis=(1, 2)).astype(jnp.float32)
        logits = nn.Dense(self.cfg.architecture.nb_classes, name="fc")(h)
        return {
            "logits": logits,
            "scores": jax.nn.log_softmax(logits, axis=-1)[:, 1],
            "features": h,
        }


model_registry.register("resnet18_logmel", lambda cfg: ResNet18(cfg=cfg))
