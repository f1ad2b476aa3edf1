"""RawNet2 encoder (the 'main' model's backbone).

The reference imports RawNet from the external ASVspoof-2021 baseline codebase
(``01_Baseline_Models/main.py:11`` — module absent from the repo); its topology is
reconstructed from the layer-by-layer re-drive in ``main_fmsl_standardized.py:101-157``:
SincConv -> |.| -> MaxPool(3) -> BN -> SELU -> 6 residual blocks each gated by an
FC-attention (y = sigmoid(fc(avgpool_t(x))); x = x*y + y) -> BN -> SELU -> GRU ->
last hidden state -> fc1_gru. Channel plan follows the standardized filts
[128, [128,128], [128,256]]: blocks 0-1 at 128, block 2 widens to 256, blocks 3-5 at
256 (the original RawNet2 yaml used [20,[20,20],[20,128]], model_config_RawNet.yaml).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from adfmsl.models.blocks import GRU, _BNParams, _ConvParams
from adfmsl.models.sincnet import SincConv


class _RawNetBlock(nn.Module):
    """BN -> LeakyReLU -> Conv k3 -> BN -> LeakyReLU -> Conv k3 (+1x1 skip) -> MaxPool3."""

    in_channels: int
    out_channels: int
    first: bool = False
    # Folded eval body (ops/pallas/resblock_fused.py resblock_eval_xla with
    # act='leaky', pool=3): BN stats folded to affines at trace time, bf16
    # operands, the whole block one conv-fused XLA region. Checkpoint-
    # compatible parameter twins, eval only.
    fused_eval: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):          # (B, T, C)
        # bf16 trunks only (same guard as ResBlockSE): the folded body runs
        # bf16 math, which would silently break f32 reference-parity configs.
        if self.fused_eval and not train and self.dtype == jnp.bfloat16:
            from adfmsl.ops.pallas.resblock_fused import (fold_block_params,
                                                          resblock_eval_xla)

            params, stats = {}, {}
            if not self.first:
                params["bn1"], stats["bn1"] = _BNParams(self.in_channels,
                                                        name="bn1")()
            params["conv1"] = _ConvParams(self.in_channels, self.out_channels,
                                          name="conv1")()
            params["bn2"], stats["bn2"] = _BNParams(self.out_channels,
                                                    name="bn2")()
            params["conv2"] = _ConvParams(self.out_channels, self.out_channels,
                                          name="conv2")()
            if self.in_channels != self.out_channels:
                params["downsample"] = _ConvParams(self.in_channels,
                                                   self.out_channels, k=1,
                                                   name="downsample")()
            pre, w1, b1, w2, bt, skw = fold_block_params(params, stats,
                                                         first=self.first)
            y, _ = resblock_eval_xla(x, pre, w1, b1, w2, bt, skw,
                                     act="leaky", pool=3)
            return y
        h = x
        # BN at trunk width (f32 batch stats inside flax) — the train-step
        # glue otherwise pays f32 HBM round trips the convs immediately
        # downcast (same rule as ResBlockSE 'tpu').
        if not self.first:
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name="bn1")(h)
            h = nn.leaky_relu(h, 0.3)
        h = nn.Conv(self.out_channels, (3,), padding="SAME", dtype=self.dtype,
                    name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn2")(h)
        h = nn.leaky_relu(h, 0.3)
        h = nn.Conv(self.out_channels, (3,), padding="SAME", dtype=self.dtype,
                    name="conv2")(h)
        skip = x
        if self.in_channels != self.out_channels:
            skip = nn.Conv(self.out_channels, (1,), dtype=self.dtype,
                           name="downsample")(skip)
        out = h + skip
        return nn.max_pool(out, (3,), strides=(3,))


class RawNetEncoder(nn.Module):
    """(B, T) raw audio -> (B, feature_dim) utterance embedding."""

    sinc_channels: int = 128
    sinc_kernel: int = 251
    block_channels: Sequence[int] = (128, 128, 256, 256, 256, 256)
    gru_hidden: int = 1024
    gru_layers: int = 1
    feature_dim: int = 1024
    sample_rate: int = 16000
    sinc_formula: str = "textbook"
    fused_eval_frontend: bool = False   # Pallas fused sinc+|.|+pool3 at eval (TPU)
    fused_train_frontend: bool = False  # same kernel in the train fwd (custom VJP)
    fused_eval_trunk: bool = False      # folded bf16 eval blocks (resblock_fused)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Front end: sinc conv -> |.| -> MaxPool(3) (main_fmsl_standardized.py:101-110).
        # The epilogue lives inside SincConv (post='abs_pool3'): the default
        # executor is the time-segmented NHC composition (round 4 — beats the
        # Pallas kernel at every batch); fused_eval_frontend=True opts back
        # into the kernel at batch <= 16, and fused_train_frontend=True runs
        # it in the training forward pass too, via the kernel's custom VJP
        # (backward = XLA recompute, ops/pallas/sinc_fused.py).
        h = SincConv(self.sinc_channels, self.sinc_kernel, self.sample_rate,
                     formula=self.sinc_formula, post="abs_pool3",
                     fused_eval=self.fused_eval_frontend,
                     fused_train=self.fused_train_frontend,
                     name="sinc")(x, train=train)                                    # (B, T3, C)
        if self.dtype == jnp.bfloat16:
            h = h.astype(jnp.bfloat16)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="first_bn")(h)
        h = nn.selu(h)

        cin = self.sinc_channels
        for i, cout in enumerate(self.block_channels):
            h = _RawNetBlock(cin, cout, first=(i == 0),
                             fused_eval=self.fused_eval_trunk,
                             dtype=self.dtype,
                             name=f"block{i}")(h, train=train)
            # FC attention gate (main_fmsl_standardized.py:115-119); mean in
            # f32 — a bf16 accumulator over thousands of frames is too lossy
            y = jnp.mean(h.astype(jnp.float32), axis=1)   # (B, C)
            y = nn.sigmoid(nn.Dense(cout, name=f"fc_attention{i}")(y))
            # keep the gated flow at trunk width (an f32 gate would promote
            # the whole (B, T, C) product back to double width)
            y = y.astype(h.dtype)
            h = h * y[:, None, :] + y[:, None, :]
            cin = cout

        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn_before_gru")(h)
        h = nn.selu(h)
        # only the final hidden state is consumed — skip stacking (B, T, H)
        h = GRU(self.gru_hidden, layers=self.gru_layers,
                return_sequences=False, name="gru")(h)   # (B, H)
        return nn.Dense(self.feature_dim, name="fc1_gru")(h)
