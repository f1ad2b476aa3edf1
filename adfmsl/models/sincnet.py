"""Trainable SincConv as a Flax module (front end of main/maze4/maze5).

Wraps the vectorized filter synthesis in ``adfmsl.ops.sinc`` with learnable
(low_hz, band_hz) parameters, mel-spaced init (ops.sinc.sinc_init reproduces
maze4.py:68-78). Output layout (B, T', C).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from adfmsl.ops.sinc import (sinc_conv, sinc_conv_block_gemm, sinc_conv_nhc,
                             sinc_conv_s2d, sinc_filters, sinc_init)


class SincConv(nn.Module):
    out_channels: int = 128
    kernel_size: int = 251
    sample_rate: int = 16000
    stride: int = 1
    min_low_hz: float = 50.0
    min_band_hz: float = 50.0
    formula: str = "textbook"
    impl: str = "nhc"          # channels-last lax.conv — round-3 measurement:
                               # 4.7x the block-GEMM form on v5e (ops/sinc.py);
                               # 'block_gemm' kept as the round-1/2 alternative.
                               # 's2d' (space-to-depth phase decomposition,
                               # ops/sinc.py:sinc_conv_s2d) measured 3.4x SLOWER
                               # than nhc on v5e (21.6 vs 6.4 ms/b64) — unlike
                               # the STFT, the K=251 stride-1 conv already keeps
                               # the MXU busy; kept as an opt-in negative result
    # 'abs_pool3' fuses the RawNet front end epilogue (|.| + MaxPool3). With
    # fused_eval=True the front end runs as the Pallas kernel at eval time for
    # batches <= fused_max_batch; larger batches take the NHC XLA composition,
    # which overtakes the kernel from b32 up (ops/sinc.py:sinc_abs_pool3_nhc
    # has the measured crossover table). fused_train=True additionally runs
    # the kernel in the TRAINING forward pass via its custom VJP
    # (Pallas forward, XLA-recompute backward — ops/pallas/sinc_fused.py).
    post: str = "none"
    fused_eval: bool = False
    fused_train: bool = False
    fused_max_batch: int = 16
    # 'highest' pins exact-f32 conv passes (reference-parity checkpoints on
    # TPU, where DEFAULT means 1-pass bf16); None = backend default.
    precision: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        low0, band0 = sinc_init(self.out_channels, self.sample_rate,
                                self.min_low_hz, self.min_band_hz)
        low = self.param("low_hz", lambda _: jnp.asarray(low0))
        band = self.param("band_hz", lambda _: jnp.asarray(band0))
        filt = sinc_filters(low, band, self.kernel_size, self.sample_rate,
                            self.min_low_hz, self.min_band_hz, self.formula)
        fused = self.fused_train if train else self.fused_eval
        if (self.post == "abs_pool3" and fused and self.stride == 1
                and x.shape[0] <= self.fused_max_batch):
            import jax

            from adfmsl.ops.pallas.sinc_fused import sinc_abs_pool

            # Mosaic kernels only compile on TPU; everywhere else (CPU tests,
            # virtual meshes) run the same kernel in interpret mode.
            interpret = jax.default_backend() != "tpu"
            return sinc_abs_pool(x, filt, interpret)     # (B, T3, C)
        if self.post == "abs_pool3" and self.stride == 1 and self.impl == "nhc":
            # impl selections other than the default 'nhc' fall through to the
            # generic conv + |.| + maxpool epilogue below so 'block_gemm'/'s2d'
            # stay honoured for the RawNet front end (advisor round-3).
            import jax

            from adfmsl.ops.sinc import sinc_abs_pool3_nhc

            prec = (jax.lax.Precision.HIGHEST if self.precision == "highest"
                    else None)
            return sinc_abs_pool3_nhc(x, filt, precision=prec)  # (B, T3, C)
        if self.impl in ("nhc", "s2d") and self.stride == 1:
            import jax

            prec = (jax.lax.Precision.HIGHEST if self.precision == "highest"
                    else None)
            if self.impl == "s2d":
                h = sinc_conv_s2d(x, filt, precision=prec)  # (B, T', C)
            else:
                h = sinc_conv_nhc(x, filt, precision=prec)  # (B, T', C)
        elif self.impl == "block_gemm" and self.stride == 1:
            h = jnp.transpose(sinc_conv_block_gemm(x, filt), (0, 2, 1))
        else:
            h = jnp.transpose(sinc_conv(x, filt, stride=self.stride), (0, 2, 1))
        if self.post == "abs_pool3":
            import flax.linen as _nn

            h = jnp.abs(h)
            h = _nn.max_pool(h, (3,), strides=(3,))
        return h
