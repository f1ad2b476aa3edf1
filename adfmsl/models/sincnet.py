"""Trainable SincConv as a Flax module (front end of main/maze4/maze5).

Wraps the vectorized filter synthesis in ``adfmsl.ops.sinc`` with learnable
(low_hz, band_hz) parameters, mel-spaced init (ops.sinc.sinc_init reproduces
maze4.py:68-78). Output layout (B, T', C).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from adfmsl.ops.sinc import (sinc_conv, sinc_conv_block_gemm, sinc_conv_nhc,
                             sinc_conv_nhc_seg, sinc_conv_s2d, sinc_filters,
                             sinc_init)


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
    # batches <= fused_max_batch; larger batches take the NHC XLA composition.
    # OPT-IN since round 4: the time-segmented composition (see ``segments``)
    # beats the kernel at every batch (b8 3.20 vs 3.54 ms, b16 4.23 vs 5.76),
    # so nothing enables fused_eval by default any more; the kernel remains
    # the round-2/3 artifact + the custom-VJP demo. fused_train=True
    # additionally runs the kernel in the TRAINING forward pass via its custom
    # VJP (Pallas forward, XLA-recompute backward — ops/pallas/sinc_fused.py).
    post: str = "none"
    fused_eval: bool = False
    fused_train: bool = False
    fused_max_batch: int = 16
    # 'highest' pins exact-f32 conv passes (reference-parity checkpoints on
    # TPU, where DEFAULT means 1-pass bf16); None = backend default.
    precision: str | None = None
    # Time-segmented NHC executors (ops/sinc.py:_segment_time): split T into S
    # overlapping windows stacked onto batch — exact parity, measured faster
    # at small batch where XLA's long-T conv tiling underperforms (round 4).
    # 0 = auto (measured policy in _auto_segments); 1 = never; >1 = force S.
    segments: int = 0

    def _auto_segments(self, batch: int, train: bool = False) -> int:
        """Measured round-4 policy (v5e, 64600 samples, K=251, C=128).

        Segment ONLY at small batch: isolated probes said seg2 wins at b64
        too (6.08 -> 4.57 ms fwd), but with a real conv consumer attached the
        restitch reshape costs more than the conv saves (k3-consumer probe:
        native 7.39 vs seg-r8 9.79 ms at b64) — sum-consumed micro-benchmarks
        hide layout costs. At b16 S=3 with the 8-aligned restitch the win
        survives the consumer (4.67 vs 5.39 ms fwd) — but only FORWARD: in
        the full maze4/5 b16 TRAIN step the backward's twin of the restitch
        (reshape+pad of the incoming cotangent) regressed 514 -> 466 utt/s,
        so the bare conv segments at eval only. The abs_pool3 form keeps its
        train win (restitch is post-pool, 3x smaller; main 788 -> 812)."""
        if self.segments:
            return self.segments
        if self.post != "abs_pool3" and train:
            return 1
        return 3 if batch <= 16 else 1

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

            from adfmsl.ops.sinc import (sinc_abs_pool3_nhc,
                                         sinc_abs_pool3_nhc_seg)

            prec = (jax.lax.Precision.HIGHEST if self.precision == "highest"
                    else None)
            s = self._auto_segments(x.shape[0], train)
            if s > 1:
                return sinc_abs_pool3_nhc_seg(x, filt, s, precision=prec)
            return sinc_abs_pool3_nhc(x, filt, precision=prec)  # (B, T3, C)
        if self.impl in ("nhc", "s2d") and self.stride == 1:
            import jax

            prec = (jax.lax.Precision.HIGHEST if self.precision == "highest"
                    else None)
            if self.impl == "s2d":
                h = sinc_conv_s2d(x, filt, precision=prec)  # (B, T', C)
            else:
                s = self._auto_segments(x.shape[0], train)
                if s > 1:
                    h = sinc_conv_nhc_seg(x, filt, s, precision=prec)
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
