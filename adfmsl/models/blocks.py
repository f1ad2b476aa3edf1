"""Shared Flax building blocks for the maze model zoo.

Re-designs of the blocks the reference copy-pastes into every model file (SURVEY.md
2.2), in JAX's (B, T, C) channels-last layout so convs lower directly to MXU-friendly
XLA convolutions:
- SEBlock           <- maze4.py:149-163 (AdaptiveAvgPool1d -> FC r=16 -> sigmoid)
- ResBlockSE        <- maze4.py:105-147 (pre-act BN/ReLU/Conv1d k3 x2, 1x1 downsample,
                       AvgPool stride) with optional internal SE (maze3.py:206-263)
- AttentiveStatsPooling <- maze6.py:167-180 (MLP attention -> mean || std, 2C out)
- TransformerEncoderStack <- maze3_fmsl_standardized.py:98-137 (in-proj, learned pos
                       embedding (max 1000), torch-style post-LN encoder, out-proj)
- ConvFMSLLayer     <- maze8.py:76-131 (the old conv "FMSL": freq-modulation conv,
                       spectral-enhancement conv, channel attention, residual)
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from adfmsl.ops.dropout import RDropout


class SEBlock(nn.Module):
    """Squeeze-excitation over the time axis; reduction 16 (maze4.py:149-163).

    ``pooled`` supplies the (B, C) time-mean directly (the fused eval trunk
    kernel accumulates it in-pass); with ``x=None`` the (B, C) gate itself is
    returned so the caller can apply it. Parameter structure is identical
    either way."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray],
                 pooled: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # mean in f32: with a bf16 trunk the accumulation over thousands of
        # frames is otherwise too lossy (same rule as the RawNet FC attention)
        s = (jnp.mean(x.astype(jnp.float32), axis=1)
             if pooled is None else pooled)                        # (B, C)
        # bias-free like the reference SE (maze5.py:154-157 Linear(bias=False)):
        # a trainable bias here would be a structural drift the train-parity
        # harness flags — torch has no such parameter to update
        s = nn.relu(nn.Dense(max(self.channels // self.reduction, 1),
                             use_bias=False, name="fc1")(s))
        s = nn.sigmoid(nn.Dense(self.channels, use_bias=False, name="fc2")(s))
        if x is None:
            return s
        # gate back at trunk width before the (B,T,C) multiply — an f32 gate
        # promotes the whole block output and its backward to f32 (round-3
        # lesson; measured 5.88 -> 5.27 ms fwd across maze5's 5 SE sites)
        return x * s[:, None, :].astype(x.dtype)


class _ConvParams(nn.Module):
    """Parameter twin of ``nn.Conv(cout, (k,))``: creates/retrieves the exact
    same {kernel, bias} variables (names, shapes, init distributions) without
    running the convolution — the fused eval-trunk kernel consumes the raw
    arrays. Checkpoints are interchangeable between the two paths."""

    cin: int
    cout: int
    k: int = 3

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.k, self.cin, self.cout))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.cout,))
        return {"kernel": kernel, "bias": bias}


class _BNParams(nn.Module):
    """Parameter twin of ``nn.BatchNorm`` (scale/bias + batch_stats mean/var);
    eval-mode running stats only — the fused path never updates them."""

    c: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(), (self.c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.c,))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((self.c,)))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((self.c,)))
        return ({"scale": scale, "bias": bias},
                {"mean": mean.value, "var": var.value})


def _adaptive_avg_resample(x: jnp.ndarray, lout: int) -> jnp.ndarray:
    """torch F.adaptive_avg_pool1d on the time axis of (B, T, C), exactly:
    output bin i averages input[floor(i*Lin/Lout) : ceil((i+1)*Lin/Lout)].
    Used only with Lout >= Lin (each bin spans 1-2 elements), so two static
    gathers + a blend beat a (Lout, Lin) matmul; indices are trace-time numpy
    constants (static shapes)."""
    import numpy as np

    lin = x.shape[1]
    if lin == lout:
        return x
    assert lin <= lout, f"adaptive resample expects upsampling, got {lin}->{lout}"
    i = np.arange(lout)
    start = (i * lin) // lout
    end = -((-(i + 1) * lin) // lout)           # ceil((i+1)*lin/lout)
    cnt = (end - start).astype(np.float32)
    w0 = jnp.asarray(1.0 / cnt)[None, :, None]
    w1 = jnp.asarray((cnt - 1.0) / cnt)[None, :, None]   # 0 when the bin is a single element
    a = x[:, jnp.asarray(start), :]
    b = x[:, jnp.asarray(end - 1), :]
    return a * w0 + b * w1


class ResBlockSE(nn.Module):
    """Pre-activation 1-D residual block with optional SE gating.

    BN -> ReLU -> Conv(k3) -> BN -> ReLU -> Dropout -> Conv(k3); 1x1 conv matches
    channel changes; stride>1 applies AvgPool to both paths (maze4.py:105-147).
    ``first=True`` skips the leading BN/ReLU as the reference does for stack heads.
    """

    in_channels: int
    out_channels: int
    stride: int = 1
    dropout_rate: float = 0.3
    first: bool = False
    use_se: bool = True
    # 'tpu' (default): pool-early — the anti-aliased overlap pool downsamples
    # the block INPUT, then BN/conv/SE run at the reduced length (round-3
    # redesign, ~1.5x round-2's pool-last form on v5e at identical FLOPs
    # ordering; BN-free identity skip).
    # 'reference': exact maze4.py:105-147 semantics — AvgPool1d(2s-1, s, pad=s-1)
    # counting pads, SE applied AFTER pooling, 1x1 skip when stride>1 OR channel
    # change. 'maze3': the maze3.py:206-263 variant — SE on the conv branch
    # BEFORE the residual add, 1x1 skip on channel change only, same overlap
    # pool. Needed for forward parity with ported reference checkpoints.
    semantics: str = "tpu"
    # Fused eval path ('tpu' semantics, bf16 trunks only): the whole block body
    # runs as ONE Pallas kernel (ops/pallas/resblock_fused.py) with BN stats
    # folded at trace time and the SE mean accumulated in-pass; parameter
    # structure is identical to the plain path (checkpoint-compatible twins).
    fused_eval: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if (self.fused_eval and not train and self.semantics == "tpu"
                and self.dtype == jnp.bfloat16):
            return self._fused_eval_body(x)
        if self.semantics in ("fmsl_plain", "fmsl_se"):
            # maze3/6_fmsl_standardized.py:48-94 variant: bias-free convs,
            # conv-stride downsampling (torch pad=1), the pre-activation feeds
            # BOTH branches, dropout after conv2, no pool; SE (when present in
            # the wrapper) applies after the residual add. 'fmsl_se' is
            # maze2_fmsl_standardized.py:50-92's twist on the same block: the
            # SEBlock lives INSIDE the block and gates the conv branch BEFORE
            # the residual add.
            h = x
            if not self.first:
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name="bn1")(h)
                h = nn.relu(h)
            pre = h
            h = nn.Conv(self.out_channels, (3,), strides=(self.stride,),
                        padding=((1, 1),), use_bias=False, dtype=self.dtype,
                        name="conv1")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name="bn2")(h)
            h = nn.relu(h)
            h = nn.Conv(self.out_channels, (3,), padding=((1, 1),),
                        use_bias=False, dtype=self.dtype, name="conv2")(h)
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
            if self.use_se and self.semantics == "fmsl_se":
                h = SEBlock(self.out_channels, name="se")(h)
            skip = pre
            if self.stride != 1 or self.in_channels != self.out_channels:
                skip = nn.Conv(self.out_channels, (1,), strides=(self.stride,),
                               use_bias=False, dtype=self.dtype,
                               name="downsample")(pre)
            out = h + skip
            if self.use_se and self.semantics == "fmsl_plain":
                out = SEBlock(self.out_channels, name="se")(out)
            return out

        if self.semantics == "fmsl_adaptive":
            # maze4/7/8_fmsl_standardized.py:112-162 variant (caught by the
            # literal-reference oracle, tests/test_reference_oracle.py): baseline
            # conv ordering but dropout AFTER conv2, and the AvgPool(2s-1, s,
            # s-1) is applied to the SKIP only, whose result is then
            # adaptive_avg_pool1d'd back UP to the conv branch's undiminished
            # length — so "stride" blocks never actually downsample; the skip
            # is blur-resampled instead. The 1x1 downsample conv reads the
            # post-preactivation x (not the raw input as the baselines do).
            h = x
            if not self.first:
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name="bn1")(h)
                h = nn.relu(h)
            pre = h
            out = nn.Conv(self.out_channels, (3,), padding=((1, 1),),
                          dtype=self.dtype, name="conv1")(pre)
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               name="bn2")(out)
            out = nn.relu(out)
            out = nn.Conv(self.out_channels, (3,), padding=((1, 1),),
                          dtype=self.dtype, name="conv2")(out)
            out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
            skip = pre
            if self.in_channels != self.out_channels or self.stride != 1:
                skip = nn.Conv(self.out_channels, (1,), dtype=self.dtype,
                               name="downsample")(skip)
            if self.stride > 1:
                skip = nn.avg_pool(skip, (2 * self.stride - 1,),
                                   strides=(self.stride,),
                                   padding=((self.stride - 1, self.stride - 1),))
                skip = _adaptive_avg_resample(skip, out.shape[1])
            res = out + skip
            if self.use_se:
                res = SEBlock(self.out_channels, name="se")(res)
            return res

        if self.semantics == "tpu":
            # TPU-native default (round-3 redesign): DOWNSAMPLE FIRST — the
            # anti-aliased overlap avg_pool runs on the raw block input, then
            # the round-2 block ordering runs at the REDUCED length (the
            # reference pools after full-length convs; the FLOPs win is the
            # same either way). Measured on maze5 (64x4 s, v5e): trunk ~42 ->
            # ~29 ms/batch. Two designs were measured and REJECTED here:
            # a strided-conv pre-act form (ResNet-v2 style) trains to 100% but
            # its eval-mode accuracy collapses to chance once overfit — the
            # un-smoothed strided path amplifies the BN train/eval statistics
            # gap per block (e2e fixture, 20 epochs); and bf16 BatchNorm,
            # which measured ZERO gain at b128/b192. The identity skip is
            # BN-free RAW x throughout; only channel changes add a 1x1 conv.
            if self.stride > 1:
                x = nn.avg_pool(x, (2 * self.stride - 1,),
                                strides=(self.stride,),
                                padding=((self.stride - 1, self.stride - 1),))
            h = x
            # BN emits the trunk dtype (batch stats still computed/stored in
            # f32 inside flax): the following conv casts to bf16 anyway, so an
            # f32 BN output only widens the BN->relu->dropout glue's HBM round
            # trips in the TRAIN step (eval uses the folded kernel instead).
            if not self.first:
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 dtype=self.dtype, name="bn1")(h)
                h = nn.relu(h)
            h = nn.Conv(self.out_channels, (3,), padding="SAME",
                        dtype=self.dtype, name="conv1")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name="bn2")(h)
            h = nn.relu(h)
            # regenerate-in-backward dropout: same 'dropout' stream and fold
            # path as nn.Dropout (name pins the rng fold), so the training
            # trajectory is bit-identical; only the saved-mask HBM residual
            # (~3.4 ms/step at maze5 b16) goes away (ops/dropout.py)
            h = RDropout(self.dropout_rate, name="Dropout_0")(
                h, deterministic=not train)
            h = nn.Conv(self.out_channels, (3,), padding="SAME",
                        dtype=self.dtype, name="conv2")(h)
            skip = x
            if self.in_channels != self.out_channels:
                skip = nn.Conv(self.out_channels, (1,), dtype=self.dtype,
                               name="downsample")(x)
            out = h + skip
            if self.use_se:
                out = SEBlock(self.out_channels, name="se")(out)
            return out

        # 'maze2' (maze2.py:40-68, literal-oracle finding): identical to
        # 'reference' except the 1x1 skip exists only on CHANNEL change —
        # maze2's `downsample = (in != out) or (stride != 1 and first)` never
        # fires on its stride-2 same-channel blocks (identity skip, post-add
        # overlap pool).
        m2 = self.semantics == "maze2"
        ref = self.semantics == "reference" or m2
        m3 = self.semantics == "maze3"
        h = x
        if not self.first:
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(h)
            h = nn.relu(h)
        h = nn.Conv(self.out_channels, (3,), padding="SAME", dtype=self.dtype,
                    name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.Conv(self.out_channels, (3,), padding="SAME", dtype=self.dtype,
                    name="conv2")(h)
        if self.use_se and m3:
            h = SEBlock(self.out_channels, name="se")(h)

        skip = x
        if self.in_channels != self.out_channels or (ref and not m2
                                                     and self.stride > 1):
            skip = nn.Conv(self.out_channels, (1,), dtype=self.dtype,
                           name="downsample")(skip)
        out = h + skip
        if self.stride > 1:
            # torch AvgPool1d(kernel=2s-1, stride=s, padding=s-1) with
            # count_include_pad=True (flax avg_pool divides by the full
            # window size, matching)
            out = nn.avg_pool(out, (2 * self.stride - 1,),
                              strides=(self.stride,),
                              padding=((self.stride - 1, self.stride - 1),))
        if self.use_se and ref:
            out = SEBlock(self.out_channels, name="se")(out)
        return out

    def _fused_eval_body(self, x: jnp.ndarray) -> jnp.ndarray:
        """Eval-mode 'tpu' block via the fused Pallas kernel. Variables are
        declared through checkpoint-compatible twins (_ConvParams/_BNParams)
        so plain-trained checkpoints run unchanged; the stride pool and SE
        gate-multiply stay in XLA (both fuse into adjacent ops)."""
        import jax as _jax

        from adfmsl.ops.pallas import resblock_fused as _rf
        from adfmsl.ops.pallas.resblock_fused import (fold_block_params,
                                                      resblock_eval_fused)

        if self.stride > 1:
            x = nn.avg_pool(x, (2 * self.stride - 1,), strides=(self.stride,),
                            padding=((self.stride - 1, self.stride - 1),))
        params, stats = {}, {}
        if not self.first:
            params["bn1"], stats["bn1"] = _BNParams(self.in_channels,
                                                    name="bn1")()
        params["conv1"] = _ConvParams(self.in_channels, self.out_channels,
                                      name="conv1")()
        params["bn2"], stats["bn2"] = _BNParams(self.out_channels, name="bn2")()
        params["conv2"] = _ConvParams(self.out_channels, self.out_channels,
                                      name="conv2")()
        if self.in_channels != self.out_channels:
            params["downsample"] = _ConvParams(self.in_channels,
                                               self.out_channels, k=1,
                                               name="downsample")()
        pre, w1, b1, w2, bt, skw = fold_block_params(params, stats,
                                                     first=self.first)
        if _rf.DEFAULT_IMPL == "xla":
            y, sums = _rf.resblock_eval_xla(x, pre, w1, b1, w2, bt, skw)
        else:
            interpret = _jax.default_backend() != "tpu"
            y, sums = resblock_eval_fused(x.astype(jnp.bfloat16), pre, w1, b1,
                                          w2, bt, skw, rows=_rf.DEFAULT_ROWS,
                                          interpret=interpret)
        if self.use_se:
            gate = SEBlock(self.out_channels, name="se")(
                None, pooled=sums / x.shape[1])
            y = y * gate[:, None, :].astype(y.dtype)
        return y


class ResStack(nn.Module):
    """A stack of ResBlockSE with per-block (in, out, stride)."""

    specs: Sequence[tuple]          # [(cin, cout, stride), ...]
    dropout_rate: float = 0.3
    use_se: bool = True
    semantics: str = "tpu"
    fused_eval: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (cin, cout, stride) in enumerate(self.specs):
            x = ResBlockSE(cin, cout, stride, self.dropout_rate, first=(i == 0),
                           use_se=self.use_se, semantics=self.semantics,
                           fused_eval=self.fused_eval, dtype=self.dtype,
                           name=f"block{i}")(x, train=train)
        return x


class AttentiveStatsPooling(nn.Module):
    """Attention-weighted mean || std over time -> (B, 2C) (maze6.py:167-180).

    ``use_std=False`` is maze6_fmsl's file-local variant
    (maze6_fmsl_standardized.py:189-211): it concatenates the raw weighted
    VARIANCE (no sqrt, no eps) — checkpoints trained on it need the same."""

    channels: int
    hidden: int = 128
    use_std: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:   # (B, T, C)
        a = nn.tanh(nn.Dense(self.hidden, name="att1")(x))
        a = nn.Dense(1, name="att2")(a)                  # (B, T, 1)
        w = jax.nn.softmax(a, axis=1)
        mean = jnp.sum(w * x, axis=1)
        var = jnp.sum(w * (x - mean[:, None, :]) ** 2, axis=1)
        second = jnp.sqrt(var + 1e-6) if self.use_std else var
        return jnp.concatenate([mean, second], axis=-1)


class TransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer semantics: post-LN, ReLU FFN."""

    d_model: int
    n_heads: int
    d_ff: int = 2048
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dtype=self.dtype,
            dropout_rate=self.dropout_rate, deterministic=not train,
            name="self_attn")(x, x)
        x = nn.LayerNorm(name="norm1")(x + nn.Dropout(
            self.dropout_rate, deterministic=not train)(attn))
        ff = nn.Dense(self.d_ff, dtype=self.dtype, name="ff1")(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout_rate, deterministic=not train)(ff)
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="ff2")(ff)
        return nn.LayerNorm(name="norm2")(x + nn.Dropout(
            self.dropout_rate, deterministic=not train)(ff))


class TransformerEncoderStack(nn.Module):
    """in-proj -> learned positional embedding (max_len param) -> N layers ->
    out-proj (maze3_fmsl_standardized.py:98-137; d=256 h=8 ff=2048 in maze2)."""

    in_dim: int
    d_model: int = 256
    n_heads: int = 8
    n_layers: int = 6
    d_ff: int = 2048
    out_dim: Optional[int] = None
    max_len: int = 1000
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):          # (B, T, C)
        t = x.shape[1]
        if t > self.max_len:
            raise ValueError(f"sequence length {t} exceeds max_len {self.max_len}")
        h = nn.Dense(self.d_model, dtype=self.dtype, name="in_proj")(x)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (self.max_len, self.d_model))
        h = h + pos[None, :t, :]
        for i in range(self.n_layers):
            h = TransformerEncoderLayer(self.d_model, self.n_heads, self.d_ff,
                                        self.dropout_rate, dtype=self.dtype,
                                        name=f"layer{i}")(h, train=train)
        out_dim = self.out_dim or self.in_dim
        return nn.Dense(out_dim, dtype=self.dtype, name="out_proj")(h)


class PlainTransformerEncoder(nn.Module):
    """torch ``nn.TransformerEncoder`` applied directly at the trunk dim — NO
    input/output projection and NO positional embedding (maze2.py:160-166,
    maze6.py:236-241 feed the 256-ch trunk straight through batch-first
    post-LN layers)."""

    d_model: int
    n_heads: int = 8
    n_layers: int = 6
    d_ff: int = 2048
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):          # (B, T, C=d_model)
        for i in range(self.n_layers):
            x = TransformerEncoderLayer(self.d_model, self.n_heads, self.d_ff,
                                        self.dropout_rate, dtype=self.dtype,
                                        name=f"layer{i}")(x, train=train)
        return x


class ConvFMSLLayer(nn.Module):
    """maze8's original conv 'FMSL' (maze8.py:76-131): freq-modulation conv (k=7,
    num_filters ch, BN+ReLU+Dropout) -> spectral-enhancement conv (k=3, BN+ReLU+
    Dropout) -> channel attention (1x1 squeeze r=4) -> 1x1 back-projection +
    residual. The FMSL-standardized models deliberately dropped it as 'not true
    geometric manifold shaping' (maze4_fmsl_standardized.py:229) — baseline maze8
    parity only."""

    channels: int
    num_filters: int = 64
    kernel_size: int = 7
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):          # (B, T, C)
        h = nn.Conv(self.num_filters, (self.kernel_size,), padding="SAME",
                    name="freq_mod_conv")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="freq_mod_bn")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.num_filters, (3,), padding="SAME", name="spec_enh_conv")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="spec_enh_bn")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        att = jnp.mean(h, axis=1)                        # AdaptiveAvgPool1d(1)
        att = nn.relu(nn.Dense(max(self.num_filters // 4, 1), name="att1")(att))
        att = nn.sigmoid(nn.Dense(self.num_filters, name="att2")(att))
        out = nn.Conv(self.channels, (1,), name="out_proj")(h * att[:, None, :])
        return x + out


class _GateParams(nn.Module):
    """Parameter twin of one ``nn.GRUCell`` gate Dense (same names, shapes and
    init distributions) — the hoisted scan consumes the raw arrays, so ported
    torch checkpoints (port.py:gru) load unchanged."""

    fin: int
    fout: int
    use_bias: bool = True
    recurrent: bool = False

    @nn.compact
    def __call__(self):
        init = (nn.initializers.orthogonal() if self.recurrent
                else nn.initializers.lecun_normal())
        out = {"kernel": self.param("kernel", init, (self.fin, self.fout))}
        if self.use_bias:
            out["bias"] = self.param("bias", nn.initializers.zeros_init(),
                                     (self.fout,))
        return out


class _GRUCellParams(nn.Module):
    """Parameter twin of ``nn.GRUCell`` (gates ir/iz/in over the input,
    hr/hz/hn over the carry; only hn carries a recurrent bias)."""

    hidden: int
    in_features: int

    @nn.compact
    def __call__(self):
        p = {}
        for g in ("ir", "iz", "in"):
            p[g] = _GateParams(self.in_features, self.hidden, name=g)()
        p["hr"] = _GateParams(self.hidden, self.hidden, use_bias=False,
                              recurrent=True, name="hr")()
        p["hz"] = _GateParams(self.hidden, self.hidden, use_bias=False,
                              recurrent=True, name="hz")()
        p["hn"] = _GateParams(self.hidden, self.hidden, recurrent=True,
                              name="hn")()
        return p


class GRU(nn.Module):
    """Unidirectional (optionally stacked) GRU over (B, T, C)
    (RawNet2 trunk; the reference relies on cuDNN nn.GRU —
    main_fmsl_standardized.py:150-153; the original RawNet2 yaml stacks
    nb_gru_layer=3, model_config_RawNet.yaml).

    TPU-native formulation (round 4): the three input projections for ALL
    timesteps run as ONE pre-scan GEMM ((B, T, C) @ (C, 3H)) — the round-3
    ``nn.RNN(GRUCell)`` form re-launched them inside the sequential scan body,
    where the MXU cannot batch them. Only the irreducible recurrent
    (B, H) @ (H, 3H) matmul stays in the body. Gate math is exactly flax
    ``nn.GRUCell`` (= torch nn.GRU with merged r/z input+recurrent biases);
    parameter tree is byte-compatible with the round-3 form (``cell{k}/...``,
    the ``rnn`` wrapper never held params).

    ``return_sequences=False`` returns only the final hidden state (B, H) and
    skips stacking the (B, T, H) output — RawNet consumes only ``h[:, -1]``.
    """

    hidden: int
    layers: int = 1
    return_sequences: bool = True

    @nn.compact
    def __call__(self, x):
        h = x
        hdim = self.hidden
        for k in range(self.layers):
            last = k == self.layers - 1
            p = _GRUCellParams(hdim, h.shape[-1],
                               name="cell" if k == 0 else f"cell{k}")()
            wi = jnp.concatenate([p["ir"]["kernel"], p["iz"]["kernel"],
                                  p["in"]["kernel"]], axis=1)     # (C, 3H)
            bi = jnp.concatenate([p["ir"]["bias"], p["iz"]["bias"],
                                  p["in"]["bias"]])               # (3H,)
            wh = jnp.concatenate([p["hr"]["kernel"], p["hz"]["kernel"],
                                  p["hn"]["kernel"]], axis=1)     # (H, 3H)
            bhn = p["hn"]["bias"]
            xi = h @ wi + bi                                      # (B, T, 3H)
            carry0 = jnp.zeros((h.shape[0], hdim), xi.dtype)
            collect = self.return_sequences or not last

            def step(c, xt, _wh=wh, _bhn=bhn, _collect=collect):
                hh = c @ _wh                                      # (B, 3H)
                r = nn.sigmoid(xt[:, :hdim] + hh[:, :hdim])
                z = nn.sigmoid(xt[:, hdim:2 * hdim] + hh[:, hdim:2 * hdim])
                n = jnp.tanh(xt[:, 2 * hdim:] + r * (hh[:, 2 * hdim:] + _bhn))
                c = (1.0 - z) * n + z * c
                return c, (c if _collect else None)

            carry, ys = jax.lax.scan(step, carry0, jnp.swapaxes(xi, 0, 1))
            h = jnp.swapaxes(ys, 0, 1) if collect else carry
        return h        # (B, T, H), or (B, H) with return_sequences=False
