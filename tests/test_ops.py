"""Golden-value tests for the DSP front end against independent numpy/scipy
references (librosa is unavailable in this environment; formulas follow the same
published definitions librosa/torchaudio implement — SURVEY.md section 4)."""
import numpy as np
import pytest
import scipy.fft
import scipy.signal

import jax
import jax.numpy as jnp

from adfmsl.ops import (
    cmvn,
    dct_matrix,
    frame,
    hann,
    lfcc,
    linear_filterbank,
    logmel,
    mel_filterbank,
    power_spectrogram,
    sinc_conv,
    sinc_filters,
    sinc_init,
    spec_augment,
    stft_fft,
    stft_matmul,
)

RNG = np.random.default_rng(0)


def _numpy_power_spec(x, n_fft, hop, win):
    """Independent reference: frame (reflect-pad, centered), hann, rfft, |.|^2."""
    pad = win // 2
    xp = np.pad(x, pad, mode="reflect")
    n_frames = 1 + (len(xp) - win) // hop
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win) / win)
    out = np.zeros((n_frames, n_fft // 2 + 1))
    for t in range(n_frames):
        fr = xp[t * hop : t * hop + win] * w
        spec = np.fft.rfft(fr, n=n_fft)
        out[t] = np.abs(spec) ** 2
    return out


def test_hann_matches_scipy():
    np.testing.assert_allclose(hann(400, periodic=True),
                               scipy.signal.get_window("hann", 400, fftbins=True),
                               atol=1e-6)
    np.testing.assert_allclose(hann(251, periodic=False),
                               scipy.signal.get_window("hann", 251, fftbins=False),
                               atol=1e-6)


def test_frame_shapes_and_values():
    x = RNG.standard_normal(1000).astype(np.float32)
    fr = np.asarray(frame(jnp.asarray(x), 400, 160, center=False))
    assert fr.shape == (4, 400)
    np.testing.assert_array_equal(fr[1], x[160:560])


def test_stft_fft_matches_numpy_reference():
    x = RNG.standard_normal(8000).astype(np.float32)
    ref = _numpy_power_spec(x, 512, 160, 400)
    got = np.asarray(stft_fft(jnp.asarray(x), 512, 160, 400))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_stft_matmul_matches_fft_path():
    x = RNG.standard_normal(16000).astype(np.float32)
    a = np.asarray(stft_matmul(jnp.asarray(x), 512, 160, 400))
    b = np.asarray(stft_fft(jnp.asarray(x), 512, 160, 400))
    # f32 cancellation at spectral nulls: tolerance scales with the spectrum peak
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-5 * b.max())


def test_stft_batched():
    x = RNG.standard_normal((3, 4000)).astype(np.float32)
    out = np.asarray(stft_matmul(jnp.asarray(x)))
    assert out.shape[0] == 3


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 512, 80)
    assert fb.shape == (257, 80)
    assert (fb >= 0).all()
    # each filter has support; neighbouring filters overlap
    assert (fb.sum(axis=0) > 0).all()


def test_dct_matches_scipy():
    e = RNG.standard_normal((5, 70)).astype(np.float32)
    ref = scipy.fft.dct(e, type=2, norm="ortho", axis=-1)[:, :60]
    got = e @ dct_matrix(70, 60)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_lfcc_end_to_end_shape_and_finite():
    x = RNG.standard_normal((2, 64600)).astype(np.float32)
    out = np.asarray(jax.jit(lfcc)(jnp.asarray(x)))
    assert out.shape == (2, 404, 60)
    assert np.isfinite(out).all()


def test_lfcc_fused_power_parity():
    """fused_power folds |.|^2 into the filterbank GEMM via the stacked
    [fb; fb] over the [re | im] channel layout — identical math up to f32
    summation order (ops/lfcc.py, round-4)."""
    import functools

    x = RNG.standard_normal((2, 16000)).astype(np.float32)
    a = np.asarray(lfcc(jnp.asarray(x), precision="highest"))
    b = np.asarray(lfcc(jnp.asarray(x), precision="highest", fused_power=True))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)
    ml = np.asarray(logmel(jnp.asarray(x), precision="highest"))
    mf = np.asarray(logmel(jnp.asarray(x), precision="highest",
                           fused_power=True))
    np.testing.assert_allclose(mf, ml, rtol=1e-4, atol=1e-5)


def test_logmel_golden():
    x = RNG.standard_normal(16000).astype(np.float32)
    p = _numpy_power_spec(x, 512, 160, 400)
    fb = mel_filterbank(16000, 512, 80)
    ref = np.log(np.maximum(p @ fb, 1e-6))
    got = np.asarray(logmel(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_cmvn():
    x = jnp.asarray(RNG.standard_normal((2, 100, 60)).astype(np.float32) * 5 + 3)
    out = np.asarray(cmvn(x))
    np.testing.assert_allclose(out.mean(axis=1), 0, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=1), 1, atol=1e-2)


def test_sinc_init_mel_spaced():
    low, band = sinc_init(128)
    assert low.shape == (128,) and band.shape == (128,)
    assert low[0] == pytest.approx(30.0, abs=1.0)
    assert (band > 0).all()
    assert np.all(np.diff(low) > 0)


def test_sinc_filters_and_conv():
    low, band = sinc_init(16)
    f = sinc_filters(jnp.asarray(low), jnp.asarray(band), 251)
    assert f.shape == (16, 251)
    # symmetric (linear phase): hann window * even sinc combination
    np.testing.assert_allclose(np.asarray(f), np.asarray(f)[:, ::-1], atol=1e-5)
    x = jnp.asarray(RNG.standard_normal((2, 2000)).astype(np.float32))
    y = sinc_conv(x, f, stride=1)
    assert y.shape == (2, 16, 2000 - 250)


def test_sinc_textbook_is_bandpass():
    """The textbook formula must actually select its band (freq response peak in band)."""
    low = jnp.asarray(np.array([1000.0 - 50.0], dtype=np.float32))  # low=50+|.| => 1000
    band = jnp.asarray(np.array([2000.0 - 50.0], dtype=np.float32))  # high ~ 3000
    f = np.asarray(sinc_filters(low, band, 511, formula="textbook"))[0]
    H = np.abs(np.fft.rfft(f, 8192))
    freqs = np.fft.rfftfreq(8192, 1 / 16000)
    in_band = H[(freqs > 1200) & (freqs < 2800)].mean()
    out_band = H[(freqs < 500) | (freqs > 4000)].mean()
    assert in_band > 5 * out_band


def test_sinc_filters_differentiable():
    low, band = sinc_init(8)

    def loss(lo, ba):
        return jnp.sum(sinc_filters(lo, ba, 101) ** 2)

    g = jax.grad(loss)(jnp.asarray(low), jnp.asarray(band))
    assert np.isfinite(np.asarray(g)).all()


def test_spec_augment_zeroes_bands():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((4, 32, 100))
    y = np.asarray(spec_augment(x, key, 10, 10, 2, 2))
    assert y.shape == x.shape
    assert (y == 0).any() and (y == 1).any()
    # deterministic under same key
    y2 = np.asarray(spec_augment(x, key, 10, 10, 2, 2))
    np.testing.assert_array_equal(y, y2)
    # per-sample masks differ
    assert not all((y[0] == y[i]).all() for i in range(1, 4))


def test_spec_augment_channels_last_layout_parity():
    """(B, T, C) channels_last path draws bit-identical masks to transposing
    into (B, C, T) and back — the maze trunks use it to skip two full-tensor
    transposes per train step (round-4)."""
    key = jax.random.PRNGKey(5)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (3, 50, 8)).astype(np.float32))
    for sem in ("torchaudio", "reference_handrolled"):
        a = jnp.transpose(spec_augment(jnp.transpose(x, (0, 2, 1)), key,
                                       semantics=sem), (0, 2, 1))
        b = spec_augment(x, key, semantics=sem, channels_last=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spec_augment_reference_semantics():
    key = jax.random.PRNGKey(1)
    x = jnp.ones((2, 64, 200))
    y = np.asarray(spec_augment(x, key, 10, 10, 2, 2, semantics="reference_handrolled"))
    assert (y == 0).any()
    # reference semantics: mask always starts below mask_param on the freq axis
    zero_rows = np.where((y[0] == 0).all(axis=1))[0]
    if len(zero_rows):
        assert zero_rows[0] < 10


def test_stft_conv_matches_matmul():
    """Conv-based STFT (no frame materialisation) must equal the matmul path."""
    x = RNG.standard_normal((2, 8000)).astype(np.float32)
    from adfmsl.ops import stft_conv
    a = np.asarray(stft_conv(jnp.asarray(x), 512, 160, 400))
    b = np.asarray(stft_matmul(jnp.asarray(x), 512, 160, 400))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-5 * b.max())
    # 1-D input path
    a1 = np.asarray(stft_conv(jnp.asarray(x[0]), 512, 160, 400))
    np.testing.assert_allclose(a1, a[0], rtol=1e-4, atol=1e-6 * b.max())


def test_sinc_conv_block_gemm_matches_direct():
    """GEMM-native Toeplitz-block sinc conv must equal the direct conv exactly."""
    from adfmsl.ops import sinc_conv
    from adfmsl.ops.sinc import sinc_conv_block_gemm

    low, band = sinc_init(32)
    f = sinc_filters(jnp.asarray(low), jnp.asarray(band), 251, formula="textbook")
    x = jnp.asarray(RNG.standard_normal((2, 3000)).astype(np.float32))
    a = np.asarray(sinc_conv(x, f))
    b = np.asarray(sinc_conv_block_gemm(x, f))
    assert a.shape == b.shape == (2, 32, 3000 - 250)
    np.testing.assert_allclose(a, b, atol=2e-6)
    # odd lengths not divisible by the block size
    x2 = jnp.asarray(RNG.standard_normal((1, 777)).astype(np.float32))
    a2 = np.asarray(sinc_conv(x2, f))
    b2 = np.asarray(sinc_conv_block_gemm(x2, f))
    np.testing.assert_allclose(a2, b2, atol=2e-6)
    # differentiable
    g = jax.grad(lambda f: jnp.sum(sinc_conv_block_gemm(x2, f) ** 2))(f)
    assert np.isfinite(np.asarray(g)).all()


def test_sinc_conv_s2d_matches_nhc():
    """Space-to-depth phase-decomposed sinc conv (ops/sinc.py:sinc_conv_s2d)
    must equal the channels-last direct conv, including lengths not divisible
    by the hop, and stay differentiable w.r.t. the filters."""
    from adfmsl.ops.sinc import sinc_conv_nhc, sinc_conv_s2d

    low, band = sinc_init(32)
    f = sinc_filters(jnp.asarray(low), jnp.asarray(band), 251, formula="textbook")
    for t, hop in ((3000, 16), (3000, 8), (777, 16), (2881, 32)):
        x = jnp.asarray(RNG.standard_normal((2, t)).astype(np.float32))
        a = np.asarray(sinc_conv_nhc(x, f))
        b = np.asarray(sinc_conv_s2d(x, f, hop=hop))
        assert a.shape == b.shape == (2, t - 250, 32)
        np.testing.assert_allclose(a, b, atol=2e-6)
    x2 = jnp.asarray(RNG.standard_normal((1, 777)).astype(np.float32))
    g = jax.grad(lambda f: jnp.sum(sinc_conv_s2d(x2, f) ** 2))(f)
    assert np.isfinite(np.asarray(g)).all()


def test_sinc_seg_matches_unsegmented():
    """Time-segmented sinc executors (ops/sinc.py:_segment_time — the round-4
    small-batch win) must equal the unsegmented forms exactly: the overlapping
    windows recompute the same VALID sums, tail-pad outputs are sliced away,
    and the per-segment abs+pool3 epilogue keeps pool groups in-segment
    (l_out rounded to 3). Grad w.r.t. filters must match within f32
    accumulation-order noise."""
    from adfmsl.ops.sinc import (sinc_abs_pool3_nhc, sinc_abs_pool3_nhc_seg,
                                 sinc_conv_nhc, sinc_conv_nhc_seg)

    low, band = sinc_init(32)
    f = sinc_filters(jnp.asarray(low), jnp.asarray(band), 251, formula="textbook")
    for t in (3000, 777, 2881):           # incl. t_out not divisible by S or 3
        x = jnp.asarray(RNG.standard_normal((2, t)).astype(np.float32))
        a = np.asarray(sinc_conv_nhc(x, f))
        a3 = np.asarray(sinc_abs_pool3_nhc(x, f))
        for s in (2, 3, 4):
            b = np.asarray(sinc_conv_nhc_seg(x, f, s))
            assert b.shape == a.shape
            np.testing.assert_array_equal(a, b)
            b3 = np.asarray(sinc_abs_pool3_nhc_seg(x, f, s))
            assert b3.shape == a3.shape
            np.testing.assert_array_equal(a3, b3)
    x2 = jnp.asarray(RNG.standard_normal((2, 3000)).astype(np.float32))
    g_ref = jax.grad(lambda f: jnp.sum(sinc_abs_pool3_nhc(x2, f) ** 2))(f)
    g_seg = jax.grad(lambda f: jnp.sum(sinc_abs_pool3_nhc_seg(x2, f, 3) ** 2))(f)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_seg),
                               rtol=1e-4, atol=1e-4)


def test_sinc_segment_policy():
    """The measured round-4 dispatch policy (models/sincnet.py:_auto_segments)
    is behavior, not convention — pin it: bare conv segments at eval batch<=16
    only (the backward restitch twin loses in the train step: 514 -> 466
    utt/s), abs_pool3 segments train+eval at batch<=16 (main 788 -> 812), and
    explicit ``segments`` overrides everything."""
    from adfmsl.models.sincnet import SincConv

    bare = SincConv(post="none")
    assert bare._auto_segments(16, train=False) == 3
    assert bare._auto_segments(16, train=True) == 1
    assert bare._auto_segments(64, train=False) == 1
    pool = SincConv(post="abs_pool3")
    assert pool._auto_segments(16, train=True) == 3
    assert pool._auto_segments(16, train=False) == 3
    assert pool._auto_segments(64, train=False) == 1
    forced = SincConv(post="none", segments=2)
    assert forced._auto_segments(64, train=True) == 2


def test_lfcc_leading_batch_dims():
    """lfcc/power_spectrogram accept (..., T) per their contract — the default
    conv impl used to crash on >2-D inputs (hard-coded 2-D padding)."""
    from adfmsl.ops.lfcc import lfcc

    x = jnp.asarray(RNG.standard_normal((2, 3, 8000)).astype(np.float32))
    out = lfcc(x)
    ref = lfcc(x.reshape(6, 8000)).reshape(out.shape)
    assert out.shape[:2] == (2, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_stft_s2d_matches_conv_all_shapes():
    """The space-to-depth form (ops/stft.py:stft_s2d — the v5e-fastest layout,
    now the default impl) must equal stft_conv bit-comparably, including frame
    counts at awkward (T mod hop) remainders."""
    from adfmsl.ops.stft import stft_conv, stft_s2d

    rng = np.random.default_rng(0)
    for t in (64600, 8000, 4000, 3999, 4085, 64520):
        x = jnp.asarray(rng.standard_normal((2, t)).astype(np.float32))
        a = stft_conv(x, precision="highest")
        b = stft_s2d(x, precision="highest")
        assert a.shape == b.shape
        scale = float(jnp.max(jnp.abs(a)))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-6 * scale)


def test_sinc_filters_stay_materialised_before_the_conv():
    """Perf-regression net for the round-4 operand-fusion fix: sinc_filters
    ends in jax.lax.optimization_barrier so XLA cannot operand-fuse the
    sin/where synthesis into the conv's weight read (which re-synthesizes the
    filterbank PER OUTPUT TILE — measured 11.6 vs 5.0 ms on the b16 K=251
    C=128 conv, maze5 train 304 -> 458 utt/s). The barrier is an identity for
    values and grads, so only the traced program can prove it is still there."""
    low, band = sinc_init(16)

    def fwd(low, band):
        return sinc_filters(jnp.asarray(low), jnp.asarray(band), 251,
                            formula="textbook")

    def has_barrier(jaxpr) -> bool:
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "optimization_barrier":
                return True
            for sub in jax.core.jaxprs_in_params(eqn.params):
                if has_barrier(sub):
                    return True
        return False

    jaxpr = jax.make_jaxpr(fwd)(low, band)
    assert has_barrier(jaxpr.jaxpr), (
        "sinc_filters lost its optimization_barrier — XLA will re-synthesize "
        "the filterbank per conv output tile (round-4 PERF.md)")
    # and it must be grad-transparent: BOTH d/d(low) and d/d(band) flow through
    g_low, g_band = jax.grad(lambda l, b: jnp.sum(fwd(l, b) ** 2),
                             argnums=(0, 1))(jnp.asarray(low), jnp.asarray(band))
    for g in (g_low, g_band):
        assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0
