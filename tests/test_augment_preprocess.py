"""Waveform augmentation (maze3.py:577-670 analog) + offline preprocessing
(data_preprocessor.py analog) tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adfmsl.data import (
    add_noise_snr,
    augment_waveform,
    create_dataset_manifest,
    parse_protocol,
    preprocess_audio,
    rir_reverb,
    synthetic_rir,
    trim_silence,
    validate_dataset,
    write_wav,
)

RNG = np.random.default_rng(0)


def test_add_noise_snr_levels():
    x = jnp.asarray(np.sin(2 * np.pi * 440 * np.arange(8000) / 16000)
                    .astype(np.float32))[None, :].repeat(4, axis=0)
    noise = jnp.asarray(RNG.standard_normal((3, 8000)).astype(np.float32))
    y = add_noise_snr(x, noise, jax.random.PRNGKey(0), 10.0, 10.0)  # exactly 10 dB
    d = np.asarray(y - x)
    snr = 10 * np.log10(np.mean(np.asarray(x) ** 2, -1) / np.mean(d ** 2, -1))
    np.testing.assert_allclose(snr, 10.0, atol=0.5)


def test_rir_reverb_preserves_shape_and_energy():
    x = jnp.asarray(RNG.standard_normal((2, 4000)).astype(np.float32))
    rir = synthetic_rir(jax.random.PRNGKey(1), 512)
    y = rir_reverb(x, rir)
    assert y.shape == x.shape
    ex = np.sqrt(np.mean(np.asarray(x) ** 2, -1))
    ey = np.sqrt(np.mean(np.asarray(y) ** 2, -1))
    np.testing.assert_allclose(ey, ex, rtol=1e-3)
    # reverb actually changes the signal
    assert np.abs(np.asarray(y) - np.asarray(x)).max() > 1e-3


def test_augment_waveform_gating():
    x = jnp.asarray(RNG.standard_normal((8, 2000)).astype(np.float32))
    noise = jnp.asarray(RNG.standard_normal((2, 2000)).astype(np.float32))
    rirs = jnp.stack([synthetic_rir(jax.random.PRNGKey(i), 256) for i in range(2)])
    y0 = augment_waveform(x, jax.random.PRNGKey(0), noise, rirs,
                          noise_prob=0.0, reverb_prob=0.0)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(x))   # all gated off
    y1 = augment_waveform(x, jax.random.PRNGKey(0), noise, rirs,
                          noise_prob=1.0, reverb_prob=1.0)
    assert np.abs(np.asarray(y1) - np.asarray(x)).max() > 1e-3
    # jit-compatible
    jitted = jax.jit(lambda x, k: augment_waveform(x, k, noise, rirs, 0.5, 0.5))
    assert np.isfinite(np.asarray(jitted(x, jax.random.PRNGKey(2)))).all()


def test_trim_silence():
    sr = 16000
    sig = 0.5 * np.sin(2 * np.pi * 220 * np.arange(sr // 2) / sr).astype(np.float32)
    x = np.concatenate([np.zeros(8000, np.float32), sig, np.zeros(8000, np.float32)])
    t = trim_silence(x, top_db=30)
    assert len(t) < len(x)
    assert len(t) >= len(sig)
    assert np.abs(t).max() == np.abs(x).max()


def test_preprocess_audio(tmp_path):
    sr = 16000
    x = np.concatenate([np.zeros(4000, np.float32),
                        0.4 * RNG.standard_normal(8000).astype(np.float32)])
    p = str(tmp_path / "a.wav")
    write_wav(p, x, sr)
    out = preprocess_audio(p, max_len=16000, trim=True)
    assert out.shape == (16000,)
    assert out.dtype == np.float32


def test_manifest_and_validation(fixture_dir, tmp_path):
    proto = parse_protocol(fixture_dir["train"]["protocol"])
    csv_path = str(tmp_path / "manifest.csv")
    entries = create_dataset_manifest(proto, fixture_dir["train"]["audio_dir"],
                                      csv_path)
    assert len(entries) == len(proto)
    assert all(e.path for e in entries)
    assert all(e.n_samples > 0 for e in entries)
    import csv as _csv

    with open(csv_path) as fh:
        rows = list(_csv.reader(fh))
    assert len(rows) == len(proto) + 1

    rep = validate_dataset(proto, fixture_dir["train"]["audio_dir"])
    assert rep.ok and rep.found == rep.total
    rep_bad = validate_dataset(proto, "/nonexistent")
    assert not rep_bad.ok and len(rep_bad.missing) == rep.total


def test_explore_data_structure(fixture_dir):
    from adfmsl.data import explore_data_structure

    rep = explore_data_structure(fixture_dir["root"])
    assert "ASVspoof2019_LA_train" in rep
    assert "audio files" in rep
