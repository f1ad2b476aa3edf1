import numpy as np
import pytest

from adfmsl.data import (
    AsvspoofDataset,
    DataLoader,
    gen_spoof_list,
    load_audio,
    parse_protocol,
    read_wav,
    resample,
    tile_pad,
    tile_pad_device,
    write_wav,
    zero_pad,
    zero_pad_device,
)


def test_pad_tile_matches_reference_semantics():
    # reference pad(): np.tile to >= max_len then crop (maze2.py:236-242)
    x = np.arange(7, dtype=np.float32)
    out = tile_pad(x, 20)
    assert out.shape == (20,)
    np.testing.assert_array_equal(out, np.tile(x, 3)[:20])
    # long clips crop
    long = np.arange(30, dtype=np.float32)
    np.testing.assert_array_equal(tile_pad(long, 20), long[:20])


def test_pad_zero():
    x = np.ones(5, dtype=np.float32)
    out = zero_pad(x, 8)
    np.testing.assert_array_equal(out, [1, 1, 1, 1, 1, 0, 0, 0])


def test_device_pads_match_host():
    import jax.numpy as jnp

    x = np.random.default_rng(0).standard_normal(777).astype(np.float32)
    buf = np.zeros(2000, dtype=np.float32)
    buf[:777] = x
    np.testing.assert_allclose(
        np.asarray(tile_pad_device(jnp.asarray(buf), 777, 2000)), tile_pad(x, 2000), rtol=0, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(zero_pad_device(jnp.asarray(buf), 777, 2000)), zero_pad(x, 2000)
    )


def test_wav_roundtrip(tmp_path):
    sr = 16000
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, sr)
    y, sr2 = read_wav(p)
    assert sr2 == sr
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_resample():
    sr, tsr = 8000, 16000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    y = resample(x, sr, tsr)
    assert abs(len(y) - 2 * len(x)) <= 2
    t2 = np.arange(len(y)) / tsr
    ref = np.sin(2 * np.pi * 100 * t2)
    assert np.corrcoef(y[100:-100], ref[100:-100])[0, 1] > 0.999


def test_protocol_parsing(fixture_dir):
    p = parse_protocol(fixture_dir["train"]["protocol"])
    assert len(p) == 24
    labels = p.labels
    assert set(labels.values()) == {0, 1}
    # bonafide=1 canonical
    bona = [u for u, l in labels.items() if l == 1]
    assert all(p.attack_types[u] == "-" for u in bona)
    # maze3 polarity compat
    p2 = parse_protocol(fixture_dir["train"]["protocol"], polarity="spoof1")
    assert all(p2.labels[u] == 1 - labels[u] for u in labels)


def test_gen_spoof_list_compat(fixture_dir, tmp_path):
    d, files = gen_spoof_list(fixture_dir["train"]["protocol"], is_train=True)
    assert len(files) == 24 and len(d) == 24
    # bare eval list
    p = tmp_path / "eval_list.txt"
    p.write_text("utt1\nutt2\n")
    assert gen_spoof_list(str(p), is_eval=True) == ["utt1", "utt2"]


def test_dataset_and_loader(fixture_dir):
    proto = parse_protocol(fixture_dir["train"]["protocol"])
    ds = AsvspoofDataset(proto, fixture_dir["train"]["audio_dir"], cut=64600)
    x, y = ds.load(proto.utt_ids[0])
    assert x.shape == (64600,) and x.dtype == np.float32
    assert y in (0, 1)

    loader = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b.audio.shape == (8, 64600)
        assert b.mask.all()

    # padded final batch keeps exact utterance count
    loader2 = DataLoader(ds, batch_size=10, shuffle=False)
    batches2 = list(loader2)
    assert len(batches2) == 3
    assert batches2[-1].mask.sum() == 4
    seen = [u for b in batches2 for u, m in zip(b.utt_ids, b.mask) if m]
    assert sorted(seen) == sorted(proto.utt_ids)


def test_loader_shuffle_deterministic(fixture_dir):
    proto = parse_protocol(fixture_dir["train"]["protocol"])
    ds = AsvspoofDataset(proto, fixture_dir["train"]["audio_dir"])
    a = [b.utt_ids for b in DataLoader(ds, 8, shuffle=True, seed=7, prefetch=0)]
    b = [b.utt_ids for b in DataLoader(ds, 8, shuffle=True, seed=7, prefetch=0)]
    assert a == b


def test_loader_sharding(fixture_dir):
    proto = parse_protocol(fixture_dir["train"]["protocol"])
    ds = AsvspoofDataset(proto, fixture_dir["train"]["audio_dir"])
    shard0 = DataLoader(ds, 4, shard_index=0, num_shards=2).ids
    shard1 = DataLoader(ds, 4, shard_index=1, num_shards=2).ids
    assert sorted(shard0 + shard1) == sorted(proto.utt_ids)
    assert not set(shard0) & set(shard1)


def test_missing_file_yields_zeros(fixture_dir):
    proto = parse_protocol(fixture_dir["train"]["protocol"])
    ds = AsvspoofDataset(proto, "/nonexistent/dir")
    x, y = ds.load(proto.utt_ids[0])
    assert (x == 0).all()


def test_fuzzy_audio_resolver(fixture_dir, tmp_path):
    import shutil

    from adfmsl.data import AsvspoofDataset, FuzzyAudioResolver

    # bury files in nested dirs with decorated names
    proto = parse_protocol(fixture_dir["train"]["protocol"])
    src = fixture_dir["train"]["audio_dir"]
    nested = tmp_path / "deep" / "nested" / "dir"
    nested.mkdir(parents=True)
    import os

    for f in os.listdir(src)[:4]:
        stem, ext = os.path.splitext(f)
        shutil.copy(os.path.join(src, f), str(nested / f"prefix_{stem}_x{ext}"))
    r = FuzzyAudioResolver(str(tmp_path))
    assert len(r) == 4
    utt = os.path.splitext(os.listdir(src)[0])[0]
    assert r.resolve(utt) is not None
    assert r.resolve("NO_SUCH_UTT") is None

    ds = AsvspoofDataset(proto, str(tmp_path), cut=8000, fuzzy_discovery=True)
    x, _ = ds.load(utt)
    assert (x != 0).any()
