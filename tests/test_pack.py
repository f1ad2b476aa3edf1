"""Packed-array preprocessing tests (docs/PERF.md input-balance answer)."""
import os

import numpy as np

from adfmsl.data import (AsvspoofDataset, DataLoader, PackedDataset, create_pack,
                         parse_protocol)


def test_pack_roundtrip_matches_decode_path(fixture_dir, tmp_path):
    proto = parse_protocol(fixture_dir["train"]["protocol"])
    prefix = str(tmp_path / "train_pack")
    npy, meta = create_pack(proto, fixture_dir["train"]["audio_dir"], prefix,
                            cut=4000, batch=7)   # batch < N exercises chunking
    assert os.path.exists(npy) and os.path.exists(meta)

    ds_ref = AsvspoofDataset(proto, fixture_dir["train"]["audio_dir"], cut=4000)
    ds_pack = PackedDataset(prefix, proto)
    assert len(ds_pack) == len(proto)

    ref = list(DataLoader(ds_ref, 8, shuffle=False, prefetch=0, drop_last=False))
    got = list(DataLoader(ds_pack, 8, shuffle=False, prefetch=0, drop_last=False))
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(b.audio, a.audio)
        np.testing.assert_array_equal(b.label, a.label)
        np.testing.assert_array_equal(b.mask, a.mask)
        assert a.utt_ids == b.utt_ids

    # shuffled epochs reproduce with the same seed too
    r1 = next(iter(DataLoader(ds_pack, 8, shuffle=True, seed=7, prefetch=0)))
    r2 = next(iter(DataLoader(ds_pack, 8, shuffle=True, seed=7, prefetch=0)))
    np.testing.assert_array_equal(r1.audio, r2.audio)

    # labels survive without an external protocol (rebuilt from metadata)
    ds_meta = PackedDataset(prefix)
    x, y = ds_meta.load(proto.utt_ids[0])
    assert y == proto.labels[proto.utt_ids[0]]
    np.testing.assert_array_equal(x, ds_ref.load(proto.utt_ids[0])[0])


def test_pack_cli(fixture_dir, tmp_path, capsys):
    from adfmsl.cli.pack import main

    prefix = str(tmp_path / "p")
    rc = main(["--protocol", fixture_dir["dev"]["protocol"],
               "--data_dir", fixture_dir["dev"]["audio_dir"],
               "--out_prefix", prefix, "--cut", "4000"])
    assert rc == 0
    assert "packed" in capsys.readouterr().out
    ds = PackedDataset(prefix)
    audio, labels = ds.load_batch(ds.protocol.utt_ids[:4])
    assert audio.shape == (4, 4000)
    assert np.isfinite(audio).all()


def test_eval_from_pack_cli(fixture_dir, tmp_path, capsys):
    """adfmsl-eval --pack scores a protocol from a packed array with identical
    scores to the decode path (zero per-utterance decode at eval)."""
    from adfmsl.cli.evaluate import main as eval_main
    from adfmsl.cli.pack import main as pack_main
    from adfmsl.evaluation import read_score_file

    prefix = str(tmp_path / "ev")
    assert pack_main(["--protocol", fixture_dir["eval"]["protocol"],
                      "--data_dir", fixture_dir["eval"]["audio_dir"],
                      "--out_prefix", prefix, "--cut", "4000"]) == 0
    capsys.readouterr()

    s_pack = str(tmp_path / "pack_scores.txt")
    s_dir = str(tmp_path / "dir_scores.txt")
    common = ["--model_type", "lcnn1d_lfcc", "--cut", "4000",
              "--protocol", fixture_dir["eval"]["protocol"],
              "--batch_size", "6"]
    assert eval_main(common + ["--pack", prefix, "--output", s_pack]) == 0
    assert eval_main(common + ["--data_dir", fixture_dir["eval"]["audio_dir"],
                               "--output", s_dir]) == 0
    a, b = read_score_file(s_pack), read_score_file(s_dir)
    assert set(a) == set(b)
    np.testing.assert_allclose([a[k] for k in sorted(a)],
                               [b[k] for k in sorted(b)], rtol=1e-5, atol=1e-6)
