"""Native C++ IO tests. Skipped when libadfmsl_io.so isn't built
(``make -C adfmsl/io_native/src``). A minimal pure-Python FLAC writer (verbatim /
constant subframes, mono 16-bit) generates bit-exact test vectors — the decoder
skips CRC verification so the writer emits placeholder CRCs."""
import os
import struct

import numpy as np
import pytest

from adfmsl.io_native import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native IO library not built")


class _BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def write_flac(path: str, pcm: np.ndarray, sr: int = 16000,
               block_size: int = 4096, constant_tail: bool = False):
    """Mono 16-bit FLAC: STREAMINFO + frames with VERBATIM subframes (optionally a
    trailing CONSTANT-subframe frame)."""
    pcm = pcm.astype(np.int16)
    n = len(pcm)
    w = _BitWriter()
    # STREAMINFO body
    w.write(block_size, 16)
    w.write(block_size, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(sr, 20)
    w.write(0, 3)        # channels-1 = 0 (mono)
    w.write(15, 5)       # bits-1 = 15
    w.write(n, 36)
    for _ in range(16):
        w.write(0, 8)    # md5 zeros
    si = w.bytes()
    header = b"fLaC" + bytes([0x80, 0, 0, len(si)]) + si

    frames = bytearray()
    frame_idx = 0
    pos = 0
    while pos < n:
        bs = min(block_size, n - pos)
        chunk = pcm[pos : pos + bs]
        fw = _BitWriter()
        fw.write(0x3FFE, 14)   # sync
        fw.write(0, 1)         # reserved
        fw.write(0, 1)         # fixed blocksize strategy
        fw.write(7, 4)         # blocksize: 16-bit value follows (bs-1)
        fw.write(5, 4)         # sample rate 16 kHz (table)
        fw.write(0, 4)         # 1 channel
        fw.write(4, 3)         # 16 bits per sample
        fw.write(0, 1)         # reserved
        assert frame_idx < 0x80
        fw.write(frame_idx, 8)  # UTF-8 single byte frame number
        fw.write(bs - 1, 16)
        fw.write(0, 8)          # CRC-8 placeholder (decoder skips)
        if constant_tail and pos + bs >= n and len(np.unique(chunk)) == 1:
            fw.write(0, 1)
            fw.write(0, 6)      # CONSTANT
            fw.write(0, 1)
            fw.write(int(chunk[0]) & 0xFFFF, 16)
        else:
            fw.write(0, 1)
            fw.write(1, 6)      # VERBATIM
            fw.write(0, 1)      # no wasted bits
            for v in chunk:
                fw.write(int(v) & 0xFFFF, 16)
        fw.align()
        fw.write(0, 16)         # CRC-16 placeholder
        frames += fw.bytes()
        pos += bs
        frame_idx += 1
    with open(path, "wb") as fh:
        fh.write(header + bytes(frames))


@pytest.fixture
def flac_file(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    p = str(tmp_path / "tone.flac")
    write_flac(p, x, sr)
    return p, x, sr


def test_decode_flac_verbatim(flac_file):
    from adfmsl.io_native import decode_flac

    p, x, sr = flac_file
    y, got_sr = decode_flac(p)
    assert got_sr == sr
    assert len(y) == len(x)
    np.testing.assert_allclose(y, x / 32768.0, atol=1e-6)


def test_decode_flac_constant_frames(tmp_path):
    from adfmsl.io_native import decode_flac

    x = np.concatenate([
        (np.random.default_rng(0).integers(-1000, 1000, 4096)).astype(np.int16),
        np.full(1000, 123, dtype=np.int16),
    ])
    p = str(tmp_path / "const.flac")
    write_flac(p, x, block_size=4096, constant_tail=True)
    y, sr = decode_flac(p)
    assert len(y) == len(x)
    np.testing.assert_allclose(y, x / 32768.0, atol=1e-6)


def test_decode_wav_native(tmp_path):
    from adfmsl.data.audio import write_wav
    from adfmsl.io_native import decode_wav_native

    sr = 16000
    x = (0.3 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, sr)
    y, got_sr = decode_wav_native(p)
    assert got_sr == sr
    np.testing.assert_allclose(y, x, atol=1e-4)


def _write_raw_wav(path: str, fmt: int, bits: int, sr: int, body: bytes,
                   n_ch: int = 1):
    block = max(1, n_ch * (bits // 8))
    hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, fmt, n_ch, sr,
                                 sr * block, block, bits)
    hdr += b"data" + struct.pack("<I", len(body))
    with open(path, "wb") as fh:
        fh.write(hdr + body)


def test_decode_wav_float64_native(tmp_path):
    """fmt=3/bits=64 (scipy.io.wavfile float64 output) decodes natively, matching
    the pure-Python read_wav path (ADVICE r2: the two IO paths must agree)."""
    from adfmsl.data.audio import read_wav
    from adfmsl.io_native import decode_wav_native

    sr = 16000
    x = 0.3 * np.sin(2 * np.pi * 220 * np.arange(1000) / sr)
    p = str(tmp_path / "f64.wav")
    _write_raw_wav(p, fmt=3, bits=64, sr=sr, body=x.astype(np.float64).tobytes())
    y, got_sr = decode_wav_native(p)
    y_ref, sr_ref = read_wav(p)
    assert got_sr == sr == sr_ref
    np.testing.assert_allclose(y, x.astype(np.float32), atol=1e-7)
    np.testing.assert_allclose(y, y_ref, atol=0)


def test_unsupported_wav_format_clean_error(tmp_path):
    """A 4-bit IMA-ADPCM-style WAV must yield a clean error, not a SIGFPE from
    bits/8 == 0 in the native header-length probe (ADVICE r2 medium), and the
    batch path must zero-fill it like any other corrupt file."""
    from adfmsl.io_native import batch_decode_pad, decode_wav_native

    p = str(tmp_path / "adpcm.wav")
    _write_raw_wav(p, fmt=17, bits=4, sr=16000, body=b"\x00" * 512)
    with pytest.raises(ValueError):
        decode_wav_native(p)
    # mu-law-style (fmt=7, bits=8) must error too, not report a bogus length
    p2 = str(tmp_path / "mulaw.wav")
    _write_raw_wav(p2, fmt=7, bits=8, sr=8000, body=b"\x00" * 512)
    with pytest.raises(ValueError):
        decode_wav_native(p2)
    out, srs, lens = batch_decode_pad([p, p2], max_len=100, pad_mode="zero")
    assert (out == 0).all() and lens.tolist() == [0, 0]


def test_batch_decode_pad(tmp_path, flac_file):
    from adfmsl.data.audio import write_wav
    from adfmsl.data.pad import tile_pad, zero_pad
    from adfmsl.io_native import batch_decode_pad, decode_flac

    flac_path, x_flac, sr = flac_file
    short = (0.1 * np.sin(2 * np.pi * 100 * np.arange(700) / sr)).astype(np.float32)
    wav_path = str(tmp_path / "short.wav")
    write_wav(wav_path, short, sr)
    missing = str(tmp_path / "nope.flac")

    out, srs, lens = batch_decode_pad([flac_path, wav_path, missing],
                                      max_len=2000, pad_mode="tile", n_threads=3)
    assert out.shape == (3, 2000)
    assert srs[0] == sr and srs[1] == sr and srs[2] == 0
    # flac crops
    ref0, _ = decode_flac(flac_path)
    np.testing.assert_allclose(out[0], ref0[:2000], atol=1e-6)
    # wav tile-pads with reference semantics
    short_dec = np.round(np.clip(short, -1, 1) * 32767) / 32768.0
    np.testing.assert_allclose(out[1], tile_pad(short_dec.astype(np.float32), 2000),
                               atol=1e-4)
    assert lens[1] == 700
    # missing file -> zeros
    assert (out[2] == 0).all()

    out_z, _, _ = batch_decode_pad([wav_path], max_len=2000, pad_mode="zero")
    np.testing.assert_allclose(out_z[0], zero_pad(short_dec.astype(np.float32), 2000),
                               atol=1e-4)


def test_dataloader_native_batch_path(tmp_path, flac_file):
    """DataConfig.use_native_io/num_workers drive the C++ thread-pooled batch
    loader end-to-end through DataLoader, matching the per-file Python path."""
    from adfmsl.data.audio import write_wav
    from adfmsl.data.pipeline import AsvspoofDataset, DataLoader
    from adfmsl.data.protocol import Protocol, ProtocolEntry

    flac_path, _, sr = flac_file
    ids, entries = [], []
    for i in range(5):
        u = f"UTT_{i:04d}"
        if i % 2 == 0:
            x = (0.2 * np.sin(2 * np.pi * (100 + 40 * i)
                              * np.arange(900 + 100 * i) / sr)).astype(np.float32)
            write_wav(str(tmp_path / f"{u}.wav"), x, sr)
        else:
            os.link(flac_path, str(tmp_path / f"{u}.flac"))
        ids.append(u)
        entries.append(ProtocolEntry("SPK", u, "-", i % 2))
    proto = Protocol(entries)

    def batches(native: bool, workers: int):
        ds = AsvspoofDataset(proto, str(tmp_path), cut=2000, pad_mode="tile",
                             use_native_io=native, num_workers=workers)
        return list(DataLoader(ds, batch_size=2, shuffle=False, prefetch=0))

    nat = batches(True, 3)
    ref = batches(False, 1)
    assert len(nat) == len(ref) == 3
    for bn, br in zip(nat, ref):
        np.testing.assert_allclose(bn.audio, br.audio, atol=1e-6)
        np.testing.assert_array_equal(bn.label, br.label)
        np.testing.assert_array_equal(bn.mask, br.mask)
        assert bn.utt_ids == br.utt_ids
    # final partial batch is mask-padded
    assert nat[-1].mask.tolist() == [True, False]
