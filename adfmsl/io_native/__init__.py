"""ctypes bindings for the native C++ audio IO library (``libadfmsl_io.so``).

The native layer provides: FLAC decode (the ASVspoof distribution format), WAV decode,
and a thread-pooled batch loader that decodes+pads a whole batch in one call. Built via
``make -C adfmsl/io_native/src`` (see src/Makefile). Every entry point degrades
gracefully when the library is absent: WAV falls back to numpy, FLAC raises with a
build hint.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "libadfmsl_io.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    p = _lib_path()
    if not os.path.exists(p):
        return None
    lib = ctypes.CDLL(p)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.adfmsl_decode.restype = ctypes.c_int64
    lib.adfmsl_decode.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int64, i32p]
    lib.adfmsl_decode_len.restype = ctypes.c_int64
    lib.adfmsl_decode_len.argtypes = [ctypes.c_char_p]
    lib.adfmsl_batch_decode_pad.restype = ctypes.c_int32
    lib.adfmsl_batch_decode_pad.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,   # paths, n
        f32p, ctypes.c_int64,                              # out, max_len
        i32p, i32p,                                        # out sample rates, lengths
        ctypes.c_int32, ctypes.c_int32,                    # pad_mode (0 tile, 1 zero), n_threads
    ]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def _decode(path: str) -> Tuple[np.ndarray, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native IO library not built; run `make -C adfmsl/io_native/src` "
            "(required for FLAC decode)"
        )
    n = lib.adfmsl_decode_len(path.encode())
    if n < 0:
        raise ValueError(f"cannot decode {path} (err {n})")
    out = np.empty(n, dtype=np.float32)
    sr = ctypes.c_int32(0)
    got = lib.adfmsl_decode(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ctypes.byref(sr),
    )
    if got < 0:
        raise ValueError(f"cannot decode {path} (err {got})")
    return out[:got], int(sr.value)


def decode_flac(path: str) -> Tuple[np.ndarray, int]:
    return _decode(path)


def decode_wav_native(path: str) -> Tuple[np.ndarray, int]:
    return _decode(path)


def batch_decode_pad(
    paths: List[str], max_len: int = 64600, pad_mode: str = "tile", n_threads: int = 4,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode+pad a batch of files in native threads. Returns
    (audio [B, max_len] f32, sample_rates [B] i32, true_lengths [B] i32)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not built")
    n = len(paths)
    out = np.zeros((n, max_len), dtype=np.float32)
    srs = np.zeros(n, dtype=np.int32)
    lens = np.zeros(n, dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.adfmsl_batch_decode_pad(
        arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_len,
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        0 if pad_mode == "tile" else 1, n_threads,
    )
    if rc < 0:
        raise RuntimeError(f"batch decode failed (rc={rc})")
    if rc > 0:   # corrupt files were zero-filled (reference failure tolerance)
        import logging

        logging.getLogger(__name__).warning(
            "batch decode: %d corrupt file(s) zero-filled", rc)
    return out, srs, lens
