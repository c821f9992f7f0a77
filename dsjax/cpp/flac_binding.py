"""ctypes binding for the native FLAC decoder."""

from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

from dsjax.cpp.beam_binding import load_lib


def _lib():
    lib = load_lib()
    if not getattr(lib, "_flac_configured", False):
        lib.ds_flac_decode.restype = ctypes.c_int
        lib.ds_flac_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.ds_flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
        lib._flac_configured = True
    return lib


def _decode(path: str) -> Tuple[np.ndarray, int, int]:
    lib = _lib()
    samples = ctypes.POINTER(ctypes.c_int32)()
    n = ctypes.c_int64()
    channels = ctypes.c_int()
    rate = ctypes.c_int()
    bps = ctypes.c_int()
    rc = lib.ds_flac_decode(path.encode(), ctypes.byref(samples),
                            ctypes.byref(n), ctypes.byref(channels),
                            ctypes.byref(rate), ctypes.byref(bps))
    if rc != 0:
        raise IOError(f"FLAC decode failed for {path} (code {rc})")
    try:
        count = n.value * channels.value
        arr = (np.ctypeslib.as_array(samples, shape=(count,)).copy()
               if count else np.zeros((0,), np.int32))
    finally:
        lib.ds_flac_free(samples)
    return arr.reshape(-1, max(channels.value, 1)), rate.value, bps.value


def decode_flac(path: str) -> Tuple[np.ndarray, int]:
    """Decode a FLAC file -> (float32 mono signal, sample_rate).
    Multi-channel audio is averaged to mono (reference load_audio parity,
    data_loader.py:20-26)."""
    arr, rate, bps = _decode(path)
    x = arr.astype(np.float32) / float(1 << (bps - 1))
    y = x[:, 0] if x.shape[1] == 1 else x.mean(axis=1)
    return np.ascontiguousarray(y), rate


def decode_flac_int(path: str) -> Tuple[np.ndarray, int, int]:
    """Raw integer samples (n, channels) + rate + bps (exact, for tests)."""
    return _decode(path)
