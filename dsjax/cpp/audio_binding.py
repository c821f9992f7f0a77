"""ctypes binding for the native compressed-audio decoder (mp3/ogg/webm).

The codec math runs in-process via the system codec libraries (dlopen'd by
cpp/src/audio_decode.cpp); container parsing (Ogg paging for Opus, WebM
EBML) is done by our C++. Replaces the reference's sox/torchaudio externals
for compressed inputs (reference server.py:22-30, data/common_voice.py:22-60).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

from dsjax.cpp.beam_binding import load_lib

FMT_MP3, FMT_VORBIS, FMT_OPUS = 1, 2, 4


def _lib():
    lib = load_lib()
    if not getattr(lib, "_audio_configured", False):
        lib.ds_audio_decode.restype = ctypes.c_int
        lib.ds_audio_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.ds_audio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.ds_audio_formats.restype = ctypes.c_int
        lib._audio_configured = True
    return lib


def available_formats() -> int:
    """Bitmask of decodable codecs (FMT_MP3 | FMT_VORBIS | FMT_OPUS); 0 when
    the system codec libraries are absent."""
    try:
        return int(_lib().ds_audio_formats())
    except Exception:
        return 0


def decode_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    """Compressed audio bytes -> (float32 mono signal, sample_rate)."""
    lib = _lib()
    pcm = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_int64()
    channels = ctypes.c_int()
    rate = ctypes.c_int()
    rc = lib.ds_audio_decode(data, len(data), ctypes.byref(pcm),
                             ctypes.byref(frames), ctypes.byref(channels),
                             ctypes.byref(rate))
    if rc != 0:
        raise IOError(f"audio decode failed (code {rc}); "
                      f"available codec mask={available_formats()}")
    try:
        count = frames.value * channels.value
        arr = (np.ctypeslib.as_array(pcm, shape=(count,)).copy()
               if count else np.zeros((0,), np.float32))
    finally:
        lib.ds_audio_free(pcm)
    x = arr.reshape(-1, max(channels.value, 1))
    y = x[:, 0] if channels.value == 1 else x.mean(axis=1)
    return np.ascontiguousarray(y, np.float32), rate.value


def decode_file(path: str) -> Tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        return decode_bytes(f.read())


def can_decode(path_or_name: Optional[str]) -> bool:
    """True when the extension is a compressed format this build can decode."""
    if not path_or_name:
        return False
    ext = os.path.splitext(path_or_name)[1].lower().lstrip(".")
    mask = available_formats()
    if ext == "mp3":
        return bool(mask & FMT_MP3)
    if ext in ("ogg", "oga"):
        return bool(mask & (FMT_VORBIS | FMT_OPUS))
    if ext in ("webm", "mka", "mkv"):
        return bool(mask & (FMT_VORBIS | FMT_OPUS))
    if ext == "opus":
        return bool(mask & FMT_OPUS)
    return False
