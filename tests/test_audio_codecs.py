"""Native compressed-audio decode: mp3 / ogg-vorbis / ogg-opus / webm.

Fixtures are produced in-process by tests/codec_fixtures.py (ctypes against
the system ENCODER libs); decode goes through the shipped C++ decoder
(dsjax/cpp/src/audio_decode.cpp). Lossy codecs -> compare by SNR against the
original sine, not sample equality.
"""

import numpy as np
import pytest

from dsjax.cpp.audio_binding import (FMT_MP3, FMT_OPUS, FMT_VORBIS,
                                     available_formats, decode_bytes)
from tests import codec_fixtures as fx


def _sine(sr: int, seconds: float = 1.0, freq: float = 440.0) -> np.ndarray:
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _snr_db(ref: np.ndarray, got: np.ndarray, sr: int) -> float:
    """Best SNR over integer codec-delay lags (codecs prepend 0-1000 samples
    of algorithmic delay), edges excluded."""
    best = -100.0
    margin = sr // 10
    for lag in range(0, min(1001, max(1, len(got) - margin))):
        n = min(len(ref), len(got) - lag) - margin
        if n <= margin:
            break
        a = ref[margin:n]
        b = got[lag + margin:lag + n]
        noise = np.mean((a - b) ** 2)
        snr = 10.0 * np.log10(np.mean(a ** 2) / max(noise, 1e-12))
        best = max(best, float(snr))
    return best


def test_mp3_roundtrip():
    if not available_formats() & FMT_MP3:
        pytest.skip("libmpg123 unavailable")
    sr = 16000
    y = _sine(sr)
    blob = fx.encode_mp3(y, sr)
    if blob is None:
        pytest.skip("libmp3lame unavailable for fixture encoding")
    out, rate = decode_bytes(blob)
    assert rate == sr
    assert abs(len(out) - len(y)) < sr // 4  # codec delay padding only
    assert _snr_db(y, out, sr) > 15.0


def test_ogg_vorbis_roundtrip():
    if not available_formats() & FMT_VORBIS:
        pytest.skip("libvorbis unavailable")
    sr = 16000
    y = _sine(sr)
    blob = fx.encode_ogg_vorbis(y, sr)
    if blob is None:
        pytest.skip("libvorbisenc unavailable for fixture encoding")
    out, rate = decode_bytes(blob)
    assert rate == sr
    assert abs(len(out) - len(y)) < sr // 4
    assert _snr_db(y, out, sr) > 15.0


def test_ogg_opus_roundtrip():
    if not available_formats() & FMT_OPUS:
        pytest.skip("libopus unavailable")
    y = _sine(48000)
    blob = fx.encode_ogg_opus(y)
    if blob is None:
        pytest.skip("libopus encoder unavailable for fixture encoding")
    out, rate = decode_bytes(blob)
    assert rate == 48000
    assert _snr_db(y, out, 48000) > 12.0


def test_webm_opus_roundtrip():
    if not available_formats() & FMT_OPUS:
        pytest.skip("libopus unavailable")
    y = _sine(48000)
    blob = fx.encode_webm_opus(y)
    if blob is None:
        pytest.skip("libopus encoder unavailable for fixture encoding")
    out, rate = decode_bytes(blob)
    assert rate == 48000
    assert _snr_db(y, out, 48000) > 12.0


def test_webm_vorbis_roundtrip():
    if not available_formats() & FMT_VORBIS:
        pytest.skip("libvorbis unavailable")
    sr = 16000
    y = _sine(sr)
    blob = fx.encode_webm_vorbis(y, sr)
    if blob is None:
        pytest.skip("libvorbisenc unavailable for fixture encoding")
    out, rate = decode_bytes(blob)
    assert rate == sr
    assert _snr_db(y, out, sr) > 15.0


def test_load_audio_mp3_dispatch(tmp_path):
    """load_audio decodes .mp3 and resamples to the target rate."""
    if not available_formats() & FMT_MP3:
        pytest.skip("libmpg123 unavailable")
    sr = 22050
    y = _sine(sr)
    blob = fx.encode_mp3(y, sr)
    if blob is None:
        pytest.skip("libmp3lame unavailable")
    p = tmp_path / "a.mp3"
    p.write_bytes(blob)
    from dsjax.audio.io import load_audio

    out = load_audio(str(p), 16000)
    assert out.dtype == np.float32
    assert abs(len(out) - 16000) < 16000 // 4


def test_garbage_rejected():
    with pytest.raises(IOError):
        decode_bytes(b"\x00" * 1000)


def test_fuzz_truncated_and_corrupted_never_crash():
    """Server uploads reach the native decoder in-process: truncated and
    bit-flipped streams must raise (or decode partially) — never crash the
    process. Covers every available encoder's container path."""
    rng = np.random.default_rng(0)
    sr = 16000
    y = _sine(sr, 0.5)
    blobs = []
    if available_formats() & FMT_MP3:
        b = fx.encode_mp3(y, sr)
        if b:
            blobs.append(("mp3", b))
    if available_formats() & FMT_VORBIS:
        b = fx.encode_ogg_vorbis(y, sr)
        if b:
            blobs.append(("ogg", b))
        b = fx.encode_webm_vorbis(y, sr) if hasattr(fx, "encode_webm_vorbis") else None
        if b:
            blobs.append(("webm", b))
    if available_formats() & FMT_OPUS:
        y48 = _sine(48000, 0.5)  # opus encoders take 48 kHz input
        b = fx.encode_ogg_opus(y48)
        if b:
            blobs.append(("opus", b))
    if not blobs:
        pytest.skip("no encoders available")
    for name, blob in blobs:
        data = np.frombuffer(blob, np.uint8)
        for trial in range(30):
            buf = data.copy()
            if trial % 2 == 0:  # truncate
                cut = int(rng.integers(1, len(buf)))
                buf = buf[:cut]
            else:               # flip a handful of bytes
                idx = rng.integers(0, len(buf), size=8)
                buf[idx] ^= rng.integers(1, 255, size=8).astype(np.uint8)
            try:
                out = decode_bytes(buf.tobytes())
                assert isinstance(out, tuple) or hasattr(out, "dtype") or True
            except (IOError, ValueError, OSError):
                pass  # rejection is fine; crashing is not
