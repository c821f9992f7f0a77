"""Roundtrip tests for the native FLAC decoder (dsjax/cpp/src/flac.cpp)
against the pure-Python test encoder."""

import numpy as np
import pytest

flac_binding = pytest.importorskip("dsjax.cpp.flac_binding")

from .flac_encoder import encode_flac  # noqa: E402


def _roundtrip(tmp_path, x, sr=16000, bps=16, **kw):
    data = encode_flac(x, sr, bps=bps, **kw)
    p = tmp_path / "t.flac"
    p.write_bytes(data)
    arr, rate, got_bps = flac_binding.decode_flac_int(str(p))
    assert rate == sr
    assert got_bps == bps
    return arr


@pytest.mark.parametrize("mode", ["constant", "verbatim", "fixed0", "fixed1", "fixed2"])
def test_mono_roundtrip_modes(tmp_path, mode):
    rng = np.random.default_rng(0)
    if mode == "constant":
        x = np.full(5000, -123, np.int32)
    else:
        x = (rng.standard_normal(5000) * 3000).astype(np.int32)
    arr = _roundtrip(tmp_path, x, modes=[mode])
    np.testing.assert_array_equal(arr[:, 0], x)


def test_multi_frame_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x = (np.sin(np.arange(20000) * 0.01) * 8000 +
         rng.standard_normal(20000) * 100).astype(np.int32)
    arr = _roundtrip(tmp_path, x, block_size=4096, modes=["fixed1", "fixed2", "verbatim"])
    np.testing.assert_array_equal(arr[:, 0], x)


def test_stereo_independent(tmp_path):
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((6000, 2)) * 2000).astype(np.int32)
    arr = _roundtrip(tmp_path, x, modes=["fixed2"])
    np.testing.assert_array_equal(arr, x)


def test_stereo_left_side(tmp_path):
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((6000, 2)) * 2000).astype(np.int32)
    arr = _roundtrip(tmp_path, x, modes=["verbatim"], stereo_mode="left_side")
    np.testing.assert_array_equal(arr, x)


def test_decode_flac_float_mono(tmp_path):
    t = np.arange(8000)
    x = (np.sin(2 * np.pi * 440 * t / 16000) * 16000).astype(np.int32)
    data = encode_flac(x, 16000)
    p = tmp_path / "tone.flac"
    p.write_bytes(data)
    y, sr = flac_binding.decode_flac(str(p))
    assert sr == 16000
    assert y.dtype == np.float32
    np.testing.assert_allclose(y, x / 32768.0, atol=1e-6)


def test_convert_to_wav_flac(tmp_path):
    from dsjax.audio.io import load_audio
    from dsjax.datasets.common import convert_to_wav

    x = (np.sin(2 * np.pi * 220 * np.arange(16000) / 16000) * 12000).astype(np.int32)
    src = tmp_path / "a.flac"
    src.write_bytes(encode_flac(x, 16000))
    dst = tmp_path / "a.wav"
    convert_to_wav(str(src), str(dst), 16000)
    y = load_audio(str(dst))
    np.testing.assert_allclose(y, x / 32768.0, atol=2 / 32768)


def test_long_stream_frame_numbers_over_127(tmp_path):
    """Frame numbers >= 128 use the 2-byte UTF-8-style coded form; the
    decoder read one continuation byte short and desynced every stream
    longer than 128 frames (~33 s at 4096/16 kHz) — LibriSpeech territory."""
    rng = np.random.default_rng(2)
    n_frames = 140
    block = 256                     # small blocks: 140 frames in ~36k samples
    x = (np.sin(np.arange(n_frames * block) * 0.03) * 6000 +
         rng.standard_normal(n_frames * block) * 50).astype(np.int32)
    arr = _roundtrip(tmp_path, x, block_size=block,
                     modes=["fixed1", "fixed2"])
    np.testing.assert_array_equal(arr[:, 0], x)


def test_truncated_and_bomb_headers_fail_cleanly(tmp_path):
    """Malformed headers (server-reachable): truncated metadata must not
    read out of bounds, and a 36-bit total_samples bomb must not abort the
    process via bad_alloc across the FFI boundary."""
    good = bytearray(encode_flac(np.zeros(512, np.int32), 16000))
    # truncated: metadata length field points past EOF
    trunc = bytes(good[:8]) + b"\x00\x7f\xff\xff"
    p = tmp_path / "trunc.flac"
    p.write_bytes(trunc)
    with pytest.raises(Exception):
        flac_binding.decode_flac_int(str(p))
    # bomb: STREAMINFO declares 2^36-1 total samples, 8 channels
    bomb = bytearray(good)
    # STREAMINFO payload starts at 8 (4 magic + 4 header); bytes 12/13
    # hold channels/bps bits, 13..17 hold the 36-bit total count
    bomb[8 + 12] = (bomb[8 + 12] & 0xF1) | (7 << 1)   # channels = 8
    bomb[8 + 13] |= 0x0F
    bomb[8 + 14:8 + 18] = b"\xff\xff\xff\xff"
    p2 = tmp_path / "bomb.flac"
    p2.write_bytes(bytes(bomb))
    try:
        flac_binding.decode_flac_int(str(p2))   # may fail, must not abort
    except Exception:
        pass
