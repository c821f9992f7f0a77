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
