import numpy as np
import pytest

from dsjax.audio import io as aio
from dsjax.audio.features import (
    FeatureExtractor,
    num_frames,
    pad_audio_for_device,
    spectrogram_jax,
    spectrogram_np,
    stft_params,
)
from dsjax.config import SpectConfig


def _tone(sr=16000, dur=0.73, f=440.0):
    t = np.arange(int(sr * dur)) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_wav_roundtrip(tmp_path):
    y = _tone()
    p = str(tmp_path / "t.wav")
    aio.save_wav(p, y, 16000)
    y2, sr = aio.read_wav(p)
    assert sr == 16000
    assert y2.shape == (1, len(y))
    np.testing.assert_allclose(y2[0], y, atol=1.5 / 32768)


def test_wav_stereo_downmix(tmp_path):
    y = np.stack([_tone(f=440), _tone(f=880)])
    p = str(tmp_path / "s.wav")
    aio.save_wav(p, y, 16000)
    mono = aio.load_audio(p)
    np.testing.assert_allclose(mono, y.mean(0), atol=3 / 32768)


def test_resample_length():
    y = _tone(sr=22050, dur=1.0)
    out = aio.resample(y, 22050, 16000)
    assert abs(len(out) - 16000) <= 2


def test_trim_and_gain():
    y = _tone()
    t = aio.trim(y, 16000, 0.1, 0.3)
    assert len(t) == int(0.2 * 16000)
    g = aio.apply_gain(y, 6.0)
    np.testing.assert_allclose(g, y * 10 ** 0.3, rtol=1e-5)


def test_tempo_changes_length():
    y = _tone(dur=1.0)
    fast = aio.stretch_tempo(y, 16000, 1.25)
    slow = aio.stretch_tempo(y, 16000, 0.8)
    assert len(fast) < len(y) < len(slow)
    # pitch preserved: dominant bin of the stretched signal stays at 440 Hz
    spec = np.abs(np.fft.rfft(fast * np.hanning(len(fast))))
    peak_hz = np.argmax(spec) * 16000 / len(fast)
    assert abs(peak_hz - 440) < 15


def test_stft_params():
    cfg = SpectConfig()
    n_fft, hop, n_freq = stft_params(cfg)
    assert (n_fft, hop, n_freq) == (320, 160, 161)


def test_spectrogram_np_shape_and_librosa_semantics():
    cfg = SpectConfig()
    y = _tone(dur=0.5)  # 8000 samples
    spec = spectrogram_np(y, cfg, normalize=False)
    assert spec.shape == (161, num_frames(len(y), 160))
    assert spec.shape[1] == 1 + 8000 // 160
    # manual frame-0 check: center=True reflect padding
    window = np.hamming(320)  # symmetric -- should NOT match (we use periodic)
    from scipy.signal import get_window
    pwin = get_window("hamming", 320, fftbins=True)
    yp = np.pad(y, 160, mode="reflect")
    f0 = np.log1p(np.abs(np.fft.rfft(yp[:320] * pwin)))
    np.testing.assert_allclose(spec[:, 0], f0, rtol=1e-5, atol=1e-5)
    assert not np.allclose(spec[:, 0], np.log1p(np.abs(np.fft.rfft(yp[:320] * window))))


def test_spectrogram_normalization_unbiased():
    cfg = SpectConfig()
    y = _tone(dur=0.4)
    raw = spectrogram_np(y, cfg, normalize=False)
    norm = spectrogram_np(y, cfg, normalize=True)
    expect = (raw - raw.mean()) / raw.std(ddof=1)
    np.testing.assert_allclose(norm, expect, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("normalize", [False, True])
def test_device_spectrogram_matches_numpy(normalize):
    cfg = SpectConfig()
    rng = np.random.default_rng(0)
    lens = [5000, 8000, 12345]
    max_frames = max(num_frames(n, 160) for n in lens)
    batch, valid = [], []
    for n in lens:
        y = rng.standard_normal(n).astype(np.float32) * 0.1
        yp, n_t = pad_audio_for_device(y, cfg, pad_to_frames=max_frames)
        batch.append(yp)
        valid.append(n_t)
    out = np.asarray(spectrogram_jax(np.stack(batch), np.asarray(valid, np.int32), cfg,
                                     normalize=normalize))
    rng = np.random.default_rng(0)
    for i, n in enumerate(lens):
        y = rng.standard_normal(n).astype(np.float32) * 0.1
        ref = spectrogram_np(y, cfg, normalize=normalize)
        t = ref.shape[1]
        np.testing.assert_allclose(out[i, :, :t], ref, rtol=1e-3, atol=1e-3)
        assert np.all(out[i, :, t:] == 0)


def test_feature_extractor_chunks():
    cfg = SpectConfig()
    fe = FeatureExtractor(cfg)
    y = _tone(dur=3.0)
    chunks = list(fe.chunks(y, chunk_size_seconds=1.0))
    assert len(chunks) == 3
    assert sum(len(c) for c in chunks) == len(y)
    whole = list(fe.chunks(y, chunk_size_seconds=-1))
    assert len(whole) == 1 and len(whole[0]) == len(y)
