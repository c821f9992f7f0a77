"""Spectrogram feature frontend: STFT -> magnitude -> log1p -> normalize.

Reference semantics (deepspeech_pytorch/loader/data_loader.py:73-94):
  * n_fft = win_length = int(sample_rate * window_size)   (320 @ 16k/20ms)
  * hop   = int(sample_rate * window_stride)              (160 @ 16k/10ms)
  * librosa.stft defaults: center=True (reflect pad n_fft//2 each side),
    periodic window (scipy get_window(..., fftbins=True));
  * magnitude -> log1p;
  * optional per-utterance normalization by mean and *unbiased* std
    (torch .std() default, ddof=1) over the full (F, T) spectrogram.

Two implementations share those semantics:
  * :func:`spectrogram_np` — single-utterance numpy (host data pipeline twin);
  * :func:`spectrogram_jax` — batched, masked, jit-friendly XLA version that
    runs on TPU inside the train/serve step. Framing is a cheap reshape+concat
    (hop == n_fft/2 for the defaults) or strided gather, the FFT is a single
    batched rfft the TPU executes as matmul-like butterflies, and the
    normalization is a masked reduction — no host round-trips.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import get_window

from dsjax.config import SpectConfig, SpectrogramWindow


def stft_params(cfg: SpectConfig) -> Tuple[int, int, int]:
    """(n_fft, hop_length, n_freq_bins) for a spect config."""
    n_fft = int(cfg.sample_rate * cfg.window_size)
    hop = int(cfg.sample_rate * cfg.window_stride)
    return n_fft, hop, n_fft // 2 + 1


def periodic_window(name: str | SpectrogramWindow, n: int) -> np.ndarray:
    if isinstance(name, SpectrogramWindow):
        name = name.value
    return get_window(name, n, fftbins=True).astype(np.float32)


def num_frames(n_samples: int, hop: int) -> int:
    """Frame count for center=True STFT: 1 + n//hop."""
    return 1 + n_samples // hop


# ---------------------------------------------------------------------------
# numpy reference implementation (host)
# ---------------------------------------------------------------------------

def spectrogram_np(y: np.ndarray, cfg: SpectConfig, normalize: bool = True) -> np.ndarray:
    """Single-utterance log-magnitude spectrogram, shape (F, T) float32."""
    n_fft, hop, _ = stft_params(cfg)
    window = periodic_window(cfg.window, n_fft)
    pad = n_fft // 2
    yp = np.pad(y.astype(np.float32), pad, mode="reflect")
    n_t = num_frames(len(y), hop)
    # strided framing
    frames = np.lib.stride_tricks.sliding_window_view(yp, n_fft)[::hop][:n_t]
    spec = np.abs(np.fft.rfft(frames * window, axis=-1)).T.astype(np.float32)  # (F, T)
    spec = np.log1p(spec)
    if normalize:
        mean = spec.mean()
        std = spec.std(ddof=1)
        spec = (spec - mean) / max(std, 1e-10)
    return spec.astype(np.float32)


# ---------------------------------------------------------------------------
# Batched on-device implementation (XLA)
# ---------------------------------------------------------------------------

def pad_audio_for_device(y: np.ndarray, cfg: SpectConfig, pad_to_frames: Optional[int] = None
                         ) -> Tuple[np.ndarray, int]:
    """Host-side prep for :func:`spectrogram_jax`: reflect-pad (which depends
    on the true length, so it cannot be done on padded batches on device),
    then zero-pad so the padded signal holds exactly ``pad_to_frames`` frames.

    Returns (padded_signal, n_valid_frames). The padded signal length is
    ``(pad_to_frames + 1) * hop`` with hop*2 == n_fft, i.e. framing on device
    is a pure reshape.
    """
    n_fft, hop, _ = stft_params(cfg)
    assert n_fft == 2 * hop, "device framing path assumes 50% overlap (n_fft == 2*hop)"
    pad = n_fft // 2
    n_t = num_frames(len(y), hop)
    if pad_to_frames is None:
        pad_to_frames = n_t
    assert pad_to_frames >= n_t
    yp = np.pad(y.astype(np.float32), pad, mode="reflect")
    total = (pad_to_frames + 1) * hop
    if len(yp) < total:
        yp = np.pad(yp, (0, total - len(yp)))
    else:
        yp = yp[:total]
    return yp, n_t


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "normalize"))
def _spectrogram_device(yp: jnp.ndarray, n_valid: jnp.ndarray, window: jnp.ndarray,
                        n_fft: int, hop: int, normalize: bool) -> jnp.ndarray:
    b = yp.shape[0]
    m = yp.shape[1] // hop
    chunks = yp.reshape(b, m, hop)
    frames = jnp.concatenate([chunks[:, :-1, :], chunks[:, 1:, :]], axis=-1)  # (B, T, n_fft)
    spec = jnp.abs(jnp.fft.rfft(frames * window[None, None, :], axis=-1))     # (B, T, F)
    spec = jnp.log1p(spec)
    t = spec.shape[1]
    f = spec.shape[2]
    mask = (jnp.arange(t)[None, :] < n_valid[:, None]).astype(spec.dtype)     # (B, T)
    spec = spec * mask[:, :, None]
    if normalize:
        n = (n_valid.astype(spec.dtype) * f)[:, None, None]
        mean = jnp.sum(spec, axis=(1, 2), keepdims=True) / n
        var = jnp.sum(jnp.square(spec - mean) * mask[:, :, None], axis=(1, 2), keepdims=True) / (n - 1)
        spec = (spec - mean) * jax.lax.rsqrt(jnp.maximum(var, 1e-20))
        spec = spec * mask[:, :, None]
    return jnp.transpose(spec, (0, 2, 1))  # (B, F, T)


def spectrogram_jax(yp_batch: jnp.ndarray, n_valid: jnp.ndarray, cfg: SpectConfig,
                    normalize: bool = True) -> jnp.ndarray:
    """Batched device spectrogram.

    Args:
      yp_batch: (B, L_pad) signals prepared by :func:`pad_audio_for_device`.
      n_valid:  (B,) int32 valid frame counts.
    Returns:
      (B, F, T) float32 log-magnitude spectrograms, zero past n_valid and
      per-utterance normalized over the valid region.
    """
    n_fft, hop, _ = stft_params(cfg)
    window = jnp.asarray(periodic_window(cfg.window, n_fft))
    if jnp.issubdtype(yp_batch.dtype, jnp.integer):
        # int16 PCM upload path: the host ships the signal in its native
        # 16-bit form (halves host->device bytes, the usual input-pipeline
        # bottleneck) and the dequantize runs on device
        yp_batch = yp_batch.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
    return _spectrogram_device(yp_batch, n_valid, window, n_fft, hop, normalize)


class FeatureExtractor:
    """Stateful convenience wrapper bundling a SpectConfig.

    ``__call__`` is the host path (one utterance -> (F, T)); ``batch`` is the
    device path. Mirrors the reference's AudioParser.compute_spectrogram
    (data_loader.py:73-94) plus chunking (data_loader.py:58-71).
    """

    def __init__(self, cfg: SpectConfig, normalize: bool = True):
        self.cfg = cfg
        self.normalize = normalize
        self.n_fft, self.hop, self.n_freq = stft_params(cfg)

    def __call__(self, y: np.ndarray) -> np.ndarray:
        return spectrogram_np(y, self.cfg, self.normalize)

    def batch(self, yp_batch: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
        return spectrogram_jax(yp_batch, n_valid, self.cfg, self.normalize)

    def chunks(self, y: np.ndarray, chunk_size_seconds: float = -1.0):
        """Yield per-chunk signals (reference: data_loader.py:58-71)."""
        import math
        sr = self.cfg.sample_rate
        total_s = math.ceil(len(y) / sr)
        chunk_s = total_s if chunk_size_seconds <= 0 else chunk_size_seconds
        n_chunks = max(1, math.ceil(total_s / chunk_s)) if total_s else 1
        for i in range(n_chunks):
            start = int(i * chunk_s * sr)
            end = start + int(chunk_s * sr)
            yield y[start:end]
