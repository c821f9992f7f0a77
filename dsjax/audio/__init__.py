from dsjax.audio.io import load_audio, save_wav, resample  # noqa: F401
from dsjax.audio.features import (  # noqa: F401
    FeatureExtractor,
    spectrogram_np,
    spectrogram_jax,
)
