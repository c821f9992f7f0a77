"""dsjax — a TPU-native end-to-end speech recognition framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
SeanNaren/deepspeech.pytorch (the reference): DeepSpeech2-style acoustic
model, CTC training, greedy + beam(LM) CTC decoding, dataset preparation,
streaming/chunked inference, an HTTP inference server, and SPMD
data-parallel training over TPU meshes.

Design notes (TPU-first, not a port):
  * compute path is functional JAX: `jax.jit` + `jax.sharding` over a Mesh,
    `lax.scan` recurrences, static shapes via duration bucketing;
  * the LSTM stack hoists all input projections into one large MXU matmul
    per layer and scans only the recurrent half;
  * CTC loss is an on-device log-semiring forward recursion (no host sync);
  * the feature frontend (STFT -> log1p -> normalize) runs on device as
    batched XLA ops, with a numpy twin for host-side parity;
  * beam search + KenLM-style n-gram scoring is native C++ (see dsjax/cpp),
    fed by device logits.
"""

__version__ = "0.1.0"

from dsjax.labels import load_labels, DEFAULT_LABELS  # noqa: F401


def __getattr__(name):
    """Lazy public API (avoids importing jax at package import time)."""
    api = {
        "DeepSpeech2": ("dsjax.model.ds2", "DeepSpeech2"),
        "ctc_loss": ("dsjax.model.ctc", "ctc_loss"),
        "Trainer": ("dsjax.train.loop", "Trainer"),
        "GreedyDecoder": ("dsjax.decode.greedy", "GreedyDecoder"),
        "BeamCTCDecoder": ("dsjax.decode.beam", "BeamCTCDecoder"),
        "DeviceBeamDecoder": ("dsjax.decode.beam_device", "DeviceBeamDecoder"),
        "load_model": ("dsjax.inference", "load_model"),
        "TrainConfig": ("dsjax.config", "TrainConfig"),
        "compose": ("dsjax.config", "compose"),
    }
    if name in api:
        import importlib

        module, attr = api[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'dsjax' has no attribute {name!r}")
