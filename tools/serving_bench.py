"""Serving latency: single-utterance transcribe path on the local accelerator.

Measures the on-device portion (STFT -> DS2 forward -> greedy collapse) for
one 10s utterance with the flagship model, via the N-rep difference trick
(see bench.py for why naive timing is impossible through the axon tunnel).
Host-side string materialization is microseconds and excluded.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp

from dsjax.audio.features import spectrogram_jax
from dsjax.config import BiDirectionalConfig, SpectConfig
from dsjax.decode.greedy import greedy_collapse_device
from dsjax.labels import DEFAULT_LABELS
from dsjax.model.ds2 import DeepSpeech2, init_model

SECONDS = float(os.environ.get("DSJAX_SERVE_SECONDS", "10.0"))
BATCH = int(os.environ.get("DSJAX_SERVE_BATCH", "8"))


def main():
    cfg = SpectConfig()
    model = DeepSpeech2(num_classes=len(DEFAULT_LABELS), spect_cfg=cfg,
                        model_cfg=BiDirectionalConfig(hidden_size=1024,
                                                      hidden_layers=5),
                        dtype=jnp.bfloat16)
    n_frames = int(SECONDS * 100)
    hop = 160

    def make_prog(n):
        @jax.jit
        def run(seed):
            k = jax.random.split(jax.random.PRNGKey(seed), 2)
            variables = init_model(model, k[0], batch=2, frames=64)
            audio = jax.random.normal(k[1], (BATCH, (n_frames + 1) * hop),
                                      jnp.float32) * 0.1
            lens = jnp.full((BATCH,), n_frames, jnp.int32)

            def body(a, _):
                feats = spectrogram_jax(a, lens, cfg, normalize=True)
                probs, out_lens, _ = model.apply(variables, feats, lens,
                                                 train=False)
                ids, keep = greedy_collapse_device(probs, out_lens)
                return a + 1e-9 * jnp.sum(keep), jnp.sum(ids)

            a, s = jax.lax.scan(body, audio, None, length=n)
            return jnp.sum(a[0, :4]) + s[-1]

        return run

    f1, f2 = make_prog(1), make_prog(9)
    float(f1(0)); float(f2(0))

    def t(f):
        best = 1e9
        for i in range(2):
            t0 = time.perf_counter()
            float(f(i + 3))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (t(f2) - t(f1)) / 8
    print(f"transcribe device path: batch={BATCH} x {SECONDS:.0f}s audio -> "
          f"{dt * 1000:.2f} ms/batch ({dt / BATCH * 1000:.2f} ms/utt, "
          f"RTF={dt / BATCH / SECONDS:.5f})")


if __name__ == "__main__":
    main()
