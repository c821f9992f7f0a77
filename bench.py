#!/usr/bin/env python
"""Benchmark: flagship-model training throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measures end-to-end training utterances/sec on the DeepSpeech2 flagship
config (2xconv + 5xBiLSTM-1024, bf16, CTC, AdamW, clip 400) with
LibriSpeech-like shapes (batch 32, ~15s utterances at 10ms hop). The
baseline for vs_baseline is the reference's published number — none exists
in-tree (BASELINE.md) — so we anchor on the driver north star's A100 figure
once measured; until then vs_baseline is reported against a conservative
estimate of the reference stack's A100 throughput for this config
(~90 utt/s at batch 32, cuDNN LSTM bound).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dsjax.config import TrainConfig, compose
    from dsjax.data.dataset import Batch
    from dsjax.labels import DEFAULT_LABELS
    from dsjax.train.loop import Trainer

    cfg = compose(TrainConfig, [
        "model.hidden_size=1024",
        "model.hidden_layers=5",
        "trainer.precision=16",
        "data.batch_size=32",
    ])
    trainer = Trainer(cfg, DEFAULT_LABELS)
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    b, f, t = 32, 161, 1024  # ~10.2s of audio per utterance at 10ms hop
    max_label = 256
    inputs = rng.standard_normal((b, f, t)).astype(np.float32)
    input_lengths = rng.integers(t // 2, t + 1, size=b).astype(np.int32)
    input_lengths[0] = t
    targets = rng.integers(1, len(DEFAULT_LABELS), size=(b, max_label)).astype(np.int32)
    target_lengths = rng.integers(max_label // 2, max_label + 1, size=b).astype(np.int32)
    batch = Batch(inputs, input_lengths, targets, target_lengths,
                  input_lengths.astype(np.float32) / t)

    # warmup / compile
    state, loss = trainer.train_step(state, batch)
    jax.block_until_ready(loss)

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = trainer.train_step(state, batch)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    utt_per_sec = b * n_steps / dt
    baseline_a100_utt_s = 90.0  # see module docstring
    print(json.dumps({
        "metric": "train_throughput_ds2_5x1024_b32_t1024",
        "value": round(utt_per_sec, 2),
        "unit": "utterances/sec/chip",
        "vs_baseline": round(utt_per_sec / baseline_a100_utt_s, 3),
    }))


if __name__ == "__main__":
    main()
