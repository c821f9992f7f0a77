"""Shared fixtures for the 2-process multi-host test: a deterministic global
batch and config, importable identically by the pytest parent (single-process
8-device reference run) and the spawned workers (host-local shards)."""

import numpy as np

from dsjax.labels import DEFAULT_LABELS


def worker_cfg_overrides():
    return [
        "model.hidden_size=64",
        "model.hidden_layers=2",
        "trainer.precision=32",
        "data.batch_size=8",
    ]


def global_batch(b=8, t=64, l=8):
    """Deterministic global batch. Rows 4..7 (host 1's shard) have at most
    48 valid frames with zeros beyond, so host 1 can trim its local padding
    to T=48 and the reassembled global array still matches this one."""
    from dsjax.data.dataset import Batch

    rng = np.random.default_rng(0)
    inputs = rng.standard_normal((b, 161, t)).astype(np.float32)
    input_lengths = np.full((b,), t, np.int32)
    input_lengths[1::2] = t // 2
    input_lengths[4:] = np.minimum(input_lengths[4:], 48)
    for i in range(b):
        inputs[i, :, input_lengths[i]:] = 0.0
    targets = rng.integers(1, len(DEFAULT_LABELS), size=(b, l)).astype(np.int32)
    target_lengths = np.full((b,), l, np.int32)
    return Batch(inputs, input_lengths, targets, target_lengths,
                 input_lengths.astype(np.float32) / t,
                 valid=np.ones((b,), bool))
