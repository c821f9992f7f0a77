"""Deterministic FLAGSHIP-width (5x BiLSTM-1024) reference state + input.

Weights are generated from numpy (stable across library versions, unlike
torch RNG) in the reference state_dict layout, so the golden-logits fixture
(tests/fixtures/golden_flagship.npz) can be checked without torch and
without committing 270 MB of weights. The fixture's expected outputs were
validated against the torch twin at creation time
(tools/make_golden_fixture.py)."""

from __future__ import annotations

from typing import Dict

import numpy as np

HIDDEN, LAYERS, CLASSES = 1024, 5, 29
D0 = 41 * 32  # RNN input size after the conv stack
B, F, T = 2, 161, 128


def flagship_state(seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    state: Dict[str, np.ndarray] = {}

    def add(key, *shape, scale=0.05):
        state[key] = (rng.standard_normal(shape) * scale).astype(np.float32)

    def add_bn(prefix, n):
        state[f"{prefix}.weight"] = (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)
        add(f"{prefix}.bias", n, scale=0.05)
        add(f"{prefix}.running_mean", n, scale=0.1)
        state[f"{prefix}.running_var"] = (1.0 + 0.2 * rng.random(n)).astype(np.float32)

    add("conv.seq_module.0.weight", 32, 1, 41, 11)
    add("conv.seq_module.0.bias", 32)
    add_bn("conv.seq_module.1", 32)
    add("conv.seq_module.3.weight", 32, 32, 21, 11, scale=0.02)
    add("conv.seq_module.3.bias", 32)
    add_bn("conv.seq_module.4", 32)
    for i in range(LAYERS):
        d = D0 if i == 0 else HIDDEN
        if i >= 1:
            add_bn(f"rnns.{i}.batch_norm.module", d)
        for sfx in ("", "_reverse"):
            add(f"rnns.{i}.rnn.weight_ih_l0{sfx}", 4 * HIDDEN, d, scale=0.02)
            add(f"rnns.{i}.rnn.weight_hh_l0{sfx}", 4 * HIDDEN, HIDDEN, scale=0.02)
            add(f"rnns.{i}.rnn.bias_ih_l0{sfx}", 4 * HIDDEN, scale=0.02)
            add(f"rnns.{i}.rnn.bias_hh_l0{sfx}", 4 * HIDDEN, scale=0.02)
    add_bn("fc.0.module.0", HIDDEN)
    add("fc.0.module.1.weight", CLASSES, HIDDEN, scale=0.05)
    return state


def flagship_input(seed: int = 1):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, F, T)).astype(np.float32)
    lengths = np.array([T, T - 41], np.int32)
    for i, l in enumerate(lengths):
        x[i, :, l:] = 0.0
    return x, lengths
