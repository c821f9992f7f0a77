"""Flagship-width golden-logits regression (offline pretrained-parity proxy).

The fixture (tests/fixtures/golden_flagship.npz) holds the model output for
deterministic numpy-generated weights at FULL flagship width (5x
BiLSTM-1024), validated bit-close against the torch twin at creation time
(tools/make_golden_fixture.py: max abs diff 2.6e-8). Until the real V3.0
checkpoints are reachable (network-gated; reference
tests/pretrained_smoke_test.py:10-16), this pins the importer + forward
numerics so parity cannot regress silently. Torch-free.
"""

import os
import pytest

import numpy as np

import jax.numpy as jnp

from dsjax.config import SpectConfig
from dsjax.model.ds2 import DeepSpeech2
from dsjax.model.torch_import import convert_state_dict, infer_architecture
from tests.golden_flagship import CLASSES, LAYERS, flagship_input, flagship_state

pytestmark = pytest.mark.slow  # integration-scale; fast path: -m 'not slow'

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_flagship.npz")


def test_flagship_golden_logits():
    golden = np.load(FIXTURE)
    state = flagship_state()
    x, lengths = flagship_input()
    model_cfg, num_classes = infer_architecture(state)
    assert num_classes == CLASSES and model_cfg.hidden_size == 1024
    params, stats = convert_state_dict(state, LAYERS, True)
    model = DeepSpeech2(num_classes=CLASSES, spect_cfg=SpectConfig(),
                        model_cfg=model_cfg)
    j_out, j_lens, _ = model.apply({"params": params, "batch_stats": stats},
                                   jnp.asarray(x), jnp.asarray(lengths),
                                   train=False)
    np.testing.assert_array_equal(np.asarray(j_lens), golden["out_lens"])
    probs = np.asarray(j_out)
    for i, l in enumerate(golden["out_lens"]):
        np.testing.assert_allclose(probs[i, :l], golden["probs"][i, :l],
                                   atol=5e-6, rtol=1e-4)
