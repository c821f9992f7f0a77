"""End-to-end learning signal: on trivially learnable synthetic data the
model must reach low WER through the REAL pipeline (train loop + greedy
decode + metrics), not just a decreasing loss."""

import numpy as np
import pytest

import jax

from dsjax.config import TrainConfig, compose
from dsjax.data.dataset import Batch
from dsjax.labels import DEFAULT_LABELS
from dsjax.parallel.mesh import make_mesh
from dsjax.train.loop import Trainer
from dsjax.train.metrics import WordErrorRate

pytestmark = pytest.mark.slow  # integration-scale; fast path: -m 'not slow'


def _make_learnable_batch(rng, n_per_class=4):
    """Four distinct 'audio' patterns, each deterministically mapped to a
    word; patterns are separable bands of spectral energy."""
    words = ["AB", "CD", "EF", "GH"]
    t = 64
    inputs, targets, tl = [], [], []
    lm = {c: i for i, c in enumerate(DEFAULT_LABELS)}
    for k, word in enumerate(words):
        for _ in range(n_per_class):
            x = rng.standard_normal((161, t)).astype(np.float32) * 0.05
            x[k * 30: k * 30 + 25] += 2.0  # class-specific frequency band
            inputs.append(x)
            targets.append([lm[c] for c in word])
            tl.append(len(word))
    b = len(inputs)
    max_l = max(tl)
    tgt = np.zeros((b, max_l), np.int32)
    for i, ids in enumerate(targets):
        tgt[i, : len(ids)] = ids
    lens = np.full((b,), t, np.int32)
    return (Batch(np.stack(inputs), lens, tgt, np.asarray(tl, np.int32),
                  lens.astype(np.float32) / t), words, n_per_class)


def test_model_learns_to_low_wer():
    rng = np.random.default_rng(0)
    batch, words, n_per = _make_learnable_batch(rng)
    cfg = compose(TrainConfig, [
        "model.hidden_size=64", "model.hidden_layers=1",
        "trainer.precision=32", "optim.learning_rate=1e-3",
    ])
    trainer = Trainer(cfg, DEFAULT_LABELS,
                      mesh=make_mesh(1, 1, devices=jax.devices()[:1]))
    state = trainer.init_state()
    for _ in range(80):
        state, loss = trainer.train_step(state, batch)
    out, out_lens = trainer.eval_step(state, batch)
    decoded, _ = trainer.decoder.decode(out, np.asarray(out_lens))
    wer = WordErrorRate()
    refs = [w for w in words for _ in range(n_per)]
    for hyp, ref in zip((d[0] for d in decoded), refs):
        wer.update(hyp, ref)
    assert wer.compute() < 30.0, (
        f"WER {wer.compute():.1f} too high; hyps={[d[0] for d in decoded]}")
