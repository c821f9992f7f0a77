"""Gradient accumulation: averaged micro-batch grads, Lightning-parity."""

import numpy as np
import pytest

import jax

from dsjax.config import TrainConfig, compose
from dsjax.data.dataset import Batch
from dsjax.labels import DEFAULT_LABELS
from dsjax.parallel.mesh import make_mesh
from dsjax.train.loop import Trainer


def _batch(rng, b=4, t=48, l=6):
    inputs = rng.standard_normal((b, 161, t)).astype(np.float32)
    input_lengths = np.full((b,), t, np.int32)
    targets = rng.integers(1, len(DEFAULT_LABELS), size=(b, l)).astype(np.int32)
    target_lengths = np.full((b,), l, np.int32)
    return Batch(inputs, input_lengths, targets, target_lengths,
                 input_lengths.astype(np.float32) / t)


def _trainer(accum=1, *extra):
    cfg = compose(TrainConfig, [
        "model.hidden_size=16", "model.hidden_layers=1",
        "trainer.precision=32", f"trainer.accumulate_grad_batches={accum}",
        *extra,
    ])
    return Trainer(cfg, DEFAULT_LABELS,
                   mesh=make_mesh(1, 1, devices=jax.devices()[:1]))


@pytest.mark.slow
def test_accum_identical_micros_equals_single_step():
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    key = jax.random.PRNGKey(0)

    t1 = _trainer()
    s1 = t1.init_state(key)
    s1, loss1 = t1.train_step(s1, batch)

    t2 = _trainer(accum=2)
    s2 = t2.init_state(key)
    s2, loss2 = t2.train_step_accum(s2, [batch, batch])

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        s1.params, s2.params)
    max_diff = max(jax.tree_util.tree_leaves(diffs))
    assert max_diff < 1e-5, f"params diverged: {max_diff}"
    assert int(np.asarray(s2.step)) == 1  # one optimizer step


@pytest.mark.slow
def test_accum_through_fit_loop():
    """fit() with accumulate_grad_batches=2 consumes batches in pairs."""
    rng = np.random.default_rng(1)

    class ListPipeline:
        def __init__(self, batches):
            self.batches = batches
            from dsjax.data.sampler import BucketBatchSampler

            self.sampler = BucketBatchSampler(len(batches), 1)

        def __len__(self):
            return len(self.batches)

        def __iter__(self):
            return iter(self.batches)

    batches = [_batch(rng) for _ in range(4)]
    trainer = _trainer(accum=2)
    trainer.cfg.trainer.max_epochs = 1
    trainer.cfg.trainer.limit_val_batches = 1.0
    state = trainer.fit(ListPipeline(batches), ListPipeline(batches[:1]),
                        log_fn=lambda *_: None)
    assert int(np.asarray(state.step)) == 2  # 4 micros -> 2 optimizer steps


def test_ragged_subs_sum_unscaled():
    """ragged_split sub-batches partition ONE sum-reduced loss: their grads
    sum with n_accum=1, matching a single step on the concatenated batch
    (duplicated rows keep BN batch statistics identical, so equality is
    exact, not approximate)."""
    rng = np.random.default_rng(2)
    b = _batch(rng)
    big = Batch(np.concatenate([b.inputs, b.inputs]),
                np.concatenate([b.input_lengths, b.input_lengths]),
                np.concatenate([b.targets, b.targets]),
                np.concatenate([b.target_lengths, b.target_lengths]),
                np.concatenate([b.input_percentages, b.input_percentages]))
    key = jax.random.PRNGKey(7)

    # SGD: the update is linear in the gradient, so the comparison is
    # sharp (Adam's m/sqrt(v) amplifies fp reduction-order noise wherever
    # the gradient is near zero)
    t1 = _trainer(1, "optim=sgd")
    s1 = t1.init_state(key)
    s1, loss1 = t1.train_step(s1, big)

    t2 = _trainer(1, "optim=sgd")
    s2 = t2.init_state(key)
    s2, _ = t2.train_step_accum(s2, [b, b], n_accum=1)

    diffs = jax.tree_util.tree_map(
        lambda a, c: float(np.max(np.abs(np.asarray(a) - np.asarray(c)))),
        s1.params, s2.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5


@pytest.mark.slow
def test_ragged_fit_uses_unit_scale(monkeypatch):
    """fit() must pass n_accum=1 for ragged sub-batch lists (NOT average
    them like micro-batch accumulation) and the real-batch count when
    combining with accumulate_grad_batches."""
    rng = np.random.default_rng(3)

    class ListPipeline:
        def __init__(self, items):
            self.items = items
            from dsjax.data.sampler import BucketBatchSampler

            self.sampler = BucketBatchSampler(len(items), 1)

        def __len__(self):
            return len(self.items)

        def __iter__(self):
            return iter(self.items)

    seen = []
    trainer = _trainer()
    trainer.cfg.trainer.max_epochs = 1
    orig = trainer.train_step_accum

    def spy(state, batches, n_accum=0):
        seen.append((len(batches), n_accum))
        return orig(state, batches, n_accum)

    monkeypatch.setattr(trainer, "train_step_accum", spy)
    subs = [[_batch(rng, b=2), _batch(rng, b=2)]]
    trainer.fit(ListPipeline(subs), ListPipeline([_batch(rng)]),
                log_fn=lambda *_: None)
    assert seen == [(2, 1)]

    seen.clear()
    trainer2 = _trainer(accum=2)
    trainer2.cfg.trainer.max_epochs = 1
    orig2 = trainer2.train_step_accum

    def spy2(state, batches, n_accum=0):
        seen.append((len(batches), n_accum))
        return orig2(state, batches, n_accum)

    monkeypatch.setattr(trainer2, "train_step_accum", spy2)
    subs = [[_batch(rng, b=2), _batch(rng, b=2)] for _ in range(2)]
    trainer2.fit(ListPipeline(subs), ListPipeline([_batch(rng)]),
                 log_fn=lambda *_: None)
    assert seen == [(4, 2)]  # 2 real batches x 2 subs, scaled by 2
