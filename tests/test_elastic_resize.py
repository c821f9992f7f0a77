"""Elastic resize: a checkpoint written under one mesh size must restore
onto a different mesh (the preemption/rescale story in kubernetes/README.md
— orbax reshards to the target state's shardings)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsjax.config import TrainConfig, compose
from dsjax.data.dataset import Batch
from dsjax.labels import DEFAULT_LABELS
from dsjax.parallel.mesh import make_mesh
from dsjax.train.checkpoint import CheckpointHandler
from dsjax.train.loop import Trainer

pytestmark = pytest.mark.slow  # integration-scale; fast path: -m 'not slow'


def _cfg():
    return compose(TrainConfig, [
        "model.hidden_size=16", "model.hidden_layers=1",
        "trainer.precision=32", "data.batch_size=8",
    ])


def _batch(rng, b):
    inputs = rng.standard_normal((b, 161, 48)).astype(np.float32)
    lens = np.full((b,), 48, np.int32)
    targets = rng.integers(1, len(DEFAULT_LABELS), size=(b, 4)).astype(np.int32)
    return Batch(inputs, lens, targets, np.full((b,), 4, np.int32),
                 lens.astype(np.float32) / 48)


def test_restore_on_smaller_mesh(tmp_path):
    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 devices")
    rng = np.random.default_rng(0)

    # train 2 steps on an 8-way mesh and checkpoint
    t8 = Trainer(_cfg(), DEFAULT_LABELS, mesh=make_mesh(8, 1))
    s8 = t8.init_state(jax.random.PRNGKey(7))
    for _ in range(2):
        s8, loss8 = t8.train_step(s8, _batch(rng, 8))
    handler = CheckpointHandler(str(tmp_path / "ck"), cfg=_cfg(),
                                labels=DEFAULT_LABELS)
    handler.save(s8, {"wer": 50.0})
    handler.close()

    # restore into a 4-way mesh trainer ("lost half the fleet")
    t4 = Trainer(_cfg(), DEFAULT_LABELS,
                 mesh=make_mesh(4, 1, devices=jax.devices()[:4]))
    s4 = t4.init_state(jax.random.PRNGKey(99))  # different init, overwritten
    handler2 = CheckpointHandler(str(tmp_path / "ck"), cfg=_cfg(),
                                 labels=DEFAULT_LABELS)
    s4 = handler2.restore(s4, best=False)
    handler2.close()
    assert int(np.asarray(s4.step)) == 2

    # restored params equal the 8-way params
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        s4.params, s8.params)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0

    # training continues on the smaller mesh; per-shard loss scaling keeps
    # optimization dynamics intact (loss here scales with 1/dp)
    s4 = t4.shard_state(s4)
    batch = _batch(rng, 8)
    s4, loss4 = t4.train_step(s4, batch)
    assert np.isfinite(float(loss4))