"""Explicit-path training resume (reference parity: lightning
``trainer.resume_from_checkpoint``, reference README.md:231-235): a dsjax
checkpoint path restores FULL training state (step/epoch/optimizer), a
reference torch .ckpt warm-starts the weights with a fresh optimizer."""

import json
import os

import numpy as np
import pytest

from dsjax.config import TrainConfig, compose
from dsjax.labels import DEFAULT_LABELS

from .test_smoke import _make_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("resume_ds"))
    return root, _make_dataset(root)


def _cfg(manifest, ckpt_dir, labels_path, *extra):
    return compose(TrainConfig, [
        f"data.train_path={manifest}", f"data.val_path={manifest}",
        f"data.labels_path={labels_path}", "data.batch_size=3",
        "data.num_workers=0", "data.bucket_frames=32", "data.bucket_labels=8",
        "model.hidden_size=16", "model.hidden_layers=1",
        "trainer.precision=32", "trainer.limit_train_batches=2",
        "trainer.limit_val_batches=1", "trainer.log_every_n_steps=1",
        f"trainer.log_dir={ckpt_dir}/logs",
        f"checkpoint.dirpath={ckpt_dir}", *extra])


@pytest.mark.slow
def test_restore_from_path_matches_handler(dataset, tmp_path):
    """restore_from_path on the handler's dirpath (and its last/ subdir)
    returns the exact state the handler saved."""
    import jax

    from dsjax.train.checkpoint import CheckpointHandler, restore_from_path
    from dsjax.train.loop import Trainer

    root, manifest = dataset
    labels_path = str(tmp_path / "labels.json")
    with open(labels_path, "w") as f:
        json.dump(DEFAULT_LABELS, f)
    ckpt_dir = str(tmp_path / "ckpts_unit")
    cfg = _cfg(manifest, ckpt_dir, labels_path, "trainer.max_epochs=1")
    trainer = Trainer(cfg, list(DEFAULT_LABELS))
    state = trainer.init_state()
    state = state.replace(step=state.step + 7, epoch=state.epoch + 1)
    handler = CheckpointHandler(ckpt_dir, cfg=cfg, labels=list(DEFAULT_LABELS))
    handler.save(state, {"wer": 12.0}, extra={"start_index": 3})
    handler.close()

    for path in (ckpt_dir, os.path.join(ckpt_dir, "last")):
        got, extra = restore_from_path(path, trainer.init_state())
        assert int(np.asarray(got.step)) == 7
        assert int(np.asarray(got.epoch)) == 1
        assert extra.get("start_index") == 3
        jax.tree_util.tree_map(np.testing.assert_array_equal,
                               state.params, got.params)

    with pytest.raises(FileNotFoundError):
        restore_from_path(str(tmp_path / "nowhere"), trainer.init_state())


@pytest.mark.slow
def test_train_resume_from_checkpoint_path(dataset, tmp_path, capsys):
    """train() with trainer.resume_from_checkpoint continues from the saved
    step into a DIFFERENT checkpoint dir (fine-tune/fork layout)."""
    from dsjax.train.checkpoint import restore_from_path
    from dsjax.train.loop import Trainer
    from dsjax.workflows import train

    root, manifest = dataset
    labels_path = str(tmp_path / "labels.json")
    with open(labels_path, "w") as f:
        json.dump(DEFAULT_LABELS, f)
    ckpt_a = str(tmp_path / "ckpts_a")
    ckpt_b = str(tmp_path / "ckpts_b")

    train(_cfg(manifest, ckpt_a, labels_path, "trainer.max_epochs=1"))
    cfg_b = _cfg(manifest, ckpt_b, labels_path, "trainer.max_epochs=2",
                 f"trainer.resume_from_checkpoint={ckpt_a}")
    train(cfg_b)
    out = capsys.readouterr().out
    assert f"resumed from {os.path.abspath(ckpt_a)} at step 2" in out

    final, _ = restore_from_path(ckpt_b, Trainer(
        cfg_b, list(DEFAULT_LABELS)).init_state())
    # run A did 2 steps (1 epoch x 2 batches); run B adds epoch 2's 2 steps
    assert int(np.asarray(final.step)) == 4


def test_warm_start_from_torch_ckpt(tmp_path):
    """A reference .ckpt file warm-starts the weights; shape mismatch with
    the configured model raises a clear error instead of training garbage."""
    torch = pytest.importorskip("torch")

    import jax

    from dsjax.train.loop import Trainer
    from dsjax.workflows import _resume_explicit

    from .torch_twin import TorchTwin

    torch.manual_seed(3)
    twin = TorchTwin(hidden=32, layers=2, bidirectional=True)
    twin.eval()
    path = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": twin.export_reference_state_dict(),
                "hyper_parameters": {"labels": list(DEFAULT_LABELS),
                                     "precision": 32}}, path)

    cfg = compose(TrainConfig, ["model.hidden_size=32",
                                "model.hidden_layers=2",
                                "trainer.precision=32"])
    trainer = Trainer(cfg, list(DEFAULT_LABELS))
    state, extra = _resume_explicit(path, trainer.init_state())
    assert extra == {}
    assert int(np.asarray(state.step)) == 0   # fresh optimizer/counters
    w = np.asarray(twin.rnns[0].weight_ih_l0.detach())
    leaves = jax.tree_util.tree_leaves(state.params)
    assert any(l.size == w.size and np.allclose(np.sort(np.ravel(l)),
                                                np.sort(np.ravel(w)))
               for l in leaves)

    bad = compose(TrainConfig, ["model.hidden_size=24",
                                "model.hidden_layers=2",
                                "trainer.precision=32"])
    with pytest.raises(ValueError, match="does not match"):
        _resume_explicit(path, Trainer(bad, list(DEFAULT_LABELS)).init_state())


@pytest.mark.slow
def test_auto_resume_wins_over_explicit_on_relaunch(dataset, tmp_path, capsys):
    """Elastic relaunch semantics (reference training.py:24-27): when
    load_auto_checkpoint finds a checkpoint in the run's OWN dirpath, it
    overrides resume_from_checkpoint — a preempted fine-tune continues
    from its latest save, not from the original warm-start point."""
    from dsjax.workflows import train

    root, manifest = dataset
    labels_path = str(tmp_path / "labels.json")
    with open(labels_path, "w") as f:
        json.dump(DEFAULT_LABELS, f)
    ckpt_a = str(tmp_path / "a")
    ckpt_b = str(tmp_path / "b")

    train(_cfg(manifest, ckpt_a, labels_path, "trainer.max_epochs=1"))
    args = (manifest, ckpt_b, labels_path,
            f"trainer.resume_from_checkpoint={ckpt_a}",
            "load_auto_checkpoint=true")
    # first launch: no checkpoint in ckpt_b yet -> explicit warm start
    train(_cfg(*args, "trainer.max_epochs=2"))
    out = capsys.readouterr().out
    assert f"resumed from {os.path.abspath(ckpt_a)}" in out
    # relaunch (as after preemption): ckpt_b now has its own checkpoint
    train(_cfg(*args, "trainer.max_epochs=3"))
    out = capsys.readouterr().out
    assert f"resumed from {os.path.abspath(ckpt_a)}" not in out
    assert "auto-resumed from step 4" in out
