"""Checkpointing: orbax-backed save/restore with best-k + last + auto-resume.

Reference capability (deepspeech_pytorch/checkpoint.py, configs an4.yaml):
Lightning ModelCheckpoint monitoring "wer" with save_top_k and save_last,
plus FileCheckpointHandler.find_latest_checkpoint for elastic auto-resume
(checkpoint.py:34-46). Here a single artifact embeds params, batch stats,
optimizer state, step/epoch counters, config, and labels — the same file
serves train-resume and deployment (reference parity: model.py:147
save_hyperparameters). Multi-host saving is inherited from orbax.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from dsjax.config import TrainConfig, to_dict
from dsjax.train.state import TrainState


class CheckpointHandler:
    """Manages <dir>/best (top-k by monitored metric) and <dir>/last."""

    def __init__(self, dirpath: str, monitor: str = "wer", save_top_k: int = 1,
                 save_last: bool = True, cfg: Optional[TrainConfig] = None,
                 labels: Optional[List[str]] = None, verbose: bool = False):
        self.dirpath = os.path.abspath(dirpath)
        self.monitor = monitor
        self.verbose = verbose
        self.save_last = save_last
        os.makedirs(self.dirpath, exist_ok=True)
        self.best = ocp.CheckpointManager(
            os.path.join(self.dirpath, "best"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max(1, save_top_k),
                best_fn=lambda m: m.get(monitor, float("inf")),
                best_mode="min",
            ),
        )
        self.last = ocp.CheckpointManager(
            os.path.join(self.dirpath, "last"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1),
        )
        self.meta = {"format_version": 1}
        if cfg is not None:
            self.meta["config"] = to_dict(cfg)
        if labels is not None:
            self.meta["labels"] = list(labels)
        if jax.process_index() == 0:  # single writer on shared storage
            with open(os.path.join(self.dirpath, "meta.json"), "w") as f:
                json.dump(self.meta, f)

    # -- save ----------------------------------------------------------

    def save(self, state: TrainState, metrics: Dict[str, float],
             extra: Optional[Dict[str, Any]] = None,
             last_only: bool = False) -> None:
        """Save best-k + last. ``extra`` carries host-side state (e.g. the
        sampler's mid-epoch start_index, reference parity:
        data_loader.py:293-317). ``last_only`` is used for mid-epoch saves
        that should not compete in the best-k ranking."""
        step = int(np.asarray(state.step))
        tree = _state_to_tree(state)
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(tree),
            metrics=ocp.args.JsonSave({k: float(v) for k, v in metrics.items()}),
            extra=ocp.args.JsonSave(dict(extra or {})),
        )
        if not last_only:
            self.best.save(step, args=args,
                           metrics={k: float(v) for k, v in metrics.items()})
        if self.save_last or last_only:
            self.last.save(step, args=args)
        self.best.wait_until_finished()
        self.last.wait_until_finished()
        if self.verbose:
            print(f"saved checkpoint step={step} {metrics}")

    # -- restore -------------------------------------------------------

    def latest_step(self) -> Optional[int]:
        return self.last.latest_step() if self.save_last else self.best.latest_step()

    def restore(self, target_state: TrainState, step: Optional[int] = None,
                best: bool = False) -> TrainState:
        mgr = self.best if best else self.last
        if step is None:
            step = mgr.best_step() if best else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found under {self.dirpath}")
        tree = _state_to_tree(target_state)
        restored = mgr.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore(tree)))
        return _tree_to_state(restored["state"])

    def restore_extra(self, step: Optional[int] = None) -> Dict[str, Any]:
        """Host-side extras (sampler state etc.) from the last checkpoint."""
        step = step if step is not None else self.last.latest_step()
        if step is None:
            return {}
        try:
            restored = self.last.restore(
                step, args=ocp.args.Composite(extra=ocp.args.JsonRestore()))
            return dict(restored.get("extra") or {})
        except Exception:
            return {}

    def close(self) -> None:
        self.best.close()
        self.last.close()


def _state_to_tree(state: TrainState) -> Dict[str, Any]:
    return {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step, "epoch": state.epoch}


def _tree_to_state(tree: Dict[str, Any]) -> TrainState:
    return TrainState(params=tree["params"], batch_stats=tree["batch_stats"],
                      opt_state=tree["opt_state"], step=tree["step"],
                      epoch=tree["epoch"])


def restore_from_path(path: str, target_state: TrainState
                      ) -> "tuple[TrainState, Dict[str, Any]]":
    """Restore full training state from an explicit checkpoint path
    (reference parity: trainer.resume_from_checkpoint, reference
    README.md:231-235). ``path`` may be a dsjax checkpoint root (the
    CheckpointHandler dirpath — its ``last`` subdir is preferred, ``best``
    is the fallback) or one of those subdirs directly. Returns the
    restored state and the host-side extras (sampler position etc.)."""
    path = os.path.abspath(path)
    if os.path.basename(path) in ("last", "best"):
        candidates = [path]
    else:
        candidates = [os.path.join(path, "last"), os.path.join(path, "best")]
    for mgr_dir in candidates:
        if not os.path.isdir(mgr_dir):
            continue
        mgr = ocp.CheckpointManager(mgr_dir)
        try:
            step = mgr.latest_step()
            if step is None:
                continue
            tree = _state_to_tree(target_state)
            restored = mgr.restore(step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(tree)))
            try:
                extra = dict(mgr.restore(step, args=ocp.args.Composite(
                    extra=ocp.args.JsonRestore())).get("extra") or {})
            except Exception:
                extra = {}
            return _tree_to_state(restored["state"]), extra
        finally:
            mgr.close()
    raise FileNotFoundError(f"no restorable checkpoint at {path}")


def load_meta(dirpath: str) -> Dict[str, Any]:
    with open(os.path.join(dirpath, "meta.json")) as f:
        return json.load(f)


def find_latest_checkpoint_dir(save_folder: str) -> Optional[str]:
    """Auto-resume discovery (reference: checkpoint.py:34-46): newest
    checkpoint dir under save_folder by mtime."""
    if not os.path.isdir(save_folder):
        return None
    candidates = []
    for name in os.listdir(save_folder):
        p = os.path.join(save_folder, name)
        if os.path.isdir(p) and os.path.isfile(os.path.join(p, "meta.json")):
            candidates.append(p)
    if os.path.isfile(os.path.join(save_folder, "meta.json")):
        candidates.append(save_folder)
    if not candidates:
        return None
    return max(candidates, key=os.path.getmtime)
