"""Device mesh + sharding rules (SPMD over ICI).

The reference's distribution story is torch DDP over NCCL plus TorchElastic
(SURVEY.md §2.15-2.16). The TPU-native equivalent is GSPMD: build a
('data', 'model') mesh, annotate array shardings, and let XLA insert the
collectives (gradient reductions ride the data axis; tensor-parallel matmul
partials ride the model axis) over ICI.

Sharding layout:
  * batch arrays: P('data') on the leading axis;
  * recurrent weights w_ih/w_hh (D, G*H): P(None, 'model') — each model
    shard computes its slice of the gates; XLA all-gathers h as needed;
  * recurrent biases (G*H,): P('model');
  * FC head kernel (H, C): P('model', None) — contracting-dim sharded,
    XLA reduce-scatters partial logits;
  * conv kernels / BN params: replicated (tiny).
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[list] = None, dcn: int = 1) -> Mesh:
    """('data', 'model') mesh, optionally with an outer 'dcn' axis for
    multi-slice training: slices are connected by data-center network, not
    ICI, so the dcn axis must be OUTERMOST — gradient reductions then run
    hierarchically (reduce over ICI within each slice, then the small
    inter-slice reduce over DCN). jax.devices() orders devices
    process-major, which is slice-major on multi-slice TPU, so a plain
    reshape keeps both the dcn axis and per-host batch rows contiguous
    (the layout dsjax/parallel/multihost.py relies on)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % (model * dcn) == 0, \
            f"{n} devices not divisible by model*dcn={model * dcn}"
        data = n // (model * dcn)
    assert dcn * data * model == n, f"mesh {dcn}x{data}x{model} != {n} devices"
    if dcn > 1:
        dev_array = np.asarray(devices).reshape(dcn, data, model)
        return Mesh(dev_array, ("dcn", "data", "model"))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    if "dcn" in mesh.shape:
        return NamedSharding(mesh, P(("dcn", "data")))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path: str, value: Any) -> P:
    """Sharding spec for one parameter by its tree path."""
    if re.search(r"w_ih$|w_hh$", path):
        return P(None, "model")
    if re.search(r"b_ih$|b_hh$", path):
        return P("model")
    if path.endswith("fc/kernel"):
        return P("model", None)
    return P()


def param_shardings(mesh: Mesh, variables: Any) -> Any:
    """Tree of NamedShardings matching a model variables tree.

    With mesh_model == 1 this degenerates to pure data-parallel (all params
    replicated), which is the reference-parity configuration (§2.15).
    """
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]

    def path_str(kp) -> str:
        parts = []
        for k in kp:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
        return "/".join(parts)

    specs = {}
    if mesh.shape.get("model", 1) == 1:
        return jax.tree_util.tree_map(lambda _: replicated(mesh), variables)

    def to_sharding(kp, v):
        spec = _param_spec(path_str(kp), v)
        # drop specs that do not divide the axis evenly
        shape = getattr(v, "shape", ())
        ok = True
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = mesh.shape[axis]
            if dim >= len(shape) or shape[dim] % size != 0:
                ok = False
        return NamedSharding(mesh, spec if ok else P())

    del specs
    return jax.tree_util.tree_map_with_path(to_sharding, variables)
