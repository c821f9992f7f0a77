"""Multi-host (multi-process) array feeding and fetching.

In a multi-process JAX run each host can only address its own devices, so
`jax.device_put(numpy, NamedSharding(global_mesh, ...))` is illegal for
arrays spanning the whole mesh. The reference never faces this (torch DDP
gives every rank a private replica; reference loader/data_loader.py:320-360
just rank-strides the sampler). The SPMD equivalent implemented here:

  * each host loads ONLY its shard of the global batch (rank-strided
    sampler, dsjax/data/sampler.py), collated to host-local numpy arrays;
  * hosts agree on the padded shapes (one tiny int allgather per step —
    independently-collated shards may have different bucketed T/L maxima,
    and SPMD requires every host to enqueue the same program);
  * `jax.make_array_from_process_local_data` assembles the global jax.Array
    from the per-host shards without any host ever touching non-addressable
    device memory.

Fetching goes the other way: `host_local_rows` pulls only the addressable
row-block of a P('data')-sharded output (model-axis replicas deduplicated),
so per-host decoding (dsjax/train/loop.py validate) never fetches remote
shards.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def agree_shapes(arrays: Sequence[np.ndarray]) -> Tuple[np.ndarray, ...]:
    """Pad each array so all hosts hold identically-shaped shards.

    Runs one allgather of the concatenated shape vectors, takes the
    elementwise max, and zero-pads every trailing dim up to it. Leading
    (batch) dims must already agree across hosts — the samplers pad every
    host to the same number of rows (pad_to_batch).
    """
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return tuple(arrays)
    shapes = np.concatenate([np.asarray(a.shape, np.int64) for a in arrays])
    gathered = np.asarray(multihost_utils.process_allgather(shapes))
    mx = gathered.max(axis=0)
    out = []
    off = 0
    for a in arrays:
        tgt = mx[off:off + a.ndim]
        off += a.ndim
        if tgt[0] != a.shape[0]:
            raise ValueError(
                f"host-local batch sizes differ across hosts: {a.shape[0]} "
                f"vs max {tgt[0]} — samplers must pad_to_batch equally")
        pad = [(0, int(t) - s) for t, s in zip(tgt, a.shape)]
        out.append(np.pad(a, pad) if any(p[1] for p in pad) else a)
    return tuple(out)


def make_global(sharding, array: np.ndarray):
    """Host-local shard -> global jax.Array under `sharding` (P('data',...)).

    Single-process: plain device_put. Multi-process: the global batch dim is
    inferred as local_rows x (hosts spanning the data axis) by
    jax.make_array_from_process_local_data.
    """
    import jax

    if jax.process_count() == 1:
        return jax.device_put(array, sharding)
    return jax.make_array_from_process_local_data(sharding, array)


def host_local_rows(arr) -> np.ndarray:
    """Addressable row-block of a P('data', ...)-sharded global array.

    Model-axis replicas hold identical row blocks; deduplicate by row start.
    Returns the rows this host computed, in order — for a host-major data
    axis these are exactly the rows this host fed in.
    """
    blocks = {}
    for s in arr.addressable_shards:
        start = s.index[0].start or 0
        if start not in blocks:
            blocks[start] = np.asarray(s.data)
    return np.concatenate([blocks[k] for k in sorted(blocks)], axis=0)
