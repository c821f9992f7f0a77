"""Batch samplers: epoch-seeded shuffling, mid-epoch resume, per-host sharding.

Reference capability (loader/data_loader.py:282-360): DSRandomSampler
(pre-binned fixed batches, epoch-seeded randperm, start_index resume) and
DSElasticDistributedSampler (same + rank-strided subsampling padded to equal
length, so every DDP rank sees the same number of batches).

TPU mapping: "rank" is the JAX process index; each host feeds its own shard
of batches into the shared SPMD computation. The torch Generator is replaced
by numpy's Philox-free default_rng seeded by epoch — determinism is preserved
per (epoch, seed) and the resume contract (`start_index`, `set_epoch`) is
identical.
"""

from __future__ import annotations

import math
from typing import Iterator, List

import numpy as np


def _make_bins(n: int, batch_size: int) -> List[List[int]]:
    ids = list(range(n))
    return [ids[i:i + batch_size] for i in range(0, n, batch_size)]


class BucketBatchSampler:
    """Single-host sampler (reference DSRandomSampler parity).

    Batches are fixed contiguous bins of dataset order — manifests are
    duration-sorted, so bins group similar lengths, which minimizes padding
    waste AND keeps XLA shape buckets tight.
    """

    def __init__(self, dataset_size: int, batch_size: int = 1, seed: int = 0):
        self.dataset_size = dataset_size
        self.batch_size = batch_size
        self.seed = seed
        self.start_index = 0
        self.epoch = 0
        self.bins = _make_bins(dataset_size, batch_size)

    def __iter__(self) -> Iterator[List[int]]:
        rng = np.random.default_rng(self.seed + self.epoch)
        order = rng.permutation(len(self.bins) - self.start_index) + self.start_index
        for x in order:
            batch_ids = list(self.bins[int(x)])
            rng.shuffle(batch_ids)
            yield batch_ids

    def __len__(self) -> int:
        return len(self.bins) - self.start_index

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def state_dict(self) -> dict:
        return {"epoch": self.epoch, "start_index": self.start_index}

    def load_state_dict(self, state: dict) -> None:
        self.epoch = state.get("epoch", 0)
        self.start_index = state.get("start_index", 0)


class OrderedBatchSampler(BucketBatchSampler):
    """Deterministic in-order batches (validation/eval)."""

    def __iter__(self) -> Iterator[List[int]]:
        for b in self.bins[self.start_index:]:
            yield list(b)


class DistributedBucketSampler(BucketBatchSampler):
    """Multi-host sampler (reference DSElasticDistributedSampler parity):
    every host gets ceil(n_bins / num_replicas) batches, padded by wrapping,
    subsampled rank-strided so shuffles stay aligned across hosts."""

    def __init__(self, dataset_size: int, batch_size: int = 1, seed: int = 0,
                 num_replicas: int = 1, rank: int = 0):
        super().__init__(dataset_size, batch_size, seed)
        assert 0 <= rank < num_replicas
        self.num_replicas = num_replicas
        self.rank = rank

    @property
    def num_samples(self) -> int:
        return int(math.ceil(float(len(self.bins) - self.start_index) / self.num_replicas))

    @property
    def total_size(self) -> int:
        return self.num_samples * self.num_replicas

    def __iter__(self) -> Iterator[List[int]]:
        rng = np.random.default_rng(self.seed + self.epoch)
        indices = list(rng.permutation(len(self.bins) - self.start_index) + self.start_index)
        # pad by wrapping until every rank gets num_samples batches (the
        # reference pads once and breaks when num_replicas > n_bins,
        # data_loader.py:348; we wrap repeatedly)
        while len(indices) < self.total_size:
            indices += indices[: (self.total_size - len(indices))]
        assert len(indices) == self.total_size
        indices = indices[self.rank: self.total_size: self.num_replicas]
        assert len(indices) == self.num_samples
        for x in indices:
            batch_ids = list(self.bins[int(x)])
            rng.shuffle(batch_ids)
            yield batch_ids

    def __len__(self) -> int:
        return self.num_samples


class DistributedOrderedSampler(DistributedBucketSampler):
    """Deterministic in-order rank-strided batches for multi-host
    validation. Bins are padded by wrapping so every host steps the same
    number of times (SPMD hosts must stay in lockstep); the wrapped
    duplicates slightly overweight early bins — same trade the reference's
    padded DistributedSampler makes (data_loader.py:344-351)."""

    def __iter__(self) -> Iterator[List[int]]:
        indices = list(range(self.start_index, len(self.bins)))
        while len(indices) < self.total_size:
            indices += indices[: self.total_size - len(indices)]
        for x in indices[self.rank: self.total_size: self.num_replicas]:
            yield list(self.bins[int(x)])
