"""Data pipeline: threaded prefetch of collated batches.

Replaces the reference's torch DataLoader + worker processes
(loader/data_loader.py:273-279, data_module.py): a small thread pool
parses/augments samples (releasing the GIL inside numpy/FFT), batches are
collated to bucketed static shapes and prefetched ahead of the training
step so the TPU never waits on the host.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

from concurrent.futures import ThreadPoolExecutor

from dsjax.data.dataset import Batch, SpectrogramDataset, collate
from dsjax.data.sampler import BucketBatchSampler


class DataPipeline:
    def __init__(self, dataset: SpectrogramDataset, sampler: BucketBatchSampler,
                 bucket_frames: int = 128, bucket_labels: int = 64,
                 num_workers: int = 2, prefetch: int = 2,
                 pad_to_batch: Optional[int] = None,
                 ragged_split: int = 1):
        self.dataset = dataset
        self.sampler = sampler
        self.bucket_frames = bucket_frames
        self.bucket_labels = bucket_labels
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.pad_to_batch = pad_to_batch
        # >1: emit each batch as that many length-quantile sub-batches
        # (a list) — the trainer sums their grads into ONE optimizer step
        # (DataConfig.ragged_split); each block pads to its own max
        self.ragged_split = max(1, ragged_split)

    def __len__(self) -> int:
        return len(self.sampler)

    def _collate(self, samples, pad_to):
        if getattr(self.dataset, "device_features", False):
            from dsjax.data.dataset import collate_audio

            return collate_audio(samples, self.dataset.extractor.hop,
                                 self.bucket_frames, self.bucket_labels,
                                 pad_to)
        return collate(samples, self.bucket_frames, self.bucket_labels,
                       pad_to)

    def _load_batch(self, indices):
        samples = [self.dataset[i] for i in indices]
        k = self.ragged_split
        if k <= 1 or len(samples) < 2 * k:
            return self._collate(samples, self.pad_to_batch)
        # sort once (collate would anyway), then contiguous length blocks
        key = ((lambda s: s[1]) if getattr(self.dataset, "device_features",
                                           False) else
               (lambda s: s[0].shape[1]))
        samples = sorted(samples, key=key, reverse=True)
        sub = -(-len(samples) // k)
        pad_to = (None if self.pad_to_batch is None
                  else -(-self.pad_to_batch // k))
        return [self._collate(samples[i:i + sub], pad_to)
                for i in range(0, len(samples), sub)]

    def __iter__(self) -> Iterator[Batch]:
        batch_queue: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    from collections import deque

                    window: deque = deque()
                    it = iter(self.sampler)
                    # keep a bounded window of in-flight batch loads
                    depth = self.num_workers + self.prefetch
                    for idx in it:
                        window.append(pool.submit(self._load_batch, idx))
                        if len(window) >= depth:
                            batch_queue.put(window.popleft().result())
                    while window:
                        batch_queue.put(window.popleft().result())
            except BaseException as e:  # propagate into consumer
                batch_queue.put(e)
            finally:
                batch_queue.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = batch_queue.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
