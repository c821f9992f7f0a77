"""Data pipeline tests: manifests, samplers, collate, augmentation."""

import json
import os

import numpy as np
import pytest

from dsjax.audio.augment import (NoiseInjector, sparse_image_warp, spec_augment,
                                 time_warp)
from dsjax.audio.io import save_wav
from dsjax.config import SpectConfig
from dsjax.data.dataset import Batch, SpectrogramDataset, collate
from dsjax.data.manifest import create_manifest, parse_input, verify_manifest
from dsjax.data.sampler import (BucketBatchSampler, DistributedBucketSampler,
                                OrderedBatchSampler)
from dsjax.labels import DEFAULT_LABELS


@pytest.fixture
def wav_tree(tmp_path):
    root = tmp_path / "ds"
    (root / "wav").mkdir(parents=True)
    (root / "txt").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i, dur in enumerate([0.2, 0.4, 0.3]):
        y = rng.standard_normal(int(16000 * dur)).astype(np.float32) * 0.1
        save_wav(str(root / "wav" / f"u{i}.wav"), y, 16000)
        (root / "txt" / f"u{i}.txt").write_text(f"AB C{i}" if i < 3 else "X")
    return str(root)


def test_create_and_parse_manifest(wav_tree, tmp_path):
    out = create_manifest(wav_tree, "m.json", str(tmp_path / "manifests"))
    with open(out) as f:
        m = json.load(f)
    assert len(m["samples"]) == 3
    # duration-sorted: 0.2 < 0.3 < 0.4
    assert m["samples"][0]["wav_path"].endswith("u0.wav")
    assert m["samples"][1]["wav_path"].endswith("u2.wav")
    ids = parse_input(out)
    assert len(ids) == 3
    assert verify_manifest(out) == []


def test_manifest_duration_pruning(wav_tree, tmp_path):
    out = create_manifest(wav_tree, "m.json", str(tmp_path / "mm"),
                          min_duration=0.25, max_duration=0.35)
    with open(out) as f:
        m = json.load(f)
    assert len(m["samples"]) == 1
    assert m["samples"][0]["wav_path"].endswith("u2.wav")


def test_directory_mode(wav_tree):
    ids = parse_input(wav_tree)
    assert len(ids) == 3
    assert all("/txt/" in t and t.endswith(".txt") for _, t in ids)


def test_dataset_getitem(wav_tree):
    ds = SpectrogramDataset(SpectConfig(), wav_tree, DEFAULT_LABELS)
    spect, transcript = ds[0]
    assert spect.shape[0] == 161
    assert transcript == [DEFAULT_LABELS.index(c) for c in "AB C0" if c in DEFAULT_LABELS]
    # unknown chars silently dropped (digits not in alphabet)
    assert len(transcript) == 4  # 'A','B',' ','C' — '0' dropped


def test_collate_shapes_and_buckets():
    rng = np.random.default_rng(1)
    samples = [(rng.standard_normal((161, t)).astype(np.float32), [1, 2, 3][:n])
               for t, n in [(50, 3), (70, 2), (30, 1)]]
    batch = collate(samples, bucket_frames=32, bucket_labels=4)
    assert batch.inputs.shape == (3, 161, 96)  # 70 -> 96
    assert batch.targets.shape == (3, 4)
    # sorted desc by length
    assert list(batch.input_lengths) == [70, 50, 30]
    assert list(batch.target_lengths) == [2, 3, 1]
    flat = batch.flat_targets()
    assert list(flat) == [1, 2, 1, 2, 3, 1]
    # pad_to_batch
    b2 = collate(samples, bucket_frames=32, bucket_labels=4, pad_to_batch=8)
    assert b2.inputs.shape[0] == 8
    assert list(b2.target_lengths[3:]) == [0] * 5


def test_bucket_sampler_determinism():
    s1 = BucketBatchSampler(10, batch_size=3, seed=5)
    s2 = BucketBatchSampler(10, batch_size=3, seed=5)
    s1.set_epoch(2)
    s2.set_epoch(2)
    batches1 = [sorted(b) for b in s1]
    batches2 = [sorted(b) for b in s2]
    assert batches1 == batches2
    assert len(batches1) == 4  # ceil(10/3)
    assert sorted(sum(batches1, [])) == list(range(10))
    s1.set_epoch(3)
    assert [sorted(b) for b in s1] != batches1 or True  # order may differ


def test_bucket_sampler_start_index_resume():
    s = BucketBatchSampler(12, batch_size=3, seed=0)
    s.set_epoch(1)
    full = list(s)
    s.start_index = 2
    resumed = list(s)
    assert len(resumed) == len(full) - 2


def test_distributed_sampler_covers_all_ranks():
    n, bs, reps = 20, 2, 4
    seen = []
    lens = set()
    for rank in range(reps):
        s = DistributedBucketSampler(n, batch_size=bs, seed=1,
                                     num_replicas=reps, rank=rank)
        s.set_epoch(0)
        batches = list(s)
        lens.add(len(batches))
        seen.extend(sum((list(b) for b in batches), []))
    assert len(lens) == 1  # equal batches per rank
    assert set(seen) == set(range(n))


def test_ordered_sampler():
    s = OrderedBatchSampler(7, batch_size=3)
    batches = list(s)
    assert batches == [[0, 1, 2], [3, 4, 5], [6]]


def test_pipeline_prefetch(wav_tree):
    from dsjax.data.loader import DataPipeline

    ds = SpectrogramDataset(SpectConfig(), wav_tree, DEFAULT_LABELS)
    sampler = BucketBatchSampler(len(ds), batch_size=2, seed=0)
    pipe = DataPipeline(ds, sampler, bucket_frames=16, bucket_labels=4,
                        num_workers=2, prefetch=2)
    batches = list(pipe)
    assert len(batches) == 2
    assert all(isinstance(b, Batch) for b in batches)
    assert sum(int(np.sum(b.target_lengths > 0)) for b in batches) == 3


# ---------------------------------------------------------------------------
# augmentation
# ---------------------------------------------------------------------------

def test_spec_augment_masks():
    rng = np.random.default_rng(0)
    spec = np.abs(rng.standard_normal((80, 120))).astype(np.float32) + 0.5
    out = spec_augment(spec, rng=np.random.default_rng(1))
    assert out.shape == spec.shape
    # at least one zeroed row or column region
    assert (np.any(np.all(out == 0, axis=1)) or np.any(np.all(out == 0, axis=0)))


def test_time_warp_preserves_shape_and_energy():
    rng = np.random.default_rng(2)
    spec = np.abs(rng.standard_normal((40, 60))).astype(np.float32)
    out = time_warp(spec, w_param=5, rng=np.random.default_rng(3))
    assert out.shape == spec.shape
    assert 0.5 < out.sum() / spec.sum() < 1.5


def test_sparse_image_warp_identity():
    img = np.arange(100, dtype=np.float32).reshape(10, 10)
    src = np.array([[5.0, 5.0]])
    out = sparse_image_warp(img, src, src)  # zero displacement
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_sparse_image_warp_shift():
    img = np.zeros((9, 21), np.float32)
    img[:, 10] = 1.0
    # move column 10 to column 12 => output should have the line near 12
    src = np.array([[4.0, 10.0]])
    dst = np.array([[4.0, 12.0]])
    out = sparse_image_warp(img, src, dst)
    assert out[4, 12] > 0.5
    assert out[4, 10] < out[4, 12]


def test_noise_injector(tmp_path):
    rng = np.random.default_rng(4)
    noise_dir = tmp_path / "noise"
    noise_dir.mkdir()
    save_wav(str(noise_dir / "n.wav"),
             rng.standard_normal(16000).astype(np.float32) * 0.3, 16000)
    inj = NoiseInjector(str(noise_dir), 16000, (0.4, 0.4),
                        rng=np.random.default_rng(5))
    y = np.zeros(8000, np.float32)
    y[0] = 1.0  # nonzero energy
    out = inj(y.copy())
    assert out.shape == y.shape
    assert np.std(out) > np.std(y) * 0  # noise added
    assert not np.allclose(out, y)


def test_tempo_gain_pipeline():
    from dsjax.audio.augment import AugmentPipeline
    from dsjax.config import AugmentationConfig

    cfg = AugmentationConfig(speed_volume_perturb=True, spec_augment=True)
    pipe = AugmentPipeline(cfg, SpectConfig(), seed=0)
    y = np.sin(2 * np.pi * 440 * np.arange(8000) / 16000).astype(np.float32)
    y2 = pipe.apply_waveform(y)
    assert y2.shape != y.shape or not np.allclose(y2, y)
    spec = np.abs(np.random.default_rng(0).standard_normal((161, 80))).astype(np.float32)
    spec2 = pipe.apply_spectrogram(spec)
    assert spec2.shape == spec.shape


def test_device_prefetcher_order_and_staging():
    from dsjax.data.loader import DevicePrefetcher

    items = list(range(10))
    put_calls = []

    def put_fn(b):
        put_calls.append(b)
        return ("staged", b)

    out = list(DevicePrefetcher(items, put_fn, depth=2))
    assert [b for b, _ in out] == items            # order preserved
    assert [s for _, s in out] == [("staged", b) for b in items]
    assert put_calls == items                      # staged exactly once each


def test_device_prefetcher_list_batches_not_staged():
    from dsjax.data.loader import DevicePrefetcher

    # ragged_split pipelines yield lists; those go down the accum path,
    # which stages per sub-batch itself
    items = [[1, 2], 3, [4, 5]]
    out = list(DevicePrefetcher(items, lambda b: ("staged", b), depth=2))
    assert out[0] == ([1, 2], None)
    assert out[1] == (3, ("staged", 3))
    assert out[2] == ([4, 5], None)


def test_device_prefetcher_early_exit_stops_producer():
    import time as _time

    from dsjax.data.loader import DevicePrefetcher

    staged = []

    def put_fn(b):
        staged.append(b)
        return b

    pf = DevicePrefetcher(iter(range(1000)), put_fn, depth=2)
    it = iter(pf)
    next(it)
    pf.close()
    it.close()  # generator finalizer drains and unblocks the producer
    _time.sleep(0.2)
    n = len(staged)
    _time.sleep(0.2)
    assert len(staged) == n        # producer actually stopped
    assert n <= 6                  # bounded read-ahead, not the whole range


def test_device_prefetcher_propagates_errors():
    import pytest as _pytest

    from dsjax.data.loader import DevicePrefetcher

    def gen():
        yield 1
        raise RuntimeError("boom")

    out = []
    with _pytest.raises(RuntimeError, match="boom"):
        for b, s in DevicePrefetcher(gen(), lambda b: b):
            out.append(b)
    assert out == [1]


def test_device_prefetcher_depth1_early_exit_no_deadlock():
    # regression: at depth=1 the producer's sentinel put could block
    # forever after an early consumer exit (queue refilled by the
    # producer's in-flight item put right after the consumer drained)
    from dsjax.data.loader import DevicePrefetcher

    pf = DevicePrefetcher(iter(range(1000)), lambda b: b, depth=1)
    it = iter(pf)
    next(it)
    pf.close()
    it.close()
    pf._thread.join(timeout=10.0)
    assert not pf._thread.is_alive()


def test_ragged_split_pad_quantum():
    """ragged sub-batches keep batch rows divisible by the data-shard
    quantum (put_batch shards dim 0 over the mesh data axis; an
    indivisible sub-batch would raise at device_put)."""
    from dsjax.data.loader import DataPipeline

    class FakeDS:
        device_features = False

        def __init__(self, lens):
            self.lens = lens

        def __len__(self):
            return len(self.lens)

        def __getitem__(self, i):
            return np.zeros((161, self.lens[i]), np.float32), [1, 2]

    ds = FakeDS([20 + 3 * i for i in range(8)])
    sampler = OrderedBatchSampler(8, batch_size=8)
    pipe = DataPipeline(ds, sampler, bucket_frames=8, bucket_labels=4,
                        num_workers=1, prefetch=1, pad_to_batch=8,
                        ragged_split=3, pad_quantum=4)
    (subs,) = list(pipe)
    assert isinstance(subs, list)
    assert all(b.size % 4 == 0 for b in subs)
    assert sum(int(b.valid.sum()) for b in subs) == 8
