"""Device-feature input pipeline: STFT inside the compiled step must match
the host-feature path end to end."""

import json
import os

import numpy as np
import pytest

import jax

from dsjax.audio.io import save_wav
from dsjax.config import SpectConfig, TrainConfig, compose
from dsjax.data.dataset import SpectrogramDataset, collate, collate_audio
from dsjax.data.loader import DataPipeline
from dsjax.data.sampler import OrderedBatchSampler
from dsjax.labels import DEFAULT_LABELS
from dsjax.train.loop import Trainer


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsfeat")
    (root / "wav").mkdir()
    (root / "txt").mkdir()
    rng = np.random.default_rng(0)
    samples = []
    for i, dur in enumerate([0.3, 0.45, 0.25, 0.5]):
        y = (0.2 * np.sin(2 * np.pi * (150 + 60 * i) *
                          np.arange(int(16000 * dur)) / 16000)
             + 0.02 * rng.standard_normal(int(16000 * dur))).astype(np.float32)
        save_wav(str(root / "wav" / f"u{i}.wav"), y, 16000)
        (root / "txt" / f"u{i}.txt").write_text(["AB", "BA", "AB C", "CAB"][i])
        samples.append({"wav_path": f"wav/u{i}.wav", "transcript_path": f"txt/u{i}.txt"})
    manifest = root / "manifest.json"
    manifest.write_text(json.dumps({"root_path": str(root), "samples": samples}))
    return str(manifest)


def test_device_batch_matches_host_features(dataset_dir):
    host_ds = SpectrogramDataset(SpectConfig(), dataset_dir, DEFAULT_LABELS,
                                 device_features=False)
    dev_ds = SpectrogramDataset(SpectConfig(), dataset_dir, DEFAULT_LABELS,
                                device_features=True)
    host_batch = collate([host_ds[i] for i in range(4)], bucket_frames=16)
    dev_batch = collate_audio([dev_ds[i] for i in range(4)],
                              hop=dev_ds.extractor.hop, bucket_frames=16)
    np.testing.assert_array_equal(host_batch.input_lengths, dev_batch.input_lengths)
    np.testing.assert_array_equal(host_batch.targets, dev_batch.targets)
    from dsjax.audio.features import spectrogram_jax

    feats = np.asarray(spectrogram_jax(dev_batch.audio, dev_batch.input_lengths,
                                       SpectConfig(), normalize=True))
    t = host_batch.inputs.shape[2]
    np.testing.assert_allclose(feats[:, :, :t], host_batch.inputs,
                               rtol=2e-3, atol=2e-3)


def test_train_step_from_audio(dataset_dir):
    cfg = compose(TrainConfig, [
        "model.hidden_size=16", "model.hidden_layers=1",
        "trainer.precision=32", "data.batch_size=4",
        "data.bucket_frames=16", "data.bucket_labels=4",
    ])
    ds = SpectrogramDataset(cfg.data.spect, dataset_dir, DEFAULT_LABELS,
                            device_features=True)
    assert ds.device_features
    pipe = DataPipeline(ds, OrderedBatchSampler(len(ds), 4), bucket_frames=16,
                        bucket_labels=4, num_workers=1)
    batch = next(iter(pipe))
    assert batch.inputs is None and batch.audio is not None

    import jax as _jax

    trainer = Trainer(cfg, DEFAULT_LABELS,
                      mesh=__import__("dsjax.parallel.mesh", fromlist=["make_mesh"]
                                      ).make_mesh(1, 1, devices=_jax.devices()[:1]))
    state = trainer.init_state()
    losses = []
    for _ in range(6):
        state, loss = trainer.train_step(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # eval path from audio
    out, out_lens = trainer.eval_step(state, batch)
    assert np.asarray(out).shape[0] == 4


def test_specaugment_forces_host_features(dataset_dir):
    from dsjax.config import AugmentationConfig

    ds = SpectrogramDataset(SpectConfig(), dataset_dir, DEFAULT_LABELS,
                            aug_cfg=AugmentationConfig(spec_augment=True),
                            device_features=True)
    assert not ds.device_features
    spect, transcript = ds[0]
    assert spect.ndim == 2
    # ... unless the on-device variant is requested
    ds2 = SpectrogramDataset(SpectConfig(), dataset_dir, DEFAULT_LABELS,
                             aug_cfg=AugmentationConfig(
                                 spec_augment=True, spec_augment_device=True),
                             device_features=True)
    assert ds2.device_features


def test_device_spec_augment_masks():
    import jax

    from dsjax.audio.augment import spec_augment_device

    rng = np.random.default_rng(0)
    spec = np.abs(rng.standard_normal((3, 64, 100))).astype(np.float32) + 0.5
    valid = np.array([100, 60, 100], np.int32)
    out = np.asarray(spec_augment_device(spec, valid, jax.random.PRNGKey(1),
                                         freq_mask_param=20, time_mask_param=30))
    assert out.shape == spec.shape
    # masks zero contiguous bands per sample
    zero_rows = [(np.all(out[b] == 0, axis=1)).sum() for b in range(3)]
    zero_cols = [(np.all(out[b] == 0, axis=0)).sum() for b in range(3)]
    assert any(z > 0 for z in zero_rows) or any(z > 0 for z in zero_cols)
    # deterministic per key
    out2 = np.asarray(spec_augment_device(spec, valid, jax.random.PRNGKey(1),
                                          freq_mask_param=20, time_mask_param=30))
    np.testing.assert_array_equal(out, out2)


def test_train_step_with_device_augment(dataset_dir):
    cfg = compose(TrainConfig, [
        "model.hidden_size=16", "model.hidden_layers=1",
        "trainer.precision=32", "data.batch_size=4",
        "data.bucket_frames=16", "data.bucket_labels=4",
        "data.augmentation.spec_augment=true",
        "data.augmentation.spec_augment_device=true",
    ])
    ds = SpectrogramDataset(cfg.data.spect, dataset_dir, DEFAULT_LABELS,
                            aug_cfg=cfg.data.augmentation, device_features=True)
    assert ds.device_features
    pipe = DataPipeline(ds, OrderedBatchSampler(len(ds), 4), bucket_frames=16,
                        bucket_labels=4, num_workers=1)
    batch = next(iter(pipe))
    import jax as _jax

    from dsjax.parallel.mesh import make_mesh

    trainer = Trainer(cfg, DEFAULT_LABELS,
                      mesh=make_mesh(1, 1, devices=_jax.devices()[:1]))
    state = trainer.init_state()
    state, loss = trainer.train_step(state, batch)
    assert np.isfinite(float(loss))


def test_ragged_split_pipeline_and_step(dataset_dir):
    """data.ragged_split: the pipeline yields length-quantile sub-batches
    (each padded to its own bucketed max) and the trainer folds them into
    one summed-grad optimizer step."""
    cfg = compose(TrainConfig, [
        "model.hidden_size=16", "model.hidden_layers=1",
        "trainer.precision=32", "data.batch_size=4",
        "data.bucket_frames=16", "data.bucket_labels=4",
        "data.ragged_split=2",
    ])
    ds = SpectrogramDataset(cfg.data.spect, dataset_dir, DEFAULT_LABELS,
                            device_features=True)
    pipe = DataPipeline(ds, OrderedBatchSampler(len(ds), 4), bucket_frames=16,
                        bucket_labels=4, num_workers=1, pad_to_batch=4,
                        ragged_split=cfg.data.ragged_split)
    batch = next(iter(pipe))
    assert isinstance(batch, list) and len(batch) == 2
    longs, shorts = batch
    assert longs.size == shorts.size == 2  # pad_to_batch split across blocks
    lmin = longs.input_lengths[longs.valid].min()
    smax = shorts.input_lengths[shorts.valid].max()
    assert lmin >= smax  # length-partitioned blocks
    # shorter block pads to a smaller bucketed signal length
    assert shorts.audio.shape[1] <= longs.audio.shape[1]

    import jax as _jax

    from dsjax.parallel.mesh import make_mesh

    trainer = Trainer(cfg, DEFAULT_LABELS,
                      mesh=make_mesh(1, 1, devices=_jax.devices()[:1]))
    state = trainer.init_state()
    step0 = int(np.asarray(state.step))
    state, loss = trainer.train_step_accum(state, batch)
    assert np.isfinite(float(loss))
    assert int(np.asarray(state.step)) == step0 + 1  # ONE optimizer step
