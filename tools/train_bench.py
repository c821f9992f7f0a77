#!/usr/bin/env python
"""Manifest-fed END-TO-END training throughput benchmark.

bench.py (repo root) measures the compute graph with synthetic batches
generated ON DEVICE — zero bytes cross the host boundary. This tool proves
the FRAMEWORK number the way the reference trains (its whole hot loop is
manifest-fed, reference loader/data_loader.py:189-279): wav files on disk
-> manifest -> SpectrogramDataset (device-feature int16 raw-audio mode,
on-device SpecAugment) -> threaded DataPipeline (load, pad, collate) ->
host->device transfer -> jitted train step. It reports each stage's
SUSTAINED rate so the binding constraint is visible:

  host_utt_s    input pipeline alone (disk -> collated batches)
  upload_utt_s  host->device transfer alone (put_batch + sync)
  step_utt_s    compiled train step alone (pre-staged device batches)
  e2e_utt_s     the real overlapped loop (what a user sees)

On hardware where the accelerator is reached through a low-bandwidth
tunnel (this dev box: ~44 MB/s), e2e is transfer-bound and upload_utt_s
~= e2e_utt_s; on a co-located TPU host (PCIe/DMA, GBs/s) the transfer
term vanishes and e2e -> min(host_utt_s, step_utt_s).

It also reports the HONEST ragged numbers for the duration mix it was
given: ``pad_efficiency`` (algorithmic FLOPs on real frames / FLOPs the
padded batches actually compute, over a full epoch of batches) and
``step_mfu`` (real-frame FLOPs per second of the compiled step, measured
over staged batches sampled across the epoch's length range — so short
AND long batches are represented). Run with a wide duration spread
(e.g. DSJAX_BENCH_SEC_MIN=2 DSJAX_BENCH_SEC_MAX=16) to measure what
duration-sorted bin sampling actually achieves on a realistic corpus,
and with DSJAX_BENCH_SHUFFLE=1 to measure the pathological unsorted
floor on the same data.

Env knobs:
  DSJAX_BENCH_BATCH=N     batch size            (default 64)
  DSJAX_BENCH_UTTS=N      dataset size          (default 512)
  DSJAX_BENCH_SEC_MIN/MAX utterance duration    (default 8.0 / 10.24 s)
  DSJAX_BENCH_AUG=0       disable on-device SpecAugment (default on)
  DSJAX_BENCH_EPOCHS=N    timed epochs          (default 3)
  DSJAX_BENCH_DATA=dir    dataset cache dir     (default /tmp/dsjax_train_bench)
  DSJAX_BENCH_SHUFFLE=1   fully-shuffled batches (ignore duration sorting)
  DSJAX_BENCH_HOST_ONLY=1 stop after the host-pipeline + padding-efficiency
                          stage (no device work — cheap large-corpus runs)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCH = int(os.environ.get("DSJAX_BENCH_BATCH", "64"))
N_UTTS = int(os.environ.get("DSJAX_BENCH_UTTS", "512"))
SEC_MIN = float(os.environ.get("DSJAX_BENCH_SEC_MIN", "8.0"))
SEC_MAX = float(os.environ.get("DSJAX_BENCH_SEC_MAX", "10.24"))
AUG = os.environ.get("DSJAX_BENCH_AUG", "1") not in ("", "0")
EPOCHS = int(os.environ.get("DSJAX_BENCH_EPOCHS", "3"))
DATA_DIR = os.environ.get("DSJAX_BENCH_DATA", "/tmp/dsjax_train_bench")
HIDDEN = int(os.environ.get("DSJAX_BENCH_HIDDEN", "1024"))
LAYERS = int(os.environ.get("DSJAX_BENCH_LAYERS", "5"))
PRECISION = int(os.environ.get("DSJAX_BENCH_PRECISION", "16"))
SHUFFLE = os.environ.get("DSJAX_BENCH_SHUFFLE", "") not in ("", "0")
HOST_ONLY = os.environ.get("DSJAX_BENCH_HOST_ONLY", "") not in ("", "0")

WORDS = ("THE QUICK BROWN FOX JUMPS OVER LAZY DOG SPEECH MODEL TRAINING "
         "BENCHMARK AUDIO SIGNAL FRAME BATCH DEVICE KERNEL").split()


def make_dataset(root: str) -> str:
    """Synthesize a LibriSpeech-shaped on-disk dataset (16-bit PCM wavs +
    transcripts + duration-sorted manifest); cached across runs."""
    from dsjax.audio.io import save_wav

    manifest = os.path.join(root, "manifest.json")
    stamp = os.path.join(root, ".stamp")
    key = f"{N_UTTS}:{SEC_MIN}:{SEC_MAX}"
    if os.path.exists(stamp) and open(stamp).read() == key:
        return manifest
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    os.makedirs(os.path.join(root, "txt"), exist_ok=True)
    rng = np.random.default_rng(0)
    sr = 16000
    entries = []
    for i in range(N_UTTS):
        dur = float(rng.uniform(SEC_MIN, SEC_MAX))
        n = int(sr * dur)
        t = np.arange(n) / sr
        f0 = float(rng.uniform(80, 300))
        y = (0.15 * np.sin(2 * np.pi * f0 * t)
             + 0.05 * np.sin(2 * np.pi * 3.1 * f0 * t)
             + 0.02 * rng.standard_normal(n)).astype(np.float32)
        save_wav(os.path.join(root, "wav", f"u{i:05d}.wav"), y, sr)
        n_words = max(4, int(dur * 2.5))  # ~14 chars/s, LibriSpeech-like
        text = " ".join(rng.choice(WORDS) for _ in range(n_words))
        with open(os.path.join(root, "txt", f"u{i:05d}.txt"), "w") as f:
            f.write(text)
        entries.append((dur, {"wav_path": f"wav/u{i:05d}.wav",
                              "transcript_path": f"txt/u{i:05d}.txt"}))
    entries.sort(key=lambda e: e[0])  # duration-sorted (reference manifests)
    with open(manifest, "w") as f:
        json.dump({"root_path": root, "samples": [e[1] for e in entries]}, f)
    with open(stamp, "w") as f:
        f.write(key)
    return manifest


def sync_scalar(x) -> None:
    """Through the tunnel block_until_ready returns before the device is
    done; fetching a scalar is the only reliable sync point."""
    np.asarray(x).ravel()[:1]
    float(np.asarray(x).ravel()[0])


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # the axon TPU plugin ignores the env var; jax.config wins
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    try:  # persistent compile cache: repeat runs skip the multi-minute
        # tunnel compiles
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/dsjax_jax_cache"))
    except Exception:
        pass

    from dsjax.config import TrainConfig, compose
    from dsjax.data.dataset import SpectrogramDataset
    from dsjax.data.loader import DataPipeline
    from dsjax.data.sampler import BucketBatchSampler
    from dsjax.labels import DEFAULT_LABELS
    from dsjax.train.loop import Trainer

    import bench as _bench  # repo-root FLOPs model: single source of truth
    _bench.HIDDEN, _bench.LAYERS = HIDDEN, LAYERS
    flops_of = _bench.model_train_flops_per_utt
    peak = _bench.chip_peak_flops()

    manifest = make_dataset(DATA_DIR)
    overrides = [
        f"model.hidden_size={HIDDEN}", f"model.hidden_layers={LAYERS}",
        f"trainer.precision={PRECISION}",
        f"data.batch_size={BATCH}",
        "data.bucket_labels=256",
        "data.num_workers=8", "data.prefetch_batches=4",
    ]
    if os.environ.get("DSJAX_BENCH_BUCKET_FRAMES"):
        # explicit sweep value; default = whatever DataConfig ships
        overrides.append(
            f"data.bucket_frames={os.environ['DSJAX_BENCH_BUCKET_FRAMES']}")
    if AUG:
        overrides += ["data.augmentation.spec_augment=true",
                      "data.augmentation.spec_augment_device=true"]
    cfg = compose(TrainConfig, overrides)
    ds = SpectrogramDataset(cfg.data.spect, manifest, DEFAULT_LABELS,
                            normalize=True,
                            aug_cfg=cfg.data.augmentation if AUG else None,
                            seed=cfg.seed, device_features=True)
    assert ds.device_features, "benchmark requires the raw-audio device path"
    if SHUFFLE:
        class _ShuffledSampler(BucketBatchSampler):
            """Pathological contrast: fully-shuffled batches that ignore
            the duration-sorted manifest order (what a naive random
            sampler pays in padding)."""

            def __iter__(self):
                rng = np.random.default_rng(self.seed + self.epoch)
                order = rng.permutation(self.dataset_size)
                for i in range(0, len(order), self.batch_size):
                    yield [int(j) for j in order[i:i + self.batch_size]]

        sampler = _ShuffledSampler(len(ds), BATCH, seed=cfg.seed)
    else:
        sampler = BucketBatchSampler(len(ds), BATCH, seed=cfg.seed)

    from dsjax.audio.features import stft_params
    hop = stft_params(cfg.data.spect)[1]
    def batch_flops(batch):
        """(real, padded) algorithmic train FLOPs for one padded batch."""
        valid = batch.valid_mask.astype(bool)
        real = float(sum(flops_of(int(t))
                         for t in batch.input_lengths[valid]))
        pad_t = (batch.audio.shape[1] // hop - 1 if batch.audio is not None
                 else batch.inputs.shape[-1])
        return real, batch.size * flops_of(int(pad_t))

    mk_pipe = lambda: DataPipeline(
        ds, sampler, bucket_frames=cfg.data.bucket_frames,
        bucket_labels=cfg.data.bucket_labels,
        num_workers=cfg.data.num_workers,
        prefetch=cfg.data.prefetch_batches, pad_to_batch=BATCH)

    if not HOST_ONLY:
        trainer = Trainer(cfg, list(DEFAULT_LABELS))
        state = trainer.init_state()

    # --- host pipeline alone (measure AFTER OS page cache is warm) -------
    for _ in mk_pipe():
        pass
    n_batches = (len(ds) + BATCH - 1) // BATCH
    cache_stride = max(1, n_batches // 4)
    t0 = time.perf_counter()
    n = 0
    cached_batches = []   # sampled ACROSS the epoch so the staged-step
    real_fl = pad_fl = 0.0  # measurement sees short and long batches alike
    for bi, batch in enumerate(mk_pipe()):
        n += int(batch.valid_mask.sum())
        r, p = batch_flops(batch)
        real_fl += r
        pad_fl += p
        if bi % cache_stride == 0 and len(cached_batches) < 4:
            cached_batches.append(batch)
    host_dt = time.perf_counter() - t0
    host_rate = n / host_dt
    pad_eff = real_fl / pad_fl
    print(f"# host pipeline: {host_rate:.1f} utt/s "
          f"({n} utts in {host_dt:.2f}s)", flush=True)
    print(f"# padding efficiency: {pad_eff:.3f} (real/computed FLOPs over "
          f"{n_batches} batches, durations {SEC_MIN}-{SEC_MAX}s, "
          f"{'SHUFFLED' if SHUFFLE else 'duration-sorted bins'})", flush=True)
    if HOST_ONLY:
        print(json.dumps({
            "metric": f"train_host_pipeline_b{BATCH}",
            "value": round(host_rate, 2), "unit": "utterances/sec",
            "sec_min": SEC_MIN, "sec_max": SEC_MAX, "shuffle": SHUFFLE,
            "n_utts": N_UTTS, "pad_efficiency": round(pad_eff, 4),
        }))
        return

    # --- upload alone ----------------------------------------------------
    args0 = trainer.put_batch(cached_batches[0])
    sync_scalar(args0[1])
    bytes_per_batch = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                          for a in args0)
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        args = trainer.put_batch(cached_batches[0])
        sync_scalar(args[1])
    up_dt = (time.perf_counter() - t0) / reps
    up_rate = BATCH / up_dt
    print(f"# upload: {up_rate:.1f} utt/s ({bytes_per_batch / 1e6:.1f} MB "
          f"per batch, {bytes_per_batch / up_dt / 1e6:.0f} MB/s)", flush=True)

    # --- warmup epoch: compile every bucket shape ------------------------
    t0 = time.perf_counter()
    seen = set()
    for batch in mk_pipe():
        state, loss = trainer.train_step(state, batch)
        x = batch.inputs if batch.inputs is not None else batch.audio
        seen.add((x.shape, batch.targets.shape))
    sync_scalar(loss)
    print(f"# warmup epoch: {len(seen)} shapes, "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    # --- device step alone (pre-staged batches, no host/transfer work) ---
    staged = [trainer.put_batch(b) for b in cached_batches]
    sync_scalar(staged[-1][1])
    n_steps = 12
    state, loss = trainer.train_step(state, cached_batches[0])  # warm key
    sync_scalar(loss)
    step_real_fl = step_utts = 0.0
    t0 = time.perf_counter()
    for i in range(n_steps):
        b = cached_batches[i % len(staged)]
        args = staged[i % len(staged)]
        key = (args[0].shape, args[2].shape)
        state, loss = trainer._compiled[key](state, *args)
        step_real_fl += batch_flops(b)[0]
        step_utts += float(b.valid_mask.sum())
    sync_scalar(loss)
    step_wall = time.perf_counter() - t0
    step_dt = step_wall / n_steps
    step_rate = step_utts / step_wall
    step_mfu = step_real_fl / step_wall / peak
    print(f"# device step: {step_rate:.1f} utt/s "
          f"({step_dt * 1000:.0f} ms/step, honest MFU {step_mfu:.3f} "
          f"over {len(staged)} epoch-spread batch shapes)", flush=True)

    # --- the real end-to-end loop ----------------------------------------
    from dsjax.data.loader import DevicePrefetcher

    def run_e2e(device_prefetch: bool):
        nonlocal state
        t0 = time.perf_counter()
        n = 0
        for ep in range(EPOCHS):
            sampler.set_epoch(ep + 1)
            if device_prefetch:
                it = DevicePrefetcher(mk_pipe(), trainer.put_batch)
            else:
                it = ((b, None) for b in mk_pipe())
            for batch, staged in it:
                _, loss = trainer.train_step(state, batch, staged=staged)
                state = _
                n += int(batch.valid_mask.sum())
        sync_scalar(loss)
        return n, time.perf_counter() - t0

    if os.environ.get("DSJAX_BENCH_E2E_AB", "") not in ("", "0"):
        # same-process A/B: shares one tunnel session, so the comparison
        # is not confounded by run-to-run tunnel bandwidth variance
        n0, dt0 = run_e2e(False)
        print(f"# e2e (no device prefetch): {n0 / dt0:.1f} utt/s "
              f"({n0} utts in {dt0:.2f}s)", flush=True)
    n, e2e_dt = run_e2e(True)
    e2e_rate = n / e2e_dt
    print(f"# e2e: {e2e_rate:.1f} utt/s ({n} utts in {e2e_dt:.2f}s)",
          flush=True)

    print(json.dumps({
        "metric": f"train_e2e_manifest_b{BATCH}",
        "value": round(e2e_rate, 2),
        "unit": "utterances/sec/chip",
        "host_utt_s": round(host_rate, 1),
        "upload_utt_s": round(up_rate, 1),
        "step_utt_s": round(step_rate, 1),
        "e2e_utt_s": round(e2e_rate, 1),
        "batch": BATCH,
        "augment": AUG,
        "mb_per_batch": round(bytes_per_batch / 1e6, 1),
        "sec_min": SEC_MIN,
        "sec_max": SEC_MAX,
        "shuffle": SHUFFLE,
        "pad_efficiency": round(pad_eff, 4),
        "step_mfu": round(step_mfu, 4),
    }))


if __name__ == "__main__":
    main()
