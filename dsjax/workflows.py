"""Workflow layer: train / evaluate / transcribe orchestration.

Reference parity: deepspeech_pytorch/training.py:13-47 (train),
testing.py:12-50 (evaluate), inference.py:44-76 (transcribe). Each function
takes a composed config and wires data + model + runtime.
"""

from __future__ import annotations

import json
import os
from typing import List, Tuple

import numpy as np

from dsjax.config import (EvalConfig, TrainConfig, TranscribeConfig)
from dsjax.data.dataset import SpectrogramDataset
from dsjax.data.loader import DataPipeline
from dsjax.data.sampler import (BucketBatchSampler, DistributedBucketSampler,
                                DistributedOrderedSampler, OrderedBatchSampler)
from dsjax.inference import decode_results, load_decoder, load_model, run_transcribe
from dsjax.labels import load_labels
from dsjax.train.checkpoint import CheckpointHandler, find_latest_checkpoint_dir
from dsjax.train.loop import Trainer
from dsjax.train.metrics import CharErrorRate, WordErrorRate, update_batch


def _pipelines(cfg: TrainConfig, labels: List[str], dp: int
               ) -> Tuple[DataPipeline, DataPipeline]:
    import jax

    train_ds = SpectrogramDataset(cfg.data.spect, cfg.data.train_path, labels,
                                  normalize=True, aug_cfg=cfg.data.augmentation,
                                  seed=cfg.seed,
                                  device_features=cfg.data.device_features)
    val_ds = SpectrogramDataset(cfg.data.spect, cfg.data.val_path, labels,
                                normalize=True,
                                device_features=cfg.data.device_features)
    n_proc = jax.process_count()
    if n_proc > 1:
        train_sampler = DistributedBucketSampler(
            len(train_ds), cfg.data.batch_size, seed=cfg.seed,
            num_replicas=n_proc, rank=jax.process_index())
        val_sampler = DistributedOrderedSampler(
            len(val_ds), cfg.data.batch_size, seed=cfg.seed,
            num_replicas=n_proc, rank=jax.process_index())
    else:
        train_sampler = BucketBatchSampler(len(train_ds), cfg.data.batch_size,
                                           seed=cfg.seed)
        val_sampler = OrderedBatchSampler(len(val_ds), cfg.data.batch_size,
                                          seed=cfg.seed)

    # each host feeds its shard of the global batch; pad the HOST batch to a
    # multiple of the data-axis shards this host owns (dp // n_proc)
    local_dp = max(1, dp // n_proc)
    pad_b = -(-cfg.data.batch_size // local_dp) * local_dp
    mk = lambda ds, sampler, split: DataPipeline(
        ds, sampler, bucket_frames=cfg.data.bucket_frames,
        bucket_labels=cfg.data.bucket_labels,
        num_workers=cfg.data.num_workers, prefetch=cfg.data.prefetch_batches,
        pad_to_batch=pad_b, ragged_split=split, pad_quantum=local_dp)
    return (mk(train_ds, train_sampler, cfg.data.ragged_split),
            mk(val_ds, val_sampler, 1))


def _resume_explicit(path: str, state):
    """trainer.resume_from_checkpoint: restore full state from a dsjax
    checkpoint path, or warm-start weights from a reference torch .ckpt
    (reference README.md:231-235; lightning resume_from_checkpoint)."""
    import jax

    if os.path.isfile(path) and path.endswith(".ckpt"):
        from dsjax.model.torch_import import import_checkpoint

        imported = import_checkpoint(path)
        want = jax.tree_util.tree_map(lambda x: x.shape, state.params)
        got = jax.tree_util.tree_map(lambda x: x.shape, imported["params"])
        if want != got:
            raise ValueError(
                f"checkpoint {path} does not match the configured model "
                f"(set model.hidden_size/hidden_layers/rnn_type to the "
                f"checkpoint's): {got} vs {want}")
        print(f"warm-started weights from {path} (fresh optimizer state)")
        cast = lambda new, old: jax.tree_util.tree_map(
            lambda n, o: np.asarray(n, dtype=o.dtype), new, old)
        return state.replace(
            params=cast(imported["params"], state.params),
            batch_stats=cast(imported["batch_stats"], state.batch_stats)), {}
    from dsjax.train.checkpoint import restore_from_path

    state, extra = restore_from_path(path, state)
    print(f"resumed from {path} at step {int(np.asarray(state.step))}")
    return state, extra


def apply_platform(platform: str, num_cpu_devices: int = 0) -> None:
    """Force the jax platform BEFORE first device use (no-op defaults).

    jax.config wins over the JAX_PLATFORMS env var, which TPU PJRT
    plugins may override — so the config field is the only CPU override
    that sticks under every launcher."""
    if platform or num_cpu_devices:
        import jax

        if platform:
            jax.config.update("jax_platforms", platform)
        if num_cpu_devices:
            jax.config.update("jax_num_cpu_devices", num_cpu_devices)


def train(cfg: TrainConfig) -> None:
    """Full training workflow (reference: training.py:13-47)."""
    from dsjax.parallel.distributed import initialize as dist_initialize

    apply_platform(cfg.trainer.platform, cfg.trainer.num_cpu_devices)
    # join the multi-host cluster BEFORE any device use (no-op single-host);
    # replaces the reference's TorchElastic+etcd rendezvous (README.md:154-189)
    dist_initialize()
    np.random.seed(cfg.seed % (2 ** 32))
    labels = load_labels(cfg.data.labels_path if os.path.isfile(cfg.data.labels_path)
                         else None)
    trainer = Trainer(cfg, labels)
    ckpt_dir = cfg.checkpoint.dirpath or os.path.join(os.getcwd(), "checkpoints")
    handler = CheckpointHandler(ckpt_dir, monitor=cfg.checkpoint.monitor,
                                save_top_k=cfg.checkpoint.save_top_k,
                                save_last=cfg.checkpoint.save_last,
                                cfg=cfg, labels=labels,
                                verbose=cfg.checkpoint.verbose)
    state = trainer.init_state()
    resume_extra = {}
    # auto-resume WINS over an explicit resume_from_checkpoint when the
    # run's own dirpath already holds a checkpoint (reference
    # training.py:24-27 overwrites resume_from_checkpoint the same way):
    # an elastically relaunched fine-tune must continue from ITS latest
    # save, not restart from the original warm-start point
    explicit = cfg.trainer.resume_from_checkpoint
    if cfg.load_auto_checkpoint and handler.latest_step() is not None:
        explicit = ""
    if explicit:
        state, resume_extra = _resume_explicit(explicit, state)
    elif cfg.load_auto_checkpoint:
        latest = find_latest_checkpoint_dir(ckpt_dir)
        if latest is not None:
            try:
                state = handler.restore(state, best=False)
                resume_extra = handler.restore_extra()
                print(f"auto-resumed from step {int(np.asarray(state.step))}")
            except FileNotFoundError:
                pass
    train_pipe, val_pipe = _pipelines(cfg, labels, trainer.dp)
    if resume_extra.get("start_index"):
        # mid-epoch resume: skip the bins already consumed this epoch
        train_pipe.sampler.start_index = int(resume_extra["start_index"])
    # default-on run metrics: metrics.jsonl + TensorBoard event files
    # (reference logs every run via Lightning's TensorBoardLogger by
    # default, configs/lightning_config.py:28-30); process 0 only in
    # multi-host runs — metrics are already globally reduced there
    metrics_logger = None
    import jax

    if cfg.trainer.log_dir and jax.process_index() == 0:
        from dsjax.train.logging import MetricsLogger

        metrics_logger = MetricsLogger(cfg.trainer.log_dir)
        print(f"logging metrics to {metrics_logger.path}")
    try:
        trainer.fit(train_pipe, val_pipe, checkpoint_handler=handler,
                    state=state, metrics_logger=metrics_logger)
    finally:
        if metrics_logger is not None:
            metrics_logger.close()
        handler.close()


def evaluate(cfg: EvalConfig) -> Tuple[float, float]:
    """Evaluation workflow (reference: testing.py:12-50). Returns (wer, cer).

    Throughput: samples load/parse on a prefetch thread pool while the
    device runs the previous batch; the batch dim is padded to a constant
    so XLA compiles one program per time bucket; host beam decode of batch
    k overlaps the device forward of batch k+1."""
    import time as _time

    apply_platform(cfg.platform, cfg.num_cpu_devices)
    bundle = load_model(cfg.model.model_path, cfg.model.precision)
    decoder = load_decoder(bundle.labels, cfg.lm)
    target_decoder = load_decoder(bundle.labels, type(cfg.lm)())  # greedy
    dev_feats = cfg.device_features
    if dev_feats:
        from dsjax.audio.features import stft_params

        n_fft, hop, _ = stft_params(bundle.spect_cfg)
        if n_fft != 2 * hop:  # device framing assumes 50% window overlap
            print("device_features disabled: window overlap != 50%")
            dev_feats = False
    import jax

    ds = SpectrogramDataset(bundle.spect_cfg, cfg.test_path, bundle.labels,
                            normalize=True, device_features=dev_feats)
    sampler = OrderedBatchSampler(len(ds), cfg.batch_size)
    # multi-chip host: pad the batch dim to a device-count multiple so the
    # bundle's data-parallel forward engages (it shards batches over all
    # local chips; the reference evaluates on one GPU)
    n_dev = len(jax.devices()) if bundle.mesh is not None else 1
    pad_b = -(-cfg.batch_size // n_dev) * n_dev
    pipe = DataPipeline(ds, sampler, bucket_frames=64, bucket_labels=64,
                        num_workers=cfg.num_workers, prefetch=2,
                        pad_to_batch=pad_b)
    wer, cer = WordErrorRate(), CharErrorRate()
    t0 = _time.time()
    n_utts = 0
    pending = None  # (device arrays, batch) — decode overlaps next forward

    def finish(pending):
        probs, out_lens, batch = pending
        n_real = int(batch.valid_mask.sum()) or batch.size
        if getattr(decoder, "accepts_device_arrays", False):
            # device decoder (greedy / device beam): keep posteriors on
            # device — no host round-trip — and decode the FULL padded
            # batch so the jitted scan sees one stable shape (pad rows
            # have zero length and decode to ""); slice on the host
            # n_best=1: WER needs only the top hypothesis — the device
            # beam then backtracks/transfers ONE char stream per utterance
            # instead of beam_width of them (measured +50% decode
            # throughput at width 128 through the tunnel)
            decoded, _ = decoder.decode(probs, out_lens, n_best=1)
            decoded = decoded[:n_real]
        else:
            decoded, _ = decoder.decode(np.asarray(probs)[:n_real],
                                        np.asarray(out_lens)[:n_real],
                                        n_best=1)
        refs = target_decoder.convert_to_strings(
            [batch.targets[b, :batch.target_lengths[b]] for b in range(n_real)])
        transcripts = [d[0] for d in decoded]
        references = [r[0] for r in refs]
        update_batch(wer, cer, transcripts, references)
        if cfg.verbose:
            for t, r in zip(transcripts, references):
                print(f"Ref:  {r}\nHyp:  {t}\n")
        return n_real

    # stage uploads ahead: the transfer of batch k+1 rides under the
    # forward/decode of batch k (same pattern as Trainer.fit's
    # DevicePrefetcher; evaluate is single-process)
    from dsjax.data.loader import DevicePrefetcher

    def _stage(batch):
        x = batch.inputs if batch.inputs is not None else batch.audio
        # multi-chip host: place each batch straight into the bundle's
        # data-parallel sharding so the forward never reshards
        sh = (bundle.batch_sharding
              if getattr(bundle, "_dp", lambda b: False)(x.shape[0])
              else None)
        if sh is not None:
            return (jax.device_put(x, sh),
                    jax.device_put(np.asarray(batch.input_lengths,
                                              np.int32), sh))
        return (jax.device_put(x), jax.device_put(batch.input_lengths))

    t_warm = None   # time after the FIRST batch fully finishes: everything
    n_warm = 0      # before it is XLA compile / program+cache load, not eval
    for batch, staged in DevicePrefetcher(pipe, _stage):
        # eval pipelines never ragged_split, so every item is staged
        x, lens = staged
        probs, out_lens, _ = bundle.forward(x, lens)
        if pending is not None:
            n_utts += finish(pending)
            if t_warm is None:
                t_warm, n_warm = _time.time(), n_utts
        pending = (probs, out_lens, batch)
    if pending is not None:
        n_utts += finish(pending)
        if t_warm is None:
            t_warm, n_warm = _time.time(), n_utts
    t_end = _time.time()
    dt = max(t_end - t0, 1e-9)
    w, c = wer.compute(), cer.compute()
    steady = ""
    if t_warm is not None and n_utts > n_warm and t_end > t_warm:
        steady = (f", {(n_utts - n_warm) / (t_end - t_warm):.1f} utt/s "
                  f"steady past warmup")
    print(f"Test Summary \tAverage WER {w:.3f}\tAverage CER {c:.3f}"
          f"\t({n_utts / dt:.1f} utt/s eval{steady})")
    return w, c


def transcribe(cfg: TranscribeConfig) -> dict:
    """Transcription workflow (reference: inference.py:44-76)."""
    apply_platform(cfg.platform, cfg.num_cpu_devices)
    bundle = load_model(cfg.model.model_path, cfg.model.precision)
    decoder = load_decoder(bundle.labels, cfg.lm, want_offsets=cfg.offsets)
    decoded_output, decoded_offsets = run_transcribe(
        audio_path=cfg.audio_path, bundle=bundle, decoder=decoder,
        chunk_size_seconds=cfg.chunk_size_seconds,
        n_best=max(1, cfg.lm.top_paths))
    results = decode_results(decoded_output, decoded_offsets,
                             model_path=cfg.model.model_path, lm_cfg=cfg.lm,
                             offsets=cfg.offsets, top_paths=cfg.lm.top_paths)
    print(json.dumps(results))
    return results
