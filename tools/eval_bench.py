#!/usr/bin/env python
"""End-to-end evaluation throughput: the full test.py path (manifest ->
host STFT -> batched device forward -> decode -> WER) on a synthetic
LibriSpeech-shaped set with the flagship model.

Usage: python tools/eval_bench.py [n_utts] [seconds]
Env:   DSJAX_EVAL_DECODER=greedy|beam (default greedy)
       DSJAX_EVAL_DEVICE_FEATURES=1   STFT inside the jitted step
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json

import numpy as np


def main():
    n_utts = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    decoder = os.environ.get("DSJAX_EVAL_DECODER", "greedy")

    import jax

    try:  # persistent compile cache (repeat runs skip XLA compiles)
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/dsjax_jax_cache"))
    except Exception:
        pass

    from dsjax.audio.io import save_wav
    from dsjax.config import EvalConfig, TrainConfig, compose
    from dsjax.labels import DEFAULT_LABELS
    from dsjax.train.checkpoint import CheckpointHandler
    from dsjax.train.loop import Trainer
    from dsjax.workflows import evaluate

    root = tempfile.mkdtemp(prefix="evalbench_")
    sr = 16000
    rng = np.random.default_rng(0)
    os.makedirs(f"{root}/wav"); os.makedirs(f"{root}/txt")
    words = ["SPEECH", "MODEL", "EVAL", "BENCH", "AUDIO", "FRAME"]
    samples = []
    for i in range(n_utts):
        n = int(sr * seconds)
        y = (0.1 * np.sin(2 * np.pi * (200 + 10 * i) * np.arange(n) / sr)
             + 0.02 * rng.standard_normal(n)).astype(np.float32)
        save_wav(f"{root}/wav/u{i}.wav", y, sr)
        open(f"{root}/txt/u{i}.txt", "w").write(
            " ".join(rng.choice(words, size=8)))
        samples.append({"wav_path": f"wav/u{i}.wav",
                        "transcript_path": f"txt/u{i}.txt"})
    manifest = f"{root}/manifest.json"
    json.dump({"root_path": root, "samples": samples}, open(manifest, "w"))

    # flagship-config random checkpoint
    cfg = compose(TrainConfig, ["model.hidden_size=1024",
                                "model.hidden_layers=5"])
    trainer = Trainer(cfg, DEFAULT_LABELS,
                      mesh=None)
    state = trainer.init_state()
    ckpt_dir = f"{root}/ckpt"
    handler = CheckpointHandler(ckpt_dir, cfg=cfg, labels=DEFAULT_LABELS)
    handler.save(state, {"wer": 1.0})
    handler.close()

    # device features are the default (EvalConfig.device_features=True);
    # set DSJAX_EVAL_DEVICE_FEATURES=0 to bench the host-STFT fallback
    dev_feats = os.environ.get("DSJAX_EVAL_DEVICE_FEATURES", "1") not in ("", "0")
    ecfg = compose(EvalConfig, [
        f"model.model_path={ckpt_dir}", f"test_path={manifest}",
        "model.precision=16", "verbose=false",
        f"batch_size={os.environ.get('DSJAX_EVAL_BATCH', '16')}",
        f"lm.decoder_type={decoder}",
        f"device_features={'true' if dev_feats else 'false'}",
    ])
    t0 = time.time()
    evaluate(ecfg)  # prints its own utt/s (incl. first-batch compile)
    dt = time.time() - t0
    print(f"eval_bench: {n_utts} x {seconds:.0f}s utts, decoder={decoder}, "
          f"wall {dt:.1f}s -> {n_utts / dt:.1f} utt/s end-to-end "
          f"(RTF {dt / (n_utts * seconds):.4f})")


if __name__ == "__main__":
    main()
