#!/usr/bin/env python
"""Measure the REFERENCE stack's training throughput on a CUDA GPU, so the
`vs_baseline` ratio in bench.py stops resting on an estimate.

bench.py's `vs_baseline` anchors against an ESTIMATED A100 throughput for
the flagship config (~90 utt/s at the reference's settings) because this
sandbox has no GPU and no network (BASELINE.md's "measure reference train
throughput on the comparison GPU" action is unfulfillable here). This
script is the ready-to-run other half: run it on any CUDA host and feed
the printed number back via DSJAX_BASELINE_A100_UTT_S when running
bench.py.

What it measures — the same work bench.py measures on TPU:
  one full training step (forward + CTC loss + backward + AdamW + clip 400)
  of the flagship DeepSpeech2 config (2xconv + 5xBiLSTM-1024 summed
  directions, bias-free 29-class head; reference model.py:157-201),
  batch 64 of 10.24 s utterances (T=1024 input frames), fp16 autocast —
  the reference's `trainer.precision=16` LibriSpeech regime
  (reference configs/train_config.py:46-73).

Model source: imports `deepspeech_pytorch` when installed (the true
reference); otherwise uses the in-repo torch twin (tests/torch_twin.py),
which reproduces the same architecture/FLOPs with plain torch modules —
cuDNN executes the identical conv/LSTM kernels either way.

Usage (on a CUDA host):
  python tools/reference_gpu_bench.py            # batch 64, T=1024, fp16
  REF_BENCH_BATCH=32 python tools/reference_gpu_bench.py
Prints one JSON line: {"metric": "reference_gpu_train_throughput", ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import torch

BATCH = int(os.environ.get("REF_BENCH_BATCH", "64"))
T_IN = int(os.environ.get("REF_BENCH_FRAMES", "1024"))
HIDDEN, LAYERS, LBL, C = 1024, 5, 256, 29
STEPS_WARM, STEPS = 5, 20


def build_model(device):
    """The reference DeepSpeech model when installed, else the twin."""
    try:
        from deepspeech_pytorch.configs.train_config import BiDirectionalConfig
        from deepspeech_pytorch.loader.data_loader import SpectConfig
        from deepspeech_pytorch.model import DeepSpeech

        labels = ["_", "'"] + [chr(ord("A") + i) for i in range(26)] + [" "]
        model = DeepSpeech(
            labels=labels,
            model_cfg=BiDirectionalConfig(hidden_size=HIDDEN,
                                          hidden_layers=LAYERS),
            precision=16, optim_cfg=None, spect_cfg=SpectConfig())
        fwd = lambda x, lens: model(x, lens)[:2]
        src = "deepspeech_pytorch"
    except Exception:
        from tests.torch_twin import TorchTwin

        model = TorchTwin(num_classes=C, hidden=HIDDEN, layers=LAYERS,
                          bidirectional=True)
        fwd = lambda x, lens: model(x, lens.cpu())
        src = "tests/torch_twin.py (architecture-identical)"
    return model.to(device), fwd, src


def main():
    if not torch.cuda.is_available():
        print(json.dumps({"error": "no CUDA device — run this on the "
                          "comparison GPU host"}))
        return 1
    device = torch.device("cuda")
    torch.backends.cudnn.benchmark = True
    model, fwd, src = build_model(device)
    opt = torch.optim.AdamW(model.parameters(), lr=1.5e-4,
                            betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-5)
    ctc = torch.nn.CTCLoss(blank=0, reduction="sum", zero_infinity=True)
    scaler = torch.cuda.amp.GradScaler()

    g = torch.Generator().manual_seed(0)
    x = torch.randn(BATCH, 1, 161, T_IN, generator=g).to(device)
    in_lens = torch.full((BATCH,), T_IN, dtype=torch.int32).to(device)
    targets = torch.randint(1, C, (BATCH, LBL), generator=g).to(device)
    tgt_lens = torch.full((BATCH,), LBL, dtype=torch.int32).to(device)

    def step():
        opt.zero_grad(set_to_none=True)
        with torch.autocast("cuda", dtype=torch.float16):
            out, out_lens = fwd(x, in_lens)
            logp = torch.nn.functional.log_softmax(
                out.float(), dim=-1).transpose(0, 1)     # (T, B, C)
            loss = ctc(logp, targets, out_lens, tgt_lens)
        scaler.scale(loss).backward()
        scaler.unscale_(opt)
        torch.nn.utils.clip_grad_norm_(model.parameters(), 400.0)
        scaler.step(opt)
        scaler.update()
        return loss

    for _ in range(STEPS_WARM):
        step()
    torch.cuda.synchronize()
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            step()
        torch.cuda.synchronize()
        samples.append(BATCH * STEPS / (time.perf_counter() - t0))
    samples.sort()
    print(json.dumps({
        "metric": "reference_gpu_train_throughput",
        "value": round(float(np.median(samples)), 2),
        "unit": "utterances/sec/gpu",
        "gpu": torch.cuda.get_device_name(0),
        "model_source": src,
        "batch": BATCH, "frames": T_IN,
        "min": round(samples[0], 2), "max": round(samples[-1], 2),
        "n": len(samples),
        "note": "feed this value to bench.py via DSJAX_BASELINE_A100_UTT_S "
                "to replace the estimated anchor",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
