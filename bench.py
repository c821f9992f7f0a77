#!/usr/bin/env python
"""Benchmark: flagship-model training throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
   "mfu": N, "batch": B}

Measures end-to-end training step time for the DeepSpeech2 flagship config
(2xconv + 5xBiLSTM-1024, bf16 compute, on-device CTC, AdamW + clip 400)
with LibriSpeech-like shapes (batch 64 — the reference's per-GPU LibriSpeech
batch — and ~10s utterances).

Env knobs:
  DSJAX_BENCH_BATCH=N    batch size (default 64)
  DSJAX_BENCH_SECONDS=S  utterance length (default 10.24 -> T=1024 frames)
  DSJAX_BENCH_RAGGED=1   manifest-shaped batches: input lengths spread over
                         [T/2, T] and target lengths over [L/2, L] (honest
                         padding/mask overhead, vs the best-case uniform
                         batch)
  DSJAX_BENCH_RAGGED_SPLIT=K  split each ragged batch into K length-
                         quantile sub-batches per optimizer step (grads
                         summed; the input pipeline's data.ragged_split
                         twin) — trades small-batch kernel efficiency for
                         much less padding compute

Methodology: the local TPU is reached through a tunnel whose per-call input
transfer dominates wall-clock and whose block_until_ready is asynchronous,
so naive step timing is meaningless. Instead the ENTIRE benchmark is one
jitted program per N: parameters and a synthetic batch are generated
on-device from a seed, N training steps run under lax.scan, and the final
loss scalar is fetched (a sync point). Per-step time = (t(N2) - t(N1)) /
(N2 - N1), which cancels the constant upload/compile/latency overhead.

Anchors: `mfu` = model (algorithmic) train FLOPs / chip peak bf16 FLOPs —
the hardware-honest number. `vs_baseline` keeps the reference-stack anchor:
a conservative ESTIMATE of the reference's A100 throughput for this config
(~90 utt/s at batch 32, cuDNN LSTM bound); the reference publishes no
numbers in-tree (see BASELINE.md) and this sandbox has no GPU to measure
one, so the JSON flags it (`baseline_estimated`) until someone runs
tools/reference_gpu_bench.py on a CUDA host and feeds the measured value
back via DSJAX_BASELINE_A100_UTT_S.
"""

import json
import os
import time

import numpy as np

BATCH = int(os.environ.get("DSJAX_BENCH_BATCH", "64"))
SECONDS = float(os.environ.get("DSJAX_BENCH_SECONDS", "10.24"))
RAGGED = os.environ.get("DSJAX_BENCH_RAGGED", "") not in ("", "0")
RAGGED_SPLIT = int(os.environ.get("DSJAX_BENCH_RAGGED_SPLIT", "1"))

HIDDEN, LAYERS, LBL = 1024, 5, 256


def model_train_flops_per_utt(t_in: int, mean_frac: float = 1.0) -> float:
    """Algorithmic FLOPs to TRAIN on one utterance of t_in input frames
    (fwd + backward ~= 3x fwd for this matmul-dominated model). mean_frac
    scales the time-dependent terms for ragged batches."""
    t = t_in // 2 * mean_frac  # frames after the stride-2 conv
    f_out1, f_out2 = 81, 41
    conv1 = f_out1 * t * 32 * (41 * 11 * 1) * 2
    conv2 = f_out2 * t * 32 * (21 * 11 * 32) * 2
    d0 = f_out2 * 32  # 1312
    fwd = conv1 + conv2
    for layer in range(LAYERS):
        d = d0 if layer == 0 else HIDDEN
        proj = t * d * 4 * HIDDEN * 2
        rec = t * HIDDEN * 4 * HIDDEN * 2
        fwd += 2 * (proj + rec)  # two directions
    fwd += t * HIDDEN * 29 * 2  # fc head
    return 3.0 * fwd


def chip_peak_flops() -> float:
    """Peak bf16 FLOP/s for the local chip (by device_kind)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = {
        "v5 lite": 197e12, "v5e": 197e12,
        "v5p": 459e12, "v5": 459e12,
        "v4": 275e12,
        "v6 lite": 918e12, "v6e": 918e12, "trillium": 918e12,
        "v3": 123e12, "v2": 46e12,
    }
    for key, peak in table.items():
        if key in kind:
            return peak
    return 197e12  # assume v5e-class when unknown


def build_program(n_steps: int):
    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache: skip the multi-minute single-core
        # XLA compiles on repeat runs (affects compile time only)
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/dsjax_jax_cache"))
    except Exception:
        pass

    from dsjax.config import TrainConfig, compose
    from dsjax.labels import DEFAULT_LABELS
    from dsjax.model.ctc import ctc_loss_auto as ctc_loss
    from dsjax.model.ds2 import DeepSpeech2
    from dsjax.train.state import TrainState, epoch_lr, make_optimizer, set_lr

    cfg = compose(TrainConfig, [
        f"model.hidden_size={HIDDEN}",
        f"model.hidden_layers={LAYERS}",
        "trainer.precision=16",
    ])
    model = DeepSpeech2(num_classes=len(DEFAULT_LABELS), spect_cfg=cfg.data.spect,
                        model_cfg=cfg.model, dtype=jnp.bfloat16)
    tx = make_optimizer(cfg.optim, cfg.trainer)

    B, F, T, L = BATCH, 161, int(SECONDS * 100), LBL
    C = len(DEFAULT_LABELS)

    if RAGGED:
        # manifest-shaped: lengths spread over [T/2, T] (duration-sorted
        # manifests batch similar lengths; a 2x in-batch spread upper-bounds
        # the real padding waste)
        in_lens = np.linspace(T // 2, T, B).astype(np.int32)
        tgt_lens = np.linspace(L // 2, L, B).astype(np.int32)
    else:
        in_lens = np.full((B,), T, np.int32)
        tgt_lens = np.full((B,), L, np.int32)
    mean_frac = float(in_lens.mean()) / T

    def program(seed):
        rng = jax.random.PRNGKey(seed)
        k_init, k_x, k_t = jax.random.split(rng, 3)
        # the barrier pins the synthetic batch in HBM: without it XLA
        # rematerializes the RNG inside the scan body (~6 ms/step of
        # generation cost that real training, which feeds real batches,
        # does not pay)
        inputs, targets = jax.lax.optimization_barrier(
            (jax.random.normal(k_x, (B, F, T), jnp.float32),
             jax.random.randint(k_t, (B, L), 1, C, jnp.int32)))
        input_lengths = jnp.asarray(in_lens)
        target_lengths = jnp.asarray(tgt_lens)
        variables = model.init(k_init, inputs, input_lengths, train=False)
        state = TrainState(params=variables["params"],
                           batch_stats=variables.get("batch_stats", {}),
                           opt_state=tx.init(variables["params"]),
                           step=jnp.zeros((), jnp.int32),
                           epoch=jnp.zeros((), jnp.int32))

        # length-quantile sub-batches: rows are length-sorted desc, so
        # contiguous row blocks share similar lengths; each block pads only
        # to ITS OWN bucketed max — one optimizer step sums their grads
        # (the input pipeline's data.ragged_split does the same to real
        # batches)
        k_split = RAGGED_SPLIT if RAGGED else 1
        sub = B // k_split
        subs = []
        for k in range(k_split):
            rows = slice(k * sub, (k + 1) * sub)
            t_k = int(-(-int(in_lens[rows].max()) // 64) * 64)  # 64-frame bucket
            subs.append((rows, min(t_k, T)))

        def one_step(state, _):
            def sub_grads(params, stats, rows, t_k):
                def loss_fn(p):
                    (out, out_lens, _), mut = model.apply(
                        {"params": p, "batch_stats": stats},
                        inputs[rows, :, :t_k], input_lengths[rows],
                        train=True, mutable=["batch_stats"])
                    logp = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
                    loss = ctc_loss(logp, out_lens, targets[rows],
                                    target_lengths[rows], reduction="sum")
                    return loss, mut["batch_stats"]

                return jax.value_and_grad(loss_fn, has_aux=True)(params)

            grads = None
            loss = 0.0
            stats = state.batch_stats
            for rows, t_k in subs:
                (l_k, stats), g_k = sub_grads(state.params, stats, rows, t_k)
                loss = loss + l_k
                grads = g_k if grads is None else jax.tree_util.tree_map(
                    jnp.add, grads, g_k)
            opt_state = set_lr(state.opt_state, epoch_lr(cfg.optim, state.epoch))
            updates, opt_state = tx.update(grads, opt_state, state.params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
            return TrainState(params, stats, opt_state, state.step + 1,
                              state.epoch), loss

        state, losses = jax.lax.scan(one_step, state, None, length=n_steps)
        return losses[-1]

    return jax.jit(program), B, mean_frac


def timed_run(fn, seed) -> float:
    t0 = time.perf_counter()
    v = float(fn(seed))  # scalar fetch = sync point
    t1 = time.perf_counter()
    assert np.isfinite(v), f"non-finite loss {v}"
    return t1 - t0


def main():
    # Self-defending measurement (the tunnel adds run-to-run variance):
    # N repetitions of the (short, long) timed pair, each yielding one
    # throughput sample from the step-time delta; report the MEDIAN as the
    # headline plus min/max/n so a wiggle between rounds is attributable
    # at a glance. DSJAX_BENCH_REPS overrides N (>=3).
    n1, n2 = 2, 12
    reps = max(3, int(os.environ.get("DSJAX_BENCH_REPS", "5")))
    f1, batch, mean_frac = build_program(n1)
    f2, _, _ = build_program(n2)
    # warm both compiles
    timed_run(f1, 0)
    timed_run(f2, 0)
    samples = []
    seed, attempts = 1, 0
    while len(samples) < reps and attempts < 3 * reps:
        attempts += 1
        t_short = timed_run(f1, seed)
        t_long = timed_run(f2, seed + 1)
        seed += 2
        step_time = (t_long - t_short) / (n2 - n1)
        if step_time <= 0:
            # tunnel jitter inverted the pair; the rep is invalid, not a
            # measurement of an (impossibly) instantaneous step — retry.
            continue
        samples.append(batch / step_time)
    assert samples, "all benchmark repetitions were jitter-inverted"
    samples.sort()
    utt_per_sec = float(np.median(samples))
    flops_per_utt = model_train_flops_per_utt(int(SECONDS * 100), mean_frac)
    mfu = utt_per_sec * flops_per_utt / chip_peak_flops()
    # the anchor is an ESTIMATE (this sandbox has neither the GPU nor the
    # network to measure the reference stack; BASELINE.md's action item).
    # tools/reference_gpu_bench.py measures the real number on any CUDA
    # host; feed it back here to retire the estimate.
    # parsed defensively: this runs AFTER all timed reps, so a typo'd env
    # value must not throw away the run
    try:
        baseline_a100_utt_s = float(
            os.environ.get("DSJAX_BASELINE_A100_UTT_S") or 90.0)
        baseline_estimated = not os.environ.get("DSJAX_BASELINE_A100_UTT_S")
    except ValueError:
        baseline_a100_utt_s, baseline_estimated = 90.0, True
    tag = "_ragged" if RAGGED else ""
    if RAGGED and RAGGED_SPLIT > 1:
        tag += f"_split{RAGGED_SPLIT}"
    median = round(utt_per_sec, 2)  # headline "value" IS the median
    print(json.dumps({
        "metric": f"train_throughput_ds2_5x1024_b{BATCH}_t{int(SECONDS * 100)}{tag}",
        "value": median,
        "unit": "utterances/sec/chip",
        "vs_baseline": round(utt_per_sec / baseline_a100_utt_s, 3),
        # honest label: the A100 anchor is an unmeasured estimate until
        # tools/reference_gpu_bench.py runs on a real GPU host
        "baseline_anchor_utt_s": baseline_a100_utt_s,
        "baseline_estimated": baseline_estimated,
        "mfu": round(mfu, 4),
        "batch": BATCH,
        "median": median,
        "min": round(samples[0], 2),
        "max": round(samples[-1], 2),
        "n": len(samples),
    }))


if __name__ == "__main__":
    main()
