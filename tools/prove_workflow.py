#!/usr/bin/env python
"""One-command proof of the full production workflow, as an OPERATED SYSTEM.

Reference behavior being matched: training.py:13-47 (train entrypoint) +
checkpoint.py:34-46 (ModelCheckpoint best/last) + README.md:154-189 (the
TorchElastic recovery loop: a killed trainer relaunches and continues from
its latest checkpoint). This script drives the REAL CLIs the way an
operator would — separate OS processes, a real SIGKILL, a cold relaunch —
not in-process unit-test shortcuts:

  1. synthesize a learnable multi-hour on-disk corpus (per-character tone
     code, so WER genuinely falls as the model trains)
  2. phase A  — ``python train.py ...`` until a MID-EPOCH checkpoint of a
     non-first epoch lands, then SIGKILL the process mid-step
  3. phase B  — relaunch the identical command; it must print
     "auto-resumed from step N" and run to completion, appending to the
     same metrics.jsonl (monotone step continuity across the kill)
  4. phase C  — ``python test.py`` on the held-out val manifest
  5. phase D  — ``python transcribe.py`` on one val utterance
  6. write artifacts: RUNLOG.md + summary.json + metrics.jsonl + trimmed
     phase logs into --out (committed as the round's run evidence)

Usage (real TPU, ~2.5h corpus):   python tools/prove_workflow.py
Fast orchestration smoke (CPU):   python tools/prove_workflow.py \
    --minutes 2 --platform cpu --hidden 48 --layers 1 --batch 8 --epochs 3
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Confusable vocabulary: minimal-pair families — one wrong CHARACTER is a
# whole word error, so WER tracks fine-grained acoustic discrimination and
# a language model has words to fix (the r4 corpus was aced before the
# first validation; this one must show a descending curve).
WORDS = ("BAT CAT HAT RAT MAT PAT SAT FAT "
         "BIG DIG FIG PIG WIG JIG "
         "CONE BONE TONE ZONE GONE "
         "BAKE CAKE LAKE MAKE RAKE TAKE WAKE "
         "BEST REST TEST VEST NEST WEST "
         "CALL BALL TALL WALL FALL HALL "
         "LIGHT NIGHT RIGHT SIGHT TIGHT FIGHT "
         "TRAIN BRAIN GRAIN PLAIN CHAIN STAIN "
         "THE AND FOR WITH FROM OVER UNDER NEAR").split()
SR = 16000
CHAR_SEC = 0.08          # one tone per character; space = silence
TONE_SPACING = 28.0      # Hz between letter tones — well UNDER the 50 Hz
                         # STFT bin width, so neighbouring letters share
                         # bins and must be told apart by leakage patterns
TONE_BASE = 300.0
FREQ_JITTER = 7.0        # per-utterance tone-offset jitter (Hz)
AMP_RANGE = (0.06, 0.22)  # per-utterance tone amplitude
NOISE_STD = 0.18         # additive white noise (mixed-in, per VERDICT r4)
N_BG_TONES = 2           # continuous background distractor tones at
BG_AMP = 0.45            # BG_AMP x the utterance's tone amplitude, parked
                         # ON letter frequencies — confusable interference,
                         # not just broadband noise
# knobs calibrated on v5e (512x3 BiLSTM, batch 32, lr 2e-4, 2.5 h corpus,
# val every 15 steps): val WER % trajectory 100 -> 94 -> 50 -> 21 (epoch
# 0) -> 14 -> 7 -> 6 -> 5.9 (epoch 1, the SIGKILL epoch) -> ... -> 1.4-2.3
# (epochs 4-5) — a genuine descending curve that SPANS the mid-epoch-1
# kill, converged but not saturated


def _char_freq(ch: str) -> float:
    return TONE_BASE + TONE_SPACING * (ord(ch) - ord("A"))


def make_successors(seed: int = 7, k: int = 4):
    """Deterministic sparse bigram chain over WORDS: each word allows only
    ``k`` successors, giving the corpus real n-gram structure a trigram LM
    can learn (and use to disambiguate acoustically confusable words)."""
    rng = np.random.default_rng(seed)
    return {w: list(rng.choice([x for x in WORDS if x != w], size=k,
                               replace=False)) for w in WORDS}


def gen_text(rng: np.random.Generator, succ, n_words: int) -> str:
    w = str(rng.choice(WORDS))
    out = [w]
    for _ in range(n_words - 1):
        w = str(rng.choice(succ[w]))
        out.append(w)
    return " ".join(out)


def synth_utterance(text: str, rng: np.random.Generator) -> np.ndarray:
    """Audio whose spectrogram encodes the transcript — but NOT trivially:
    per-character tones at ~12.5 chars/s with sub-bin tone spacing,
    per-utterance frequency jitter and amplitude, and mixed-in noise, so
    the model has a genuine discrimination problem to learn."""
    n_char = int(SR * CHAR_SEC)
    amp = float(rng.uniform(*AMP_RANGE))
    df = float(rng.uniform(-FREQ_JITTER, FREQ_JITTER))
    segs = []
    for ch in text:
        if ch == " ":
            segs.append(np.zeros(n_char, np.float32))
        else:
            t = np.arange(n_char) / SR
            segs.append((amp * np.sin(2 * np.pi * (_char_freq(ch) + df) * t)
                         ).astype(np.float32))
    y = np.concatenate(segs)
    # continuous distractor tones parked ON letter frequencies: the model
    # must separate the keyed sequence from steady same-family interference
    t_all = np.arange(len(y)) / SR
    for _ in range(N_BG_TONES):
        f_bg = _char_freq(chr(int(rng.integers(ord("A"), ord("Z") + 1))))
        y += (BG_AMP * amp * np.sin(2 * np.pi * (f_bg + df) * t_all
                                    + rng.uniform(0, 2 * np.pi))
              ).astype(np.float32)
    y += (NOISE_STD * rng.standard_normal(len(y))).astype(np.float32)
    return y


def make_arpa(texts, path: str, d: float = 0.5) -> None:
    """Trigram ARPA from the training transcripts (absolute discounting,
    no sentence-boundary modeling — matching the decoder's context model,
    which scores word streams with no BOS). Gives phase C a language model
    whose n-gram structure is the corpus's own Markov chain."""
    from collections import Counter

    uni, bi, tri = Counter(), Counter(), Counter()
    for text in texts:
        ws = text.split()
        uni.update((w,) for w in ws)
        bi.update(zip(ws, ws[1:]))
        tri.update(zip(ws, ws[1:], ws[2:]))
    n_uni = sum(uni.values())
    bi_ctx, tri_ctx = Counter(), Counter()
    for (a, b), c in bi.items():
        bi_ctx[(a,)] += c
    for (a, b, w), c in tri.items():
        tri_ctx[(a, b)] += c

    def probs(counts, ctx_tot, lower_p):
        p, bo = {}, {}
        succ = {}
        for g, c in counts.items():
            succ.setdefault(g[:-1], []).append(g)
        for ctx, grams in succ.items():
            tot = ctx_tot[ctx]
            for g in grams:
                p[g] = max(counts[g] - d, 1e-9) / tot
            # backoff mass / unseen lower-order mass
            left = d * len(grams) / tot
            seen_lower = sum(lower_p.get(g[1:], 1e-9) for g in grams)
            bo[ctx] = left / max(1e-9, 1.0 - min(seen_lower, 1.0 - 1e-6))
        return p, bo

    p1 = {g: max(c - d, 1e-9) / n_uni for g, c in uni.items()}
    p2, bo1 = probs(bi, bi_ctx, p1)
    p3, bo2 = probs(tri, tri_ctx, p2)
    lg = lambda x: f"{np.log10(max(x, 1e-12)):.6f}"
    with open(path, "w") as f:
        f.write("\\data\\\n")
        f.write(f"ngram 1={len(p1) + 1}\nngram 2={len(p2)}\n"
                f"ngram 3={len(p3)}\n\n")
        f.write("\\1-grams:\n")
        f.write("-3.5\t<unk>\t0.0\n")
        for (w,), pr in sorted(p1.items()):
            f.write(f"{lg(pr)}\t{w}\t{lg(bo1.get((w,), 1.0))}\n")
        f.write("\n\\2-grams:\n")
        for g, pr in sorted(p2.items()):
            f.write(f"{lg(pr)}\t{g[0]} {g[1]}\t{lg(bo2.get(g, 1.0))}\n")
        f.write("\n\\3-grams:\n")
        for g, pr in sorted(p3.items()):
            f.write(f"{lg(pr)}\t{g[0]} {g[1]} {g[2]}\n")
        f.write("\n\\end\\\n")


def make_corpus(root: str, minutes: float, seed: int = 0):
    """LibriSpeech-shaped on-disk dataset; ~95/5 train/val split.
    Returns (train_manifest, val_manifest, total_hours, n_utts)."""
    from dsjax.audio.io import save_wav

    done = os.path.join(root, ".done")
    key = (f"{minutes}:{seed}:{TONE_SPACING}:{NOISE_STD}:{FREQ_JITTER}:"
           f"{AMP_RANGE}:{N_BG_TONES}:{BG_AMP}:{len(WORDS)}")
    if os.path.exists(done) and open(done).read() == key:
        man = lambda s: os.path.join(root, f"{s}_manifest.json")
        meta = json.load(open(os.path.join(root, "meta.json")))
        return man("train"), man("val"), meta["hours"], meta["n_utts"]
    os.makedirs(os.path.join(root, "wav"), exist_ok=True)
    os.makedirs(os.path.join(root, "txt"), exist_ok=True)
    rng = np.random.default_rng(seed)
    succ = make_successors()
    total = 0.0
    entries = []
    i = 0
    while total < minutes * 60.0:
        n_words = int(rng.integers(8, 16))
        text = gen_text(rng, succ, n_words)
        y = synth_utterance(text, rng)
        save_wav(os.path.join(root, "wav", f"u{i:05d}.wav"), y, SR)
        with open(os.path.join(root, "txt", f"u{i:05d}.txt"), "w") as f:
            f.write(text)
        entries.append((len(y) / SR, {"wav_path": f"wav/u{i:05d}.wav",
                                      "transcript_path": f"txt/u{i:05d}.txt"}))
        total += len(y) / SR
        i += 1
    entries.sort(key=lambda e: e[0])    # duration-sorted (reference manifests)
    n_val = max(8, len(entries) // 20)
    stride = max(1, len(entries) // n_val)
    val_idx = set(range(0, len(entries), stride))   # spread across durations
    val = [e for i, e in enumerate(entries) if i in val_idx][:n_val]
    val_set = {id(e) for e in val}
    train = [e for e in entries if id(e) not in val_set]
    for split, es in (("train", train), ("val", val)):
        with open(os.path.join(root, f"{split}_manifest.json"), "w") as f:
            json.dump({"root_path": root, "samples": [e[1] for e in es]}, f)
    # trigram LM from the TRAIN transcripts only (phase C beam+LM eval)
    train_texts = [open(os.path.join(root, e[1]["transcript_path"])).read()
                   for e in train]
    make_arpa(train_texts, os.path.join(root, "lm.arpa"))
    json.dump({"hours": total / 3600, "n_utts": len(entries)},
              open(os.path.join(root, "meta.json"), "w"))
    with open(done, "w") as f:
        f.write(key)
    return (os.path.join(root, "train_manifest.json"),
            os.path.join(root, "val_manifest.json"), total / 3600, len(entries))


def read_metrics(path: str):
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass    # torn tail line mid-kill
    return rows


def latest_ckpt_step(ckpt_dir: str):
    last = os.path.join(ckpt_dir, "last")
    if not os.path.isdir(last):
        return None
    steps = [int(d) for d in os.listdir(last) if d.isdigit()]
    return max(steps) if steps else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/r05_tpu_e2e")
    ap.add_argument("--work", default="/tmp/dsjax_prove_workflow")
    ap.add_argument("--minutes", type=float, default=150.0)
    ap.add_argument("--platform", default="",
                    help="'' = default (TPU); 'cpu' for orchestration smoke")
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--every-n-steps", type=int, default=15,
                    help="mid-epoch checkpoint interval")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, args.out)
    os.makedirs(out, exist_ok=True)
    work = args.work
    ckpt_dir = os.path.join(work, "ckpt")
    log_dir = os.path.join(work, "logs")
    metrics_path = os.path.join(log_dir, "metrics.jsonl")
    if os.path.isdir(ckpt_dir) or os.path.isdir(log_dir):
        import shutil
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        shutil.rmtree(log_dir, ignore_errors=True)

    print(f"[0] synthesizing corpus ({args.minutes:.0f} min of audio)...",
          flush=True)
    t0 = time.time()
    train_man, val_man, hours, n_utts = make_corpus(
        os.path.join(work, "data"), args.minutes)
    print(f"    {hours:.2f} h, {n_utts} utterances ({time.time() - t0:.0f}s)",
          flush=True)

    train_cmd = [sys.executable, "train.py",
                 f"data.train_path={train_man}", f"data.val_path={val_man}",
                 f"data.batch_size={args.batch}",
                 f"model.hidden_size={args.hidden}",
                 f"model.hidden_layers={args.layers}",
                 f"trainer.max_epochs={args.epochs}",
                 f"checkpoint.dirpath={ckpt_dir}",
                 f"checkpoint.every_n_steps={args.every_n_steps}",
                 f"trainer.log_dir={log_dir}",
                 "trainer.log_every_n_steps=5",
                 "trainer.val_check_interval=0.25",
                 "optim.learning_rate=2e-4",
                 # the reference recovery loop runs with auto-resume on
                 # (kubernetes/train.yaml:38 load_auto_checkpoint=true)
                 "load_auto_checkpoint=true",
                 ]
    if args.platform:
        train_cmd += [f"trainer.platform={args.platform}",
                      "trainer.precision=32"]
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=os.path.join(work, "jax_cache"))

    # ---- phase A: train until a mid-epoch ckpt of epoch>=1, then SIGKILL --
    print(f"[A] launching: {' '.join(train_cmd)}", flush=True)
    log_a = open(os.path.join(out, "phaseA.log"), "w")
    pa = subprocess.Popen(train_cmd, cwd=repo, stdout=log_a,
                          stderr=subprocess.STDOUT, env=env)
    kill_info = None
    deadline = time.time() + 7200
    while time.time() < deadline:
        if pa.poll() is not None:
            raise SystemExit(
                f"phase A exited rc={pa.returncode} before the kill — "
                f"see {out}/phaseA.log")
        rows = read_metrics(metrics_path)
        max_epoch = max((int(r.get("epoch", 0)) for r in rows), default=0)
        s = latest_ckpt_step(ckpt_dir)
        # kill on a save that is strictly INSIDE epoch 1: the last epoch-0
        # row is logged at state.step == steps_per_epoch, so a mid-epoch-1
        # every_n_steps save satisfies spe < s < 2*spe (the epoch-1
        # boundary save would land exactly at 2*spe)
        e0 = [r["step"] for r in rows if int(r.get("epoch", -1)) == 0]
        if max_epoch == 1 and e0 and s is not None:
            spe = max(e0)
            if spe < s < 2 * spe:
                time.sleep(3)       # let the save finish + a few more steps
                kill_info = {"ckpt_step": latest_ckpt_step(ckpt_dir),
                             "metrics_rows": len(read_metrics(metrics_path)),
                             "wall": time.time()}
                pa.send_signal(signal.SIGKILL)
                pa.wait()
                break
        time.sleep(2)
    log_a.close()
    if kill_info is None:
        if pa.poll() is None:   # deadline expired — don't leak the trainer
            pa.send_signal(signal.SIGKILL)
            pa.wait()
        raise SystemExit("phase A never reached a mid-epoch checkpoint "
                         "of epoch>=1 within the deadline")
    rows_at_kill = read_metrics(metrics_path)
    step_at_kill = max(r["step"] for r in rows_at_kill)
    print(f"[A] SIGKILLed trainer mid-epoch at metrics step {step_at_kill} "
          f"(latest ckpt step {kill_info['ckpt_step']})", flush=True)

    # ---- phase B: relaunch identical command; must auto-resume ----------
    print("[B] relaunching identical command (auto-resume)...", flush=True)
    log_b_path = os.path.join(out, "phaseB.log")
    with open(log_b_path, "w") as log_b:
        pb = subprocess.run(train_cmd, cwd=repo, stdout=log_b,
                            stderr=subprocess.STDOUT, env=env, timeout=7200)
    log_b_text = open(log_b_path).read()
    assert pb.returncode == 0, f"phase B failed rc={pb.returncode}"
    resume_lines = [l for l in log_b_text.splitlines() if "auto-resumed" in l]
    assert resume_lines, "phase B log has no 'auto-resumed from step' line"
    resume_step = int(resume_lines[0].rsplit("step", 1)[1].strip())
    assert resume_step == kill_info["ckpt_step"], (
        f"resumed from step {resume_step}, expected the mid-epoch save "
        f"{kill_info['ckpt_step']}")
    rows = read_metrics(metrics_path)
    post = [r["step"] for r in rows[len(rows_at_kill):] if "loss" in r]
    assert post and min(post) >= resume_step, (
        "metrics steps restarted instead of continuing past the resume point")
    print(f"[B] {resume_lines[0].strip()} -> completed epoch "
          f"{int(rows[-1].get('epoch', -1))}", flush=True)

    # ---- phase C: evaluate the produced checkpoint ----------------------
    # Three decoders over the same checkpoint + val manifest: greedy, then
    # beam + the corpus-trained trigram LM through BOTH implementations —
    # the C++ host beam (ctcdecode+KenLM substitute) and the on-device
    # fused beam (reference beam+LM eval: decoder.py:103-118).
    arpa = os.path.join(work, "data", "lm.arpa")
    alpha, beta = 1.2, 0.4

    def run_eval(tag: str, extra):
        cmd = [sys.executable, "test.py", f"model.model_path={ckpt_dir}",
               f"test_path={val_man}", "verbose=false"] + extra
        p = subprocess.run(cmd, cwd=repo, capture_output=True, text=True,
                           env=env, timeout=3600)
        open(os.path.join(out, f"phaseC_eval_{tag}.log"), "w").write(
            p.stdout + p.stderr)
        assert p.returncode == 0, f"eval[{tag}] failed:\n{p.stdout}\n{p.stderr}"
        line = [l for l in p.stdout.splitlines() if "Test Summary" in l][0]
        wer = float(line.split("WER")[1].split()[0])
        cer = float(line.split("CER")[1].split()[0])
        print(f"[C] {tag:12s}: {line.strip()}", flush=True)
        return wer, cer

    print("[C] evaluating best checkpoint on the val manifest...", flush=True)
    final_wer, final_cer = run_eval("greedy", [])
    beam_args = ["lm.decoder_type=beam", f"lm.lm_path={arpa}",
                 f"lm.alpha={alpha}", f"lm.beta={beta}", "lm.beam_width=32"]
    beam_wer, beam_cer = run_eval("beam_lm_cpp", beam_args)
    dev_wer, dev_cer = run_eval("beam_lm_device",
                                beam_args + ["lm.device_beam=true"])

    # ---- phase D: transcribe one held-out utterance ---------------------
    val = json.load(open(val_man))
    wav0 = os.path.join(val["root_path"], val["samples"][0]["wav_path"])
    ref0 = open(os.path.join(
        val["root_path"], val["samples"][0]["transcript_path"])).read().strip()
    print(f"[D] transcribing {os.path.basename(wav0)}...", flush=True)
    pd = subprocess.run([sys.executable, "transcribe.py",
                         f"model.model_path={ckpt_dir}",
                         f"audio_path={wav0}"],
                        cwd=repo, capture_output=True, text=True, env=env,
                        timeout=1800)
    assert pd.returncode == 0, f"transcribe failed:\n{pd.stdout}\n{pd.stderr}"
    hyp0 = json.loads(pd.stdout.splitlines()[-1])["output"][0]["transcription"]
    print(f"[D] ref: {ref0!r}\n    hyp: {hyp0!r}", flush=True)

    # ---- artifacts ------------------------------------------------------
    wer_rows = [r for r in rows if "wer" in r]
    first_wer = wer_rows[0]["wer"] if wer_rows else float("nan")
    import shutil
    shutil.copy(metrics_path, os.path.join(out, "metrics.jsonl"))
    summary = {
        "corpus_hours": round(hours, 2), "n_utts": n_utts,
        "model": {"hidden_size": args.hidden, "hidden_layers": args.layers},
        "batch_size": args.batch, "max_epochs": args.epochs,
        "platform": args.platform or "tpu(default)",
        "kill": {"metrics_step": step_at_kill,
                 "resumed_ckpt_step": kill_info["ckpt_step"]},
        "resume_line": resume_lines[0].strip(),
        "corpus_knobs": {"tone_spacing_hz": TONE_SPACING,
                         "freq_jitter_hz": FREQ_JITTER,
                         "amp_range": list(AMP_RANGE),
                         "noise_std": NOISE_STD,
                         "vocab_size": len(WORDS)},
        "wer_trajectory": [{"step": r["step"], "epoch": int(r.get("epoch", -1)),
                            "wer": r["wer"], "cer": r["cer"]}
                           for r in wer_rows],
        "first_val_wer": first_wer, "final_eval_wer": final_wer,
        "final_eval_cer": final_cer,
        "beam_lm": {"alpha": alpha, "beta": beta, "width": 32,
                    "cpp_wer": beam_wer, "cpp_cer": beam_cer,
                    "device_wer": dev_wer, "device_cer": dev_cer},
        "transcribe_sample": {"ref": ref0, "hyp": hyp0},
    }
    with open(os.path.join(out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    traj = "\n".join(f"| {r['step']} | {r['epoch']} | {r['wer']:.2f} | "
                     f"{r['cer']:.2f} |" for r in wer_rows)
    with open(os.path.join(out, "RUNLOG.md"), "w") as f:
        f.write(f"""# Production-workflow proof run

One command: `python tools/prove_workflow.py` (this directory is its
committed output). Operated-system proof of the reference recovery loop
(reference README.md:154-189, training.py:13-47, checkpoint.py:34-46):
real `train.py` process, real SIGKILL mid-epoch, cold relaunch that
auto-resumes from the mid-epoch checkpoint (sampler position included),
then `test.py` + `transcribe.py` on the result.

- corpus: {hours:.2f} h synthetic tone-code speech, {n_utts} utts
  (95/5 train/val), platform: {summary['platform']}
- model: {args.hidden}x{args.layers} BiLSTM, batch {args.batch}, \
{args.epochs} epochs
- phase A killed (SIGKILL) at metrics step {step_at_kill}; latest
  mid-epoch checkpoint step {kill_info['ckpt_step']}
- phase B: `{resume_lines[0].strip()}` — metrics.jsonl continues
  monotonically across the kill (see metrics.jsonl)
- phase C eval (greedy): WER {final_wer:.3f} / CER {final_cer:.3f}
  (first val WER during training: {first_wer:.2f} — the corpus is hard
  enough to have a real descending curve; see trajectory below)
- phase C eval (beam + corpus trigram LM, width 32, alpha {alpha}
  beta {beta}): C++ host WER {beam_wer:.3f} / CER {beam_cer:.3f};
  on-device fused WER {dev_wer:.3f} / CER {dev_cer:.3f}
- phase D transcribe: ref {ref0!r} -> hyp {hyp0!r}

## WER trajectory (from metrics.jsonl)

| step | epoch | WER | CER |
|---|---|---|---|
{traj}
""")
    print(f"\nartifacts -> {out}/ (RUNLOG.md, summary.json, metrics.jsonl, "
          f"phase logs)", flush=True)
    # Work dir (corpus cache + checkpoints) is intentionally left in place:
    # the corpus is reusable across runs and the checkpoints are evidence.
    # Pass criteria (r5): the corpus must be HARD enough that the first
    # validation shows real errors, the model must still converge, and
    # the curve must descend ACROSS the SIGKILL resume.
    assert first_wer >= 20.0, (   # metrics wer/cer are PERCENT
        f"corpus too easy: first val WER {first_wer}% < 20% — no curve")
    assert final_wer <= 5.0, (
        f"WER did not converge: first {first_wer}%, final {final_wer}%")
    assert abs(dev_wer - beam_wer) <= 1.0, (
        f"device vs C++ beam+LM WER diverge: {dev_wer} vs {beam_wer}")
    print("WORKFLOW PROOF OK", flush=True)


if __name__ == "__main__":
    main()
