#!/usr/bin/env python
"""Beam-decode throughput, self-defending: every row is the median of
N>=3 in-session repetitions with min/max attached, and the whole table
is written as machine-readable JSON (committed as BEAMBENCH_r{N}.json)
so no decode performance claim lives only as README prose.

Covers the C++ beam+LM (text vs binary load) and the on-device beam at
reference widths 10 / 32 / 128 (reference uses width 10 default / 128
for LM tuning, decoder.py:56-118, README.md:281-293), in BOTH posterior
regimes (flat worst-case and blank-dominated like every trained CTC
model), BOTH LM modes (no LM / on-device LM fusion), plus the EVAL
regime (batch 64, n_best=1 — the exact shape evaluate() runs).

Builds a synthetic 3-gram LM (no network in this sandbox; the real
3-gram.pruned.3e-7.arpa slots in via DSJAX_BEAM_LM=path).

Usage: python tools/beam_bench.py [--json BEAMBENCH.json] [--reps 3]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

B = int(os.environ.get("DSJAX_BEAM_BATCH", "16"))
T = int(os.environ.get("DSJAX_BEAM_FRAMES", "500"))
LM_PATH = os.environ.get("DSJAX_BEAM_LM", "")


def synth_arpa(path: str, vocab: int = 4000, bigrams: int = 60000,
               trigrams: int = 120000, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    letters = np.array(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ"))
    words = ["<s>", "</s>", "<unk>"]
    seen = set(words)
    while len(words) < vocab:
        w = "".join(rng.choice(letters, size=rng.integers(2, 9)))
        if w not in seen:
            seen.add(w)
            words.append(w)
    with open(path, "w") as f:
        f.write("\\data\\\n")
        f.write(f"ngram 1={vocab}\nngram 2={bigrams}\nngram 3={trigrams}\n\n")
        f.write("\\1-grams:\n")
        for w in words:
            f.write(f"{-rng.uniform(1, 5):.4f}\t{w}\t{-rng.uniform(0.1, 1):.4f}\n")
        f.write("\n\\2-grams:\n")
        idx = rng.integers(0, vocab, size=(bigrams, 2))
        for a, b in idx:
            f.write(f"{-rng.uniform(1, 6):.4f}\t{words[a]} {words[b]}\t"
                    f"{-rng.uniform(0.1, 1):.4f}\n")
        f.write("\n\\3-grams:\n")
        idx = rng.integers(0, vocab, size=(trigrams, 3))
        for a, b, c in idx:
            f.write(f"{-rng.uniform(1, 7):.4f}\t{words[a]} {words[b]} {words[c]}\n")
        f.write("\n\\end\\\n")


def rand_probs(rng, b, t, c, blank_bias=0.0):
    """Peaky posteriors resembling a trained model's output.

    blank_bias > 0 adds the blank-dominance every trained CTC model shows
    (the 'peaky CTC' property: most frames emit blank, so most beam steps
    are stays) — bias 3.0 puts blank on top on ~2/3 of frames, roughly a
    trained DeepSpeech2's regime; 0 keeps the flat worst case where nearly
    every step extends every beam."""
    logits = rng.standard_normal((b, t, c)) * 3.0
    logits[..., 0] += blank_bias
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    return (e / e.sum(axis=-1, keepdims=True)).astype(np.float32)


def timed_row(rows, fn, reps, **tags):
    """Run fn() reps times; record median/min/max utt/s + print one line."""
    batch = tags["batch"]
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts)
    med = float(np.median(ts))
    row = dict(tags, n=reps,
               utt_s_median=round(batch / med, 1),
               utt_s_min=round(batch / ts.max(), 1),
               utt_s_max=round(batch / ts.min(), 1),
               ms_per_utt_median=round(med / batch * 1000, 3))
    rows.append(row)
    place = f" {tags['posteriors']:6s}" if "posteriors" in tags else ""
    print(f"{tags['path']:10s} w{tags['width']:<3d} "
          f"lm={tags['lm']:6s} B={batch:<3d} {tags['regime']:5s} "
          f"n_best={tags['n_best']:3s}{place}: "
          f"{row['utt_s_median']:7.1f} utt/s "
          f"(min {row['utt_s_min']:.1f} / max {row['utt_s_max']:.1f}, "
          f"n={reps}, {row['ms_per_utt_median']:.2f} ms/utt)", flush=True)
    return row


def main():
    import tempfile

    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="", help="write rows as JSON here")
    ap.add_argument("--reps", type=int, default=3,
                    help="in-session repetitions per row (median reported)")
    args = ap.parse_args()
    reps = max(3, args.reps)

    from dsjax.cpp.beam_binding import build_lm_binary
    from dsjax.decode.beam import BeamCTCDecoder
    from dsjax.labels import DEFAULT_LABELS

    tmp = tempfile.mkdtemp()
    arpa = LM_PATH or os.path.join(tmp, "synth.arpa")
    if not LM_PATH:
        print("building synthetic 3-gram ARPA (4k vocab, 60k/120k ngrams)...")
        synth_arpa(arpa)
    binary = os.path.join(tmp, "lm.bin")

    t0 = time.perf_counter()
    build_lm_binary(arpa, binary)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    d_text = BeamCTCDecoder(DEFAULT_LABELS, lm_path=arpa, alpha=0.4, beta=0.85)
    t_text = time.perf_counter() - t0
    t0 = time.perf_counter()
    d_bin = BeamCTCDecoder(DEFAULT_LABELS, lm_path=binary, alpha=0.4, beta=0.85)
    t_bin = time.perf_counter() - t0
    print(f"LM load: text {t_text:.2f}s | binary {t_bin:.3f}s "
          f"(built in {t_build:.2f}s, "
          f"{os.path.getsize(binary) / 1e6:.1f} MB vs "
          f"{os.path.getsize(arpa) / 1e6:.1f} MB ARPA)")

    rows = []
    meta = {"T_frames": T, "B_conservative": B,
            "lm": "synthetic 3-gram (4k vocab, 60k bi / 120k tri)"
                  if not LM_PATH else LM_PATH,
            "lm_load_s": {"text": round(t_text, 2),
                          "binary": round(t_bin, 3)},
            "reps_per_row": reps}
    try:
        import jax
        meta["device"] = str(jax.devices()[0])
    except Exception:
        meta["device"] = "unknown"

    rng = np.random.default_rng(1)
    probs = rand_probs(rng, B, T, len(DEFAULT_LABELS))
    # C++ rows: single repetition basis is one full decode of the batch;
    # single-thread (scales with lm.lm_workers cores in the server)
    for width in (10, 128):
        for name, dec in (("text", d_text), ("binary", d_bin)):
            dec.beam_width = width
            timed_row(rows, lambda d=dec: d.decode(probs),
                      reps, path=f"cpp-{name}", width=width, lm="kenlm",
                      batch=B, regime="flat", n_best="all")

    # on-device beam: LM-free and with on-device LM fusion
    from dsjax.decode.beam_device import DeviceBeamDecoder

    t0 = time.perf_counter()
    dev_lm_dec = DeviceBeamDecoder(DEFAULT_LABELS, beam_width=10,
                                   lm_path=arpa, alpha=0.4, beta=0.85)
    t_pack = time.perf_counter() - t0
    shared = dev_lm_dec._lm
    meta["device_lm_pack_upload_s"] = round(t_pack, 2)
    print(f"device LM pack+upload: {t_pack:.2f}s")
    ctc_probs = rand_probs(np.random.default_rng(2), B, T,
                           len(DEFAULT_LABELS), blank_bias=3.0)
    for width in (10, 128):
        for name, dd in (("none", DeviceBeamDecoder(DEFAULT_LABELS,
                                                    beam_width=width)),
                         ("fused", DeviceBeamDecoder(
                             DEFAULT_LABELS, beam_width=width,
                             shared_lm=shared, alpha=0.4, beta=0.85))):
            dd.decode(probs[:2, :64])  # warm compile
            dd.decode(probs)           # warm the full shape
            for tag, p in (("flat", probs), ("ctc", ctc_probs)):
                timed_row(rows, lambda d=dd, pp=p: d.decode(pp),
                          reps, path="device", width=width, lm=name,
                          batch=B, regime=tag, n_best="all")

    # EVAL regime: batch 64, top hypothesis only, blank-dominated — the
    # exact shape evaluate() runs (the rows above are the conservative
    # B=16 / n_best=all setting, which ships a (T, B, W) char stream per
    # batch).  Timed in BOTH posterior placements: "host" uploads numpy
    # posteriors per call; "device" passes device-resident posteriors —
    # evaluate() runs the device placement (workflows.py keeps the
    # acoustic model's output on device; accepts_device_arrays).
    # DSJAX_BEAM_EVAL_BATCH overrides the 64.
    import jax
    import jax.numpy as jnp

    eb = int(os.environ.get("DSJAX_BEAM_EVAL_BATCH", "64"))
    meta["B_eval"] = eb
    eval_probs = rand_probs(np.random.default_rng(3), eb, T,
                            len(DEFAULT_LABELS), blank_bias=3.0)
    eval_probs_dev = jnp.asarray(eval_probs)
    jax.block_until_ready(eval_probs_dev)
    for width in (10, 32, 128):
        for name, dd in (("none", DeviceBeamDecoder(DEFAULT_LABELS,
                                                    beam_width=width)),
                         ("fused", DeviceBeamDecoder(
                             DEFAULT_LABELS, beam_width=width,
                             shared_lm=shared, alpha=0.4, beta=0.85))):
            dd.decode(eval_probs[:2, :64], n_best=1)   # warm compile
            dd.decode(eval_probs, n_best=1)            # warm the full shape
            for place, p in (("host", eval_probs), ("device", eval_probs_dev)):
                timed_row(rows, lambda d=dd, pp=p: d.decode(pp, n_best=1),
                          reps, path="device", width=width, lm=name,
                          batch=eb, regime="ctc", n_best="1",
                          posteriors=place)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"meta": meta, "rows": rows}, f, indent=1)
        print(f"wrote {args.json} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
