#!/usr/bin/env python
"""Beam-decode throughput: C++ beam+LM (text vs binary load) and the
on-device LM-free beam, at reference widths 10 and 128 (reference uses
width 10 default / 128 for LM tuning, decoder.py:56-118, README.md:281-293).

Builds a synthetic 3-gram LM (no network in this sandbox; the real
3-gram.pruned.3e-7.arpa slots in via DSJAX_BEAM_LM=path), then reports:
  * LM load time: ARPA text parse vs DSLMBIN1 mmap
  * beam utt/s at width 10 / 128 on (B, T=500, C=29) posteriors
  * on-device (LM-free) beam utt/s
"""
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


def main():
    import tempfile

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

    rng = np.random.default_rng(1)
    probs = rand_probs(rng, B, T, len(DEFAULT_LABELS))
    for width in (10, 128):
        for name, dec in (("text", d_text), ("binary", d_bin)):
            dec.beam_width = width
            t0 = time.perf_counter()
            dec.decode(probs)
            dt = time.perf_counter() - t0
            print(f"c++ beam+LM  width {width:3d} ({name:6s}): "
                  f"{B / dt:7.1f} utt/s ({dt / B * 1000:.1f} ms/utt)")

    # on-device beam: LM-free and with on-device LM fusion
    from dsjax.decode.beam_device import DeviceBeamDecoder

    t0 = time.perf_counter()
    lm_dev = DeviceBeamDecoder(DEFAULT_LABELS, beam_width=10, lm_path=arpa,
                               alpha=0.4, beta=0.85)
    t_pack = time.perf_counter() - t0
    print(f"device LM pack+upload: {t_pack:.2f}s")
    ctc_probs = rand_probs(np.random.default_rng(2), B, T,
                           len(DEFAULT_LABELS), blank_bias=3.0)
    for width in (10, 128):
        for name, dd in (("no LM", DeviceBeamDecoder(DEFAULT_LABELS,
                                                     beam_width=width)),
                         ("dev LM", DeviceBeamDecoder(
                             DEFAULT_LABELS, beam_width=width, lm_path=arpa,
                             alpha=0.4, beta=0.85))):
            dd.decode(probs[:2, :64])  # warm compile
            for tag, p in (("flat ", probs), ("ctc  ", ctc_probs)):
                t0 = time.perf_counter()
                dd.decode(p)
                dt = time.perf_counter() - t0
                t0 = time.perf_counter()
                dd.decode(p)
                dt = min(dt, time.perf_counter() - t0)
                print(f"device beam  width {width:3d} ({name:6s}, {tag}): "
                      f"{B / dt:7.1f} utt/s ({dt / B * 1000:.1f} ms/utt)")

    # EVAL regime: batch 64, top hypothesis only, blank-dominated — the
    # exact shape evaluate() runs (the rows above are the conservative
    # B=16 / n_best=all setting, which ships a (T, B, W) char stream per
    # batch).  DSJAX_BEAM_EVAL_BATCH overrides the 64.
    eb = int(os.environ.get("DSJAX_BEAM_EVAL_BATCH", "64"))
    eval_probs = rand_probs(np.random.default_rng(3), eb, T,
                            len(DEFAULT_LABELS), blank_bias=3.0)
    shared = None
    for width in (10, 32, 128):
        rows = [("no LM", DeviceBeamDecoder(DEFAULT_LABELS,
                                            beam_width=width))]
        if shared is None:
            d = DeviceBeamDecoder(DEFAULT_LABELS, beam_width=width,
                                  lm_path=arpa, alpha=0.4, beta=0.85)
            shared = d._lm
        else:
            d = DeviceBeamDecoder(DEFAULT_LABELS, beam_width=width,
                                  shared_lm=shared, alpha=0.4, beta=0.85)
        rows.append(("dev LM", d))
        for name, dd in rows:
            dd.decode(eval_probs[:2, :64], n_best=1)   # warm compile
            dd.decode(eval_probs, n_best=1)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                dd.decode(eval_probs, n_best=1)
                ts.append(time.perf_counter() - t0)
            dt = float(np.median(ts))
            print(f"eval regime  width {width:3d} ({name:6s}, B={eb}, "
                  f"n_best=1): {eb / dt:7.1f} utt/s "
                  f"({dt / eb * 1000:.2f} ms/utt)")


if __name__ == "__main__":
    main()
