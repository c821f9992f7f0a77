"""Adversarial beam-parity fuzzing (VERDICT r3 #4).

The real ctcdecode binary cannot be installed in this environment (no
network), so the ground-truth chain is fuzzed instead: the Python PathTrie
twin is pinned to a naive independent reimplementation of ctcdecode's
algorithm (tests/test_decoders.py); here the C++ native beam and the device
beam are each fuzzed against that twin — strings, offsets, AND scores —
across alphabet sizes, beam widths, cutoff_top_n/cutoff_prob combinations,
space-heavy posteriors (leading/trailing/consecutive spaces), degenerate
inputs (empty and length-1 posteriors), LM alpha/beta extremes, and
n_best > beam_width. >=500 randomized cases per decoder pair.

Reference semantics under test: deepspeech_pytorch/decoder.py:56-118
(ctcdecode.CTCBeamDecoder wrapper contract).
"""

import math

import numpy as np
import pytest

from dsjax.decode.beam import BeamCTCDecoder
from dsjax.labels import DEFAULT_LABELS

from .test_lm_device import ARPA3

FULL = list(DEFAULT_LABELS)          # blank, ', A..Z, space
LM_LABELS = ["_", "'", "A", "B", "C", " "]  # ARPA3 vocab alphabet


def _adversarial_probs(rng, t, c, space_index=None):
    """(t, c) posteriors with adversarial structure: diffuse near-ties,
    peaked rows, blank floods (merge pressure), and space floods incl.
    boosted space at the first/last frames (leading/trailing/consecutive
    spaces in the winning hypotheses)."""
    kind = int(rng.integers(0, 4))
    if kind == 0:        # diffuse near-ties
        p = rng.dirichlet(np.full(c, 0.4), size=t)
    elif kind == 1:      # peaked
        p = rng.dirichlet(np.full(c, 0.08), size=t)
    elif kind == 2:      # blank-heavy
        p = rng.dirichlet(np.full(c, 0.5), size=t)
        p[:, 0] += rng.uniform(0.5, 3.0)
    else:                # space-heavy (needs a space label)
        p = rng.dirichlet(np.full(c, 0.5), size=t)
        si = space_index if space_index is not None else c - 1
        rows = rng.integers(0, t, size=max(1, t // 2))
        p[rows, si] += rng.uniform(1.0, 4.0)
        p[0, si] += 2.0   # leading space
        p[-1, si] += 2.0  # trailing space
    return (p / p.sum(axis=1, keepdims=True)).astype(np.float32)


def _hyp_map(hyps):
    """hypothesis list -> {ids: (offsets, score)}; asserts ids unique."""
    m = {}
    for ids, offs, score in hyps:
        key = tuple(ids)
        assert key not in m, f"duplicate hypothesis {key}"
        m[key] = (tuple(offs), float(score))
    return m


def test_fuzz_cpp_matches_python_twin(tmp_path):
    """>=500 randomized cases: the C++ native beam must equal the Python
    PathTrie twin hypothesis-for-hypothesis — same prefix set, exactly the
    same ctcdecode timestep offsets, scores to float tolerance — at every
    width/cutoff/LM-weight combination."""
    arpa = tmp_path / "t3.arpa"
    arpa.write_text(ARPA3)

    dec_plain = BeamCTCDecoder(FULL, beam_width=8, cutoff_top_n=len(FULL))
    dec_lm = BeamCTCDecoder(LM_LABELS, lm_path=str(arpa), beam_width=8,
                            cutoff_top_n=len(LM_LABELS))
    assert dec_plain._cpp is not None and dec_lm._cpp is not None

    rng = np.random.default_rng(2024)
    widths = [1, 2, 3, 8, 17]
    top_ns = [1, 2, 5, 10 ** 9]
    cprobs = [0.3, 0.7, 1.0]
    ab_extremes = [(-5.0, 5.0), (5.0, -5.0), (0.75, 0.3), (0.0, 0.0),
                   (-0.6, 0.0)]
    n_cases = 520
    for case in range(n_cases):
        with_lm = case % 2 == 1
        dec = dec_lm if with_lm else dec_plain
        c = len(dec.labels)
        t = int(rng.integers(1, 13))
        dec.beam_width = widths[case % len(widths)]
        dec.cutoff_top_n = top_ns[(case // 2) % len(top_ns)]
        dec.cutoff_prob = cprobs[(case // 3) % len(cprobs)]
        dec.alpha, dec.beta = ab_extremes[(case // 5) % len(ab_extremes)]
        probs = _adversarial_probs(rng, t, c, dec.space_index)

        alpha = dec.alpha if dec.lm is not None else 0.0
        beta = dec.beta if dec.lm is not None else 0.0
        cpp = dec._cpp.decode(probs, alpha, beta, dec.beam_width,
                              dec.cutoff_top_n, dec.cutoff_prob)
        py = dec._decode_one(probs)

        ctx = (f"case {case}: t={t} w={dec.beam_width} "
               f"top_n={dec.cutoff_top_n} cprob={dec.cutoff_prob} "
               f"lm={with_lm} a={alpha} b={beta}")
        assert cpp[0][0] == py[0][0], f"{ctx}: top-1 ids differ"
        m_cpp, m_py = _hyp_map(cpp), _hyp_map(py)
        assert set(m_cpp) == set(m_py), f"{ctx}: beam prefix sets differ"
        for key in m_cpp:
            offs_c, score_c = m_cpp[key]
            offs_p, score_p = m_py[key]
            assert offs_c == offs_p, f"{ctx}: offsets differ for {key}"
            np.testing.assert_allclose(score_c, score_p, rtol=1e-5,
                                       atol=1e-6, err_msg=ctx)


def test_fuzz_cpp_empty_and_len1(tmp_path):
    """Degenerate posteriors: T=1 at every width/cutoff; the decode() API
    with sizes=0 rows (empty utterances) returns "" for both backends."""
    rng = np.random.default_rng(7)
    dec = BeamCTCDecoder(FULL, beam_width=4, cutoff_top_n=3)
    for _ in range(20):
        probs = _adversarial_probs(rng, 1, len(FULL), dec.space_index)
        cpp = dec._cpp.decode(probs, 0.0, 0.0, dec.beam_width,
                              dec.cutoff_top_n, dec.cutoff_prob)
        py = dec._decode_one(probs)
        assert cpp[0][0] == py[0][0]
        assert _hyp_map(cpp).keys() == _hyp_map(py).keys()
    # empty utterance through the public API (sizes=0)
    batch = np.stack([_adversarial_probs(rng, 6, len(FULL)) for _ in range(2)])
    strings, offsets = dec.decode(batch, sizes=[0, 6])
    assert strings[0][0] == ""
    assert offsets[0][0].size == 0


# ---------------------------------------------------------------------------
# device beam vs host twin (through the C++ backend, itself pinned to the
# Python twin above) at exhaustive widths, batched so each (shape, cutoff)
# group compiles once
# ---------------------------------------------------------------------------


def _device_group(labels, t_dim, width, cutoff_top_n, cutoff_prob, n_cases,
                  seed, lm_path=None, alpha=0.0, beta=0.0):
    jax = pytest.importorskip("jax")
    from dsjax.decode.beam_device import DeviceBeamDecoder

    rng = np.random.default_rng(seed)
    c = len(labels)
    host = BeamCTCDecoder(labels, lm_path=lm_path, alpha=alpha, beta=beta,
                          beam_width=width, cutoff_top_n=cutoff_top_n,
                          cutoff_prob=cutoff_prob)
    dev = DeviceBeamDecoder(labels, beam_width=width, lm_path=lm_path,
                            alpha=alpha, beta=beta,
                            cutoff_top_n=cutoff_top_n,
                            cutoff_prob=cutoff_prob, ctc_offsets=True)
    space = labels.index(" ") if " " in labels else None
    probs = np.stack([_adversarial_probs(rng, t_dim, c, space)
                      for _ in range(n_cases)])
    # empty + length-1 + truncated rows ride along in every group
    sizes = rng.integers(0, t_dim + 1, size=n_cases).astype(np.int32)
    sizes[0], sizes[1] = 0, 1
    sizes[2:] = np.maximum(sizes[2:], 2)

    d_strings, d_offsets, d_scores = dev.decode(probs, sizes=sizes, n_best=1,
                                                with_scores=True)
    h_strings, h_offsets = host.decode(probs, sizes=sizes)
    # host scores via the backend directly (decode() drops them)
    for i in range(n_cases):
        ctx = (f"group w={width} top_n={cutoff_top_n} cprob={cutoff_prob} "
               f"lm={bool(lm_path)} a={alpha} b={beta}: case {i} "
               f"size={sizes[i]}")
        assert d_strings[i][0] == h_strings[i][0], (
            f"{ctx}: {d_strings[i][0]!r} != {h_strings[i][0]!r}")
        np.testing.assert_array_equal(np.asarray(d_offsets[i][0]),
                                      np.asarray(h_offsets[i][0]),
                                      err_msg=ctx)
        if sizes[i] > 0:
            a_ = host.alpha if host.lm is not None else 0.0
            b_ = host.beta if host.lm is not None else 0.0
            h_hyps = host._cpp.decode(probs[i, :sizes[i]], a_, b_,
                                      width, cutoff_top_n, cutoff_prob)
            np.testing.assert_allclose(float(d_scores[i][0]), h_hyps[0][2],
                                       rtol=2e-3, atol=2e-3, err_msg=ctx)


def test_fuzz_device_matches_host_exhaustive(tmp_path):
    """>=500 randomized cases in compiled batches: at exhaustive beam width
    (W >= all reachable prefixes, so pruning-order freedom vanishes) the
    device beam must match the host beam on strings, ctcdecode offsets, and
    total scores, across cutoff combinations and LM alpha/beta extremes."""
    labels4 = ["_", "A", "B", " "]  # C=4: <=121 prefixes at T=4 -> W=128
    groups = [
        dict(cutoff_top_n=10 ** 9, cutoff_prob=1.0),
        dict(cutoff_top_n=3, cutoff_prob=1.0),
        dict(cutoff_top_n=10 ** 9, cutoff_prob=0.85),
        dict(cutoff_top_n=2, cutoff_prob=0.6),
    ]
    for gi, g in enumerate(groups):
        _device_group(labels4, t_dim=4, width=128, n_cases=100,
                      seed=100 + gi, **g)

    # LM groups: ARPA3 vocab alphabet; T=3 keeps W=256 exhaustive
    arpa = tmp_path / "t3.arpa"
    arpa.write_text(ARPA3)
    for gi, (alpha, beta) in enumerate([(5.0, -5.0), (-5.0, 5.0),
                                        (0.75, 0.3)]):
        _device_group(LM_LABELS, t_dim=3, width=256, n_cases=40,
                      seed=200 + gi, cutoff_top_n=10 ** 9, cutoff_prob=1.0,
                      lm_path=str(arpa), alpha=alpha, beta=beta)


def test_fuzz_device_n_best_exceeds_width():
    """n_best > beam_width: the device clamps to beam_width hypotheses; the
    host returns its full beam; the overlapping top-1 must agree at
    exhaustive width."""
    pytest.importorskip("jax")
    from dsjax.decode.beam_device import DeviceBeamDecoder

    labels4 = ["_", "A", "B", " "]
    rng = np.random.default_rng(3)
    host = BeamCTCDecoder(labels4, beam_width=128, cutoff_top_n=4)
    dev = DeviceBeamDecoder(labels4, beam_width=128)
    probs = np.stack([_adversarial_probs(rng, 4, 4, 3) for _ in range(5)])
    d_strings, d_offsets = dev.decode(probs, n_best=200)
    h_strings, _ = host.decode(probs, n_best=200)
    for i in range(5):
        assert len(d_strings[i]) == 128  # clamped to beam_width
        assert len(d_offsets[i]) == 128
        assert d_strings[i][0] == h_strings[i][0]


def test_keep_all_gate():
    """_keep_all replays the host twin's trie growth (zombie nodes
    included) under never-prune semantics: a 1-non-blank-candidate chain
    stays at T+1 nodes (keep-all), a branching alphabet blows past a small
    width within a couple of steps (gate must refuse)."""
    pytest.importorskip("jax")
    from dsjax.decode.beam_device import _CtcOffsets

    t_dim, w = 6, 16

    def offs(c_dim, cutoff_top_n, width):
        lp = np.log(np.full((1, t_dim, c_dim), 1.0 / c_dim, np.float32))
        h = np.zeros((t_dim, 1, width), np.int32)
        return _CtcOffsets(lp, np.array([t_dim], np.int32), h, h,
                           blank=0, cutoff_top_n=cutoff_top_n,
                           cutoff_prob=1.0)

    # chain regime: one non-blank candidate -> T+1 = 7 nodes <= 16
    assert offs(c_dim=2, cutoff_top_n=10 ** 9, width=w)._keep_all(0)
    # branching: 3 non-blank candidates -> 1+3+12+... > 4 by step 2
    assert not offs(c_dim=4, cutoff_top_n=10 ** 9, width=4)._keep_all(0)
    # same branching alphabet, exhaustive width: the trie tops out at
    # sum_{k<=6} 3^k = 1093 nodes, within a 2048 width
    assert offs(c_dim=4, cutoff_top_n=10 ** 9, width=2048)._keep_all(0)
    # cutoff_top_n=2 with blank among candidates -> at most one non-blank
    # extension char per step: chain regime even for a big alphabet
    assert offs(c_dim=29, cutoff_top_n=2, width=w)._keep_all(0)


def test_fuzz_device_exhaustive_chain_regime():
    """Chain regime (1 non-blank candidate per step, trie <= T+1 nodes):
    the keep-all gate holds, the exhaustive no-hash reconstruction fires,
    and device offsets must equal the host twin EXACTLY, across random
    posteriors and sizes."""
    pytest.importorskip("jax")
    from dsjax.decode.beam_device import DeviceBeamDecoder

    labels = ["_", "A"]
    rng = np.random.default_rng(77)
    t_dim, w, n_cases = 6, 16, 60
    host = BeamCTCDecoder(labels, beam_width=w)
    dev = DeviceBeamDecoder(labels, beam_width=w, ctc_offsets=True)
    probs = np.stack([_adversarial_probs(rng, t_dim, 2)
                      for _ in range(n_cases)])
    sizes = rng.integers(1, t_dim + 1, size=n_cases).astype(np.int32)
    d_strings, d_offsets = dev.decode(probs, sizes=sizes, n_best=1)
    h_strings, h_offsets = host.decode(probs, sizes=sizes)
    for i in range(n_cases):
        assert d_strings[i][0] == h_strings[i][0], f"case {i}"
        np.testing.assert_array_equal(np.asarray(d_offsets[i][0]),
                                      np.asarray(h_offsets[i][0]),
                                      err_msg=f"case {i} size={sizes[i]}")
