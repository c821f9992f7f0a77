"""Greedy + beam decoder correctness, incl. beam-vs-brute-force and LM fusion."""

import itertools
import math

import numpy as np

from dsjax.decode.beam import BeamCTCDecoder
from dsjax.decode.greedy import GreedyDecoder
from dsjax.decode.lm import ArpaLM

LABELS = ["_", "'", "A", "B", "C", " "]


def test_greedy_collapse():
    dec = GreedyDecoder(LABELS)
    # frames: A A _ B B _ A -> "ABA"
    ids = [2, 2, 0, 3, 3, 0, 2]
    probs = np.full((1, len(ids), len(LABELS)), 0.01, np.float32)
    for t, c in enumerate(ids):
        probs[0, t, c] = 0.9
    strings, offsets = dec.decode(probs)
    assert strings[0][0] == "ABA"
    np.testing.assert_array_equal(offsets[0][0], [0, 3, 6])


def test_greedy_respects_sizes():
    dec = GreedyDecoder(LABELS)
    ids = [2, 0, 3, 4, 4]
    probs = np.full((1, len(ids), len(LABELS)), 0.01, np.float32)
    for t, c in enumerate(ids):
        probs[0, t, c] = 0.9
    strings, _ = dec.decode(probs, sizes=[3])
    assert strings[0][0] == "AB"


def test_greedy_spaces():
    dec = GreedyDecoder(LABELS)
    ids = [2, 5, 3]  # "A B"
    probs = np.full((1, 3, len(LABELS)), 0.01, np.float32)
    for t, c in enumerate(ids):
        probs[0, t, c] = 0.9
    strings, _ = dec.decode(probs)
    assert strings[0][0] == "A B"


def _brute_force_best(probs):
    """Exact posterior argmax over collapsed label sequences."""
    T, C = probs.shape
    scores = {}
    for path in itertools.product(range(C), repeat=T):
        p = math.prod(probs[t, c] for t, c in enumerate(path))
        collapsed = []
        prev = None
        for c in path:
            if c != prev and c != 0:
                collapsed.append(c)
            prev = c
        key = tuple(collapsed)
        scores[key] = scores.get(key, 0.0) + p
    return max(scores.items(), key=lambda kv: kv[1])


def test_beam_matches_brute_force_no_lm():
    rng = np.random.default_rng(5)
    T, C = 5, 4
    logits = rng.standard_normal((T, C))
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    best_seq, _ = _brute_force_best(probs)
    dec = BeamCTCDecoder(LABELS[:C], beam_width=64, cutoff_top_n=C)
    strings, _ = dec.decode(probs[None].astype(np.float32))
    expect = "".join(LABELS[c] for c in best_seq)
    assert strings[0][0] == expect


def test_beam_wider_is_no_worse_than_greedy():
    rng = np.random.default_rng(6)
    T, C = 30, len(LABELS)
    logits = rng.standard_normal((T, C)) * 2
    probs = (np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)).astype(np.float32)
    greedy = GreedyDecoder(LABELS)
    beam = BeamCTCDecoder(LABELS, beam_width=32, cutoff_top_n=C)
    g_str = greedy.decode(probs[None])[0][0][0]
    b_str = beam.decode(probs[None])[0][0][0]
    assert isinstance(b_str, str)
    # beam should at least produce a non-degenerate hypothesis
    assert len(b_str) > 0 or len(g_str) == 0


ARPA = """\\data\\
ngram 1=6
ngram 2=3

\\1-grams:
-1.0\t<s>\t-0.5
-1.2\t</s>
-0.8\tCAB\t-0.3
-1.5\tBAC\t-0.3
-0.9\tAB\t-0.2
-2.0\t<unk>

\\2-grams:
-0.2\t<s> CAB
-0.4\tCAB AB
-1.8\t<s> BAC

\\end\\
"""


def test_arpa_lm_loading_and_backoff(tmp_path):
    p = tmp_path / "test.arpa"
    p.write_text(ARPA)
    lm = ArpaLM(str(p))
    assert lm.order == 2
    # direct bigram hit
    np.testing.assert_allclose(lm.score_word("CAB", ["<s>"]), -0.2)
    # backoff: P(BAC | CAB) = b(CAB) + P(BAC) = -0.3 + -1.5
    np.testing.assert_allclose(lm.score_word("BAC", ["CAB"]), -1.8)
    # OOV -> <unk>
    np.testing.assert_allclose(lm.score_word("ZZZ", []), -2.0)


def test_beam_lm_rescoring(tmp_path):
    """With an LM strongly favoring 'CAB', ambiguous acoustics flip to it."""
    p = tmp_path / "test.arpa"
    p.write_text(ARPA)
    # acoustics slightly favor "BAC" over "CAB"
    T = 7
    C = len(LABELS)
    probs = np.full((T, C), 0.02, np.float32)
    seq_b = [3, 2, 4, 5, 0, 0, 0]   # "BAC "
    seq_c = [4, 2, 3, 5, 0, 0, 0]   # "CAB "
    for t in range(T):
        probs[t, seq_b[t]] = 0.42
        probs[t, seq_c[t]] += 0.38
    probs /= probs.sum(-1, keepdims=True)

    no_lm = BeamCTCDecoder(LABELS, beam_width=16, cutoff_top_n=C)
    s0, _ = no_lm.decode(probs[None])
    assert s0[0][0].strip() == "BAC"

    with_lm = BeamCTCDecoder(LABELS, lm_path=str(p), alpha=1.5, beta=0.0,
                             beam_width=16, cutoff_top_n=C)
    s1, _ = with_lm.decode(probs[None])
    assert s1[0][0].strip() == "CAB"

    # reset_params back to alpha=0 restores the acoustic-only result
    with_lm.reset_params(0.0, 0.0)
    s2, _ = with_lm.decode(probs[None])
    assert s2[0][0].strip() == "BAC"


def test_metrics():
    from dsjax.train.metrics import CharErrorRate, WordErrorRate

    wer, cer = WordErrorRate(), CharErrorRate()
    wer.update("THE CAT", "THE CAT")
    cer.update("THE CAT", "THE CAT")
    assert wer.compute() == 0.0 and cer.compute() == 0.0
    wer.update("THE BAT", "THE CAT")
    cer.update("THE BAT", "THE CAT")
    # 1 wrong word of 2 -> cumulative: 1/(2+2)*100 = 25
    assert wer.compute() == 25.0
    # 1 wrong char of 6+6 non-space chars
    np.testing.assert_allclose(cer.compute(), 100.0 / 12)
