"""WER / CER metrics with distributed-sum states.

Reference semantics (deepspeech_pytorch/validation.py:13-132): WER is the
word-level Levenshtein distance over reference token count; CER is the
char-level distance (spaces stripped) over reference char count; both are
accumulated as integer sum-states so they reduce exactly across processes
(torchmetrics dist_reduce_fx="sum" equivalent — here a plain psum/allreduce
of two integers per metric).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

def _py_distance(a: str, b: str) -> int:
    """Pure-python fallback (O(nm) DP, two-row)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


try:
    import Levenshtein as _Lev

    def _distance(a: str, b: str) -> int:
        return _Lev.distance(a, b)
except ImportError:
    try:  # native C++ extension (dsjax/cpp/src/beam.cpp ds_levenshtein)
        from dsjax.cpp.beam_binding import levenshtein as _cpp_lev

        def _distance(a: str, b: str) -> int:
            return _cpp_lev([ord(c) for c in a], [ord(c) for c in b])
    except Exception:
        _distance = _py_distance


def wer_distance(s1: str, s2: str) -> int:
    """Word-level edit distance via the word->char packing trick
    (reference: validation.py:116-132)."""
    vocab = set(s1.split() + s2.split())
    word2char = {w: chr(i) for i, w in enumerate(vocab)}
    w1 = "".join(word2char[w] for w in s1.split())
    w2 = "".join(word2char[w] for w in s2.split())
    return _distance(w1, w2)


def cer_distance(s1: str, s2: str) -> int:
    return _distance(s1.replace(" ", ""), s2.replace(" ", ""))


class ErrorRateState:
    """Accumulates (edit_distance_sum, denom_sum); rate = 100 * dist/denom."""

    def __init__(self):
        self.distance = 0
        self.denom = 0

    def merge(self, other: "ErrorRateState") -> None:
        self.distance += other.distance
        self.denom += other.denom

    def compute(self) -> float:
        if self.denom == 0:
            return 0.0
        return float(self.distance) / self.denom * 100.0

    def state(self) -> Tuple[int, int]:
        return self.distance, self.denom


class WordErrorRate(ErrorRateState):
    def update(self, transcript: str, reference: str) -> None:
        self.distance += wer_distance(transcript, reference)
        self.denom += len(reference.split())


class CharErrorRate(ErrorRateState):
    def update(self, transcript: str, reference: str) -> None:
        self.distance += cer_distance(transcript, reference)
        self.denom += len(reference.replace(" ", ""))


def update_batch(wer: WordErrorRate, cer: CharErrorRate,
                 transcripts: Sequence[str], references: Sequence[str]) -> None:
    for t, r in zip(transcripts, references):
        wer.update(t, r)
        cer.update(t, r)


def all_reduce_states(states: List[Tuple[int, int]]) -> Tuple[int, int]:
    d = sum(s[0] for s in states)
    n = sum(s[1] for s in states)
    return d, n
