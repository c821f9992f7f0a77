"""ctypes bindings for the native beam decoder / LM / Levenshtein."""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

_lib = None


def load_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    from dsjax.cpp.build import ensure_built

    path = ensure_built()
    lib = ctypes.CDLL(path)
    lib.ds_lm_load.restype = ctypes.c_void_p
    lib.ds_lm_load.argtypes = [ctypes.c_char_p]
    lib.ds_lm_free.argtypes = [ctypes.c_void_p]
    lib.ds_lm_score_word.restype = ctypes.c_double
    lib.ds_lm_score_word.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_char_p),
                                     ctypes.c_int, ctypes.c_char_p]
    lib.ds_beam_create.restype = ctypes.c_void_p
    lib.ds_beam_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                   ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_void_p]
    lib.ds_beam_free.argtypes = [ctypes.c_void_p]
    lib.ds_beam_decode.restype = ctypes.c_int
    lib.ds_beam_decode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double)]
    lib.ds_levenshtein.restype = ctypes.c_int
    lib.ds_levenshtein.argtypes = [ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
                                   ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    lib.ds_lm_build_binary.restype = ctypes.c_int
    lib.ds_lm_build_binary.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.ds_lm_order.restype = ctypes.c_int
    lib.ds_lm_order.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def build_lm_binary(arpa_path: str, out_path: str) -> None:
    """ARPA text -> mmap-ready DSLMBIN2 binary (KenLM-binary equivalent:
    O(1) load, binary-search queries; reference decoder.py:69-74 loads
    KenLM binaries through ctcdecode). v2 also carries the vocab words +
    n-gram id arrays so the ON-DEVICE beam (lm.device_beam) can pack its
    HBM tables straight from the binary."""
    rc = load_lib().ds_lm_build_binary(arpa_path.encode(), out_path.encode())
    if rc != 0:
        raise IOError(f"binary LM build failed (code {rc}) for {arpa_path}")


class CppLM:
    def __init__(self, path: str):
        self.lib = load_lib()
        self.handle = self.lib.ds_lm_load(path.encode())
        if not self.handle:
            raise IOError(f"failed to load LM from {path} (ARPA or DSLMBIN1)")

    @property
    def order(self) -> int:
        return int(self.lib.ds_lm_order(self.handle))

    def score_word(self, word: str, context: Sequence[str]) -> float:
        arr = (ctypes.c_char_p * len(context))(*[c.encode() for c in context])
        return self.lib.ds_lm_score_word(self.handle, arr, len(context),
                                         word.encode())

    def __del__(self):
        if getattr(self, "handle", None):
            self.lib.ds_lm_free(self.handle)
            self.handle = None


class CppBeamDecoder:
    """Native prefix beam search; same contract as the Python path in
    dsjax/decode/beam.py (`decode_one`-equivalent per utterance)."""

    def __init__(self, labels: Sequence[str], lm_path: Optional[str],
                 blank_index: int, space_index: int):
        self.lib = load_lib()
        self._lm = CppLM(lm_path) if lm_path else None
        label_arr = (ctypes.c_char_p * len(labels))(
            *[l.encode() for l in labels])
        self.handle = self.lib.ds_beam_create(
            label_arr, len(labels), blank_index, space_index,
            self._lm.handle if self._lm else None)

    def decode(self, probs: np.ndarray, alpha: float, beta: float,
               beam_width: int, cutoff_top_n: int, cutoff_prob: float,
               n_paths: Optional[int] = None
               ) -> List[Tuple[Tuple[int, ...], Tuple[int, ...], float]]:
        """probs: (T, C) float32 posteriors for ONE utterance."""
        probs = np.ascontiguousarray(probs, dtype=np.float32)
        t_dim, c_dim = probs.shape
        n_paths = n_paths or beam_width
        max_len = max(t_dim, 1)
        out_ids = np.zeros((n_paths, max_len), np.int32)
        out_offs = np.zeros((n_paths, max_len), np.int32)
        out_lens = np.zeros((n_paths,), np.int32)
        out_scores = np.zeros((n_paths,), np.float64)
        written = self.lib.ds_beam_decode(
            self.handle,
            probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            t_dim, c_dim, alpha, beta, beam_width, cutoff_top_n, cutoff_prob,
            n_paths, max_len,
            out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        results = []
        for i in range(written):
            n = int(out_lens[i])
            results.append((tuple(int(x) for x in out_ids[i, :n]),
                            tuple(int(x) for x in out_offs[i, :n]),
                            float(out_scores[i])))
        return results

    def __del__(self):
        if getattr(self, "handle", None):
            self.lib.ds_beam_free(self.handle)
            self.handle = None


def levenshtein(a: Sequence[int], b: Sequence[int]) -> int:
    lib = load_lib()
    aa = np.ascontiguousarray(a, dtype=np.int32)
    bb = np.ascontiguousarray(b, dtype=np.int32)
    return lib.ds_levenshtein(
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(aa),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(bb))
