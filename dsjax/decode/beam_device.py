"""Batched CTC beam search ON DEVICE (no LM): the whole search runs as one
jitted lax.scan over time with (B, W) beam state, so serving/eval can decode
a full batch without shipping posteriors to the host (the reference's
ctcdecode copies probs to CPU and fans out to threads, decoder.py:113-114).

Algorithm: merge-free beam search (the standard GPU/TPU formulation, e.g.
FlexCTC): each beam keeps (p_blank, p_nonblank, last_char); per step it
expands to {stay} ∪ {extend with each c}, and the top-W candidates by total
score survive. Hypotheses that collapse to the same prefix are NOT merged
(exact prefix merging needs per-step sorting by prefix identity); with
moderate beam widths this matches exact prefix search on peaked ASR
posteriors and differs only on diffuse frames. The exact (merging) search
lives in dsjax.decode.beam (host C++/Python) for LM decoding and parity.

Emission history is stored as per-step backpointers (parent slot, emitted
char) and reconstructed on the host with one vectorized numpy backward pass.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dsjax.labels import LabelMap

NEG = -1e30


@functools.partial(jax.jit, static_argnames=("beam_width", "blank"))
def _beam_scan(log_probs: jnp.ndarray, sizes: jnp.ndarray, beam_width: int,
               blank: int):
    """log_probs (B, T, C) -> (backptr (T, B, W), emit (T, B, W),
    final total scores (B, W))."""
    b_dim, t_dim, c_dim = log_probs.shape
    w = beam_width
    lp = jnp.transpose(log_probs, (1, 0, 2))            # (T, B, C)

    p_b0 = jnp.full((b_dim, w), NEG).at[:, 0].set(0.0)  # only beam 0 alive
    p_nb0 = jnp.full((b_dim, w), NEG)
    last0 = jnp.full((b_dim, w), -1, jnp.int32)

    classes = jnp.arange(c_dim)

    def step(carry, inp):
        p_b, p_nb, last = carry
        lp_t, t = inp
        total = jnp.logaddexp(p_b, p_nb)                # (B, W)

        # stay: emit blank (from total) or repeat last char (from p_nb)
        lp_blank = lp_t[:, blank][:, None]
        lp_last = jnp.take_along_axis(lp_t, jnp.maximum(last, 0), axis=1)
        stay_b = total + lp_blank
        stay_nb = jnp.where(last >= 0, p_nb + lp_last, NEG)
        stay_total = jnp.logaddexp(stay_b, stay_nb)     # (B, W)

        # extend with char c: from total if c != last else from p_b only
        from_score = jnp.where(last[:, :, None] == classes[None, None, :],
                               p_b[:, :, None], total[:, :, None])
        ext = from_score + lp_t[:, None, :]             # (B, W, C)
        ext = ext.at[:, :, blank].set(NEG)

        # candidate pool: W stay + W*C extend
        cand = jnp.concatenate([stay_total, ext.reshape(b_dim, w * c_dim)],
                               axis=1)                  # (B, W + W*C)
        top_scores, top_idx = jax.lax.top_k(cand, w)    # (B, W)

        is_stay = top_idx < w
        parent = jnp.where(is_stay, top_idx, (top_idx - w) // c_dim)
        char = jnp.where(is_stay, -1, (top_idx - w) % c_dim).astype(jnp.int32)

        take = lambda a: jnp.take_along_axis(a, parent, axis=1)
        new_p_b = jnp.where(is_stay, take(stay_b), NEG)
        new_p_nb = jnp.where(is_stay, take(stay_nb),
                             top_scores)                # extends are pure nb
        new_last = jnp.where(is_stay, take(last), char)

        # frames past each utterance's length leave the state unchanged
        act = (t < sizes)[:, None]
        p_b = jnp.where(act, new_p_b, p_b)
        p_nb = jnp.where(act, new_p_nb, p_nb)
        last = jnp.where(act, new_last, last)
        bp = jnp.where(act, parent, jnp.arange(w)[None, :])
        em = jnp.where(act, char, -1)
        return (p_b, p_nb, last), (bp.astype(jnp.int32), em)

    (p_b, p_nb, _), (backptr, emit) = jax.lax.scan(
        step, (p_b0, p_nb0, last0), (lp, jnp.arange(t_dim)))
    return backptr, emit, jnp.logaddexp(p_b, p_nb)


class DeviceBeamDecoder:
    """On-device batched beam search (merge-free, no LM).

    Same decode() contract as GreedyDecoder/BeamCTCDecoder: returns
    (strings, offsets) with the top beam per utterance (top_paths beams
    available via n_best)."""

    def __init__(self, labels: Sequence[str], beam_width: int = 16,
                 blank_index: int = 0):
        self.label_map = LabelMap(labels, blank_index)
        self.labels = list(labels)
        self.beam_width = beam_width
        self.blank_index = blank_index

    def decode(self, probs, sizes: Optional[Sequence[int]] = None,
               n_best: int = 1) -> Tuple[List[List[str]], List[List[np.ndarray]]]:
        probs = jnp.asarray(probs)
        b, t = probs.shape[0], probs.shape[1]
        sizes_arr = (jnp.full((b,), t, jnp.int32) if sizes is None
                     else jnp.asarray(sizes, jnp.int32))
        lp = jnp.log(jnp.maximum(probs.astype(jnp.float32), 1e-30))
        backptr, emit, scores = _beam_scan(lp, sizes_arr, self.beam_width,
                                           self.blank_index)
        backptr = np.asarray(backptr)   # (T, B, W)
        emit = np.asarray(emit)
        order = np.argsort(-np.asarray(scores), axis=1)  # (B, W)

        # vectorized host backtrack: follow parents from the last frame
        t_dim, b_dim, w = backptr.shape
        slot = order[:, :n_best].copy()                  # (B, n_best)
        rev_chars = np.full((t_dim, b_dim, n_best), -1, np.int32)
        rows = np.arange(b_dim)[:, None]
        for ti in range(t_dim - 1, -1, -1):
            rev_chars[ti] = emit[ti][rows, slot]
            slot = backptr[ti][rows, slot]

        strings: List[List[str]] = []
        offsets: List[List[np.ndarray]] = []
        for i in range(b_dim):
            utt_s, utt_o = [], []
            for p in range(n_best):
                pos = np.nonzero(rev_chars[:, i, p] >= 0)[0]
                chars = rev_chars[pos, i, p]
                utt_s.append("".join(self.label_map.int_to_char[int(c)]
                                     for c in chars))
                utt_o.append(pos.astype(np.int32))
            strings.append(utt_s)
            offsets.append(utt_o)
        return strings, offsets
