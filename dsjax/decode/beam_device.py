"""Batched CTC PREFIX beam search ON DEVICE (no LM): the whole search runs
as one jitted lax.scan over time with (B, W) beam state, so serving/eval can
decode a full batch without shipping posteriors to the host (the reference's
ctcdecode copies probs to CPU and fans out to threads, decoder.py:113-114).

Algorithm: each beam keeps (p_blank, p_nonblank, last_char) plus two
independent rolling hashes identifying its collapsed prefix. Per step the
pool expands to {stay} ∪ {extend with each c}; candidates are sorted by
hash and equal-prefix runs have their (p_b, p_nb) masses combined with a
segmented logsumexp (EXACT prefix merging, collision odds ~2^-64), then the
top-W merged prefixes survive. This is the same search as the host
C++/Python decoder (dsjax.decode.beam) minus LM fusion — and at equal
(non-exhaustive) widths it tends to find better hypotheses, because merged
mass competes for beam slots a step earlier than in the dict-based
formulation. Verified equal to the host search at exhaustive widths.

Emission history is stored as per-step backpointers (parent slot, emitted
char) and reconstructed on the host with one vectorized numpy backward pass.

Optional ON-DEVICE LM fusion (lm_path): the word n-gram LM lives in HBM as
hash tables (dsjax.decode.lm_device) and every beam carries rolling hashes
of its current partial word plus the ids of its last order-1 completed
words, so the scan adds ``alpha * ln P(word | context) + beta`` at space
emissions — the exact semantics of the host twin (dsjax.decode.beam:
word-boundary bonus incl. consecutive-space re-scoring and trailing-word
finalization) with zero host round-trips. The reference can only do this
by copying posteriors to the CPU and running ctcdecode+KenLM threads
(reference decoder.py:103-118).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dsjax.labels import LabelMap

NEG = -1e30


_P1 = jnp.int32(1000003)
_P2 = jnp.int32(10007)


def _seg_logaddexp(flags, values):
    """Segmented logsumexp along the last axis: runs restart where flags=1;
    each position holds the sum of its run's prefix (run totals at run ends)."""
    def combine(a, b):
        fa, va = a
        fb, vb = b
        v = jnp.where(fb > 0, vb, jnp.logaddexp(va, vb))
        return (jnp.maximum(fa, fb) * 0 + jnp.where(fb > 0, fb, fa), v)

    _, out = jax.lax.associative_scan(combine, (flags, values), axis=-1)
    return out


@functools.partial(jax.jit, static_argnames=("beam_width", "blank", "merge",
                                              "space", "cutoff_top_n",
                                              "cutoff_prob"))
def _beam_scan(log_probs: jnp.ndarray, sizes: jnp.ndarray, beam_width: int,
               blank: int, merge: bool = True, lm=None, alpha=None,
               beta=None, space: int = -1, cutoff_top_n: int = 10 ** 9,
               cutoff_prob: float = 1.0, carry0=None):
    """log_probs (B, T, C) -> (backptr (T, B, W), emit (T, B, W),
    final total scores (B, W), carry).

    ``carry0`` resumes the search from a previous call's returned carry
    (streaming: decoding chunk-by-chunk with carried beam state is EXACTLY
    the one-shot decode of the concatenated posteriors).

    merge=True performs EXACT prefix merging: every candidate carries two
    independent rolling hashes of its collapsed prefix; candidates are
    sorted by hash and equal-prefix runs have their (p_b, p_nb) masses
    combined with a segmented logsumexp before top-k. Collision probability
    is ~2^-64 per pair.

    lm (dsjax.decode.lm_device.PackedLM) enables on-device shallow fusion:
    extending a beam with `space` adds alpha * ln P(word | context) + beta
    for the completed word (memoized re-score on consecutive spaces), and
    final scores include the trailing-word bonus — matching the host
    BeamCTCDecoder's scoring exactly."""
    from dsjax.decode.lm_device import (CHAR_A1, CHAR_A2, CHAR_SEED,
                                        WID_ABSENT, score_word_ln)

    b_dim, t_dim, c_dim = log_probs.shape
    w = beam_width
    k_dim = w * (c_dim + 1)
    lp = jnp.transpose(log_probs, (1, 0, 2))            # (T, B, C)

    p_b0 = jnp.full((b_dim, w), NEG).at[:, 0].set(0.0)  # only beam 0 alive
    p_nb0 = jnp.full((b_dim, w), NEG)
    last0 = jnp.full((b_dim, w), -1, jnp.int32)
    h1_0 = jnp.ones((b_dim, w), jnp.int32)
    h2_0 = jnp.ones((b_dim, w), jnp.int32)
    cw = 1 if lm is None else max(1, lm.order - 1)
    lm0 = (jnp.full((b_dim, w), CHAR_SEED, jnp.uint32),     # cur-word hash 1
           jnp.full((b_dim, w), CHAR_SEED, jnp.uint32),     # cur-word hash 2
           jnp.full((b_dim, w, cw), WID_ABSENT, jnp.int32),  # context ids
           jnp.zeros((b_dim, w), bool),                      # in_word
           jnp.zeros((b_dim, w), jnp.float32))               # last-word bonus

    classes = jnp.arange(c_dim)
    slot_iota = jnp.arange(w)[None, :]

    prune = cutoff_top_n < c_dim or cutoff_prob < 1.0

    def step(carry, inp):
        (p_b, p_nb, last, h1, h2), lm_state = carry
        cur1, cur2, ctx, in_word, memo = lm_state
        lp_t, t = inp
        total = jnp.logaddexp(p_b, p_nb)                # (B, W)

        if prune:
            # per-step candidate pruning, host-twin semantics: keep the
            # top cutoff_top_n chars AND (only when cutoff_prob < 1, like
            # the host — f32 cumsum can reach 1.0 early and would drop
            # tail classes the host keeps) the smallest head of the sorted
            # distribution reaching cutoff_prob; a char outside the kept
            # set contributes NOTHING this frame (blank included — its
            # stay mass is dropped too)
            order = jnp.argsort(-lp_t, axis=1)
            rank = jnp.argsort(order, axis=1)           # rank in desc order
            keep = rank < cutoff_top_n                   # (B, C)
            if cutoff_prob < 1.0:
                svals = jnp.take_along_axis(lp_t, order, axis=1)
                cum = jnp.cumsum(jnp.exp(svals), axis=1)
                n_keep = jnp.sum(cum < cutoff_prob, axis=1, keepdims=True) + 1
                keep &= rank < n_keep
        else:
            keep = None

        # stay: emit blank (from total) or repeat last char (from p_nb)
        lp_blank = lp_t[:, blank][:, None]
        lp_last = jnp.take_along_axis(lp_t, jnp.maximum(last, 0), axis=1)
        stay_b = total + lp_blank
        stay_nb = jnp.where(last >= 0, p_nb + lp_last, NEG)
        if keep is not None:
            stay_b = jnp.where(keep[:, blank][:, None], stay_b, NEG)
            last_kept = jnp.take_along_axis(keep, jnp.maximum(last, 0), axis=1)
            stay_nb = jnp.where(last_kept, stay_nb, NEG)

        # extend with char c: from total if c != last else from p_b only
        from_score = jnp.where(last[:, :, None] == classes[None, None, :],
                               p_b[:, :, None], total[:, :, None])
        ext = from_score + lp_t[:, None, :]             # (B, W, C)
        ext = ext.at[:, :, blank].set(NEG)
        if keep is not None:
            ext = jnp.where(keep[:, None, :], ext, NEG)

        if lm is not None:
            # word-boundary LM bonus for every space extension: score the
            # current partial word against the beam's word history; with no
            # partial word, re-score the previous word (host-twin parity:
            # prefix.split() skips empty tokens) via the memoized bonus
            score_ln, wid = score_word_ln(lm, cur1, cur2, ctx)
            has_words = ctx[..., -1] != WID_ABSENT
            bonus_new = alpha * score_ln + beta
            bonus = jnp.where(in_word, bonus_new,
                              jnp.where(has_words, memo, 0.0))
            ext = ext.at[:, :, space].add(bonus)

        # candidate fields, pool layout [W stays | W*C extends]
        ext_h1 = (h1[:, :, None] * _P1 + (classes + 1)[None, None, :])
        ext_h2 = (h2[:, :, None] * _P2 + (classes + 1)[None, None, :])
        cand_h1 = jnp.concatenate([h1, ext_h1.reshape(b_dim, -1)], 1)
        cand_h2 = jnp.concatenate([h2, ext_h2.reshape(b_dim, -1)], 1)
        idx_flat = jnp.arange(k_dim)[None, :]

        if merge:
            # lexicographic sort by (h1, h2) — equal prefixes become
            # adjacent EXACTLY (a single-key h1 sort can interleave h1
            # collisions and split a prefix's run). Payloads ride the
            # sorting network (k-wide post-sort gathers are FAR slower on
            # TPU than sort payload carry — measured 2.5x worse at width
            # 128), but only the two masses and the flat pool index are
            # carried: parent/char/last are pure arithmetic on the pool
            # index of each top-k winner, which drops the sort from 7
            # operands to 5.
            iota = jnp.broadcast_to(idx_flat, (b_dim, k_dim)).astype(jnp.int32)
            cand_b = jnp.concatenate(
                [stay_b, jnp.full((b_dim, w * c_dim), NEG)], 1)
            cand_nb = jnp.concatenate([stay_nb, ext.reshape(b_dim, -1)], 1)
            s_h1, s_h2, s_b, s_nb, s_idx = jax.lax.sort(
                (cand_h1, cand_h2, cand_b, cand_nb, iota),
                dimension=1, num_keys=2)
            prev_h1 = jnp.pad(s_h1, ((0, 0), (1, 0)))[:, :-1]
            prev_h2 = jnp.pad(s_h2, ((0, 0), (1, 0)))[:, :-1]
            first = ((idx_flat == 0) | (s_h1 != prev_h1)
                     | (s_h2 != prev_h2)).astype(jnp.float32)
            m_b = _seg_logaddexp(first, s_b)
            m_nb = _seg_logaddexp(first, s_nb)
            # run END positions carry the full merged mass
            nxt_first = jnp.pad(first, ((0, 0), (0, 1)),
                                constant_values=1.0)[:, 1:]
            is_end = nxt_first > 0
            m_total = jnp.where(is_end, jnp.logaddexp(m_b, m_nb), NEG)
            top_scores, top_idx = jax.lax.top_k(m_total, w)
            take = lambda a: jnp.take_along_axis(a, top_idx, axis=1)
            new_p_b, new_p_nb = take(m_b), take(m_nb)
            new_h1, new_h2 = take(s_h1), take(s_h2)
            sel = take(s_idx)                   # winner's flat pool index
            sel_stay = sel < w
            char = jnp.where(sel_stay, -1,
                             (sel - w) % c_dim).astype(jnp.int32)
            parent = jnp.where(sel_stay, sel, (sel - w) // c_dim)
            new_last = jnp.where(char >= 0, char,
                                 jnp.take_along_axis(last, parent, axis=1))
        else:
            # extends carry no blank mass, so pool totals are just
            # [logaddexp(stay_b, stay_nb) | ext]; payloads reconstruct from
            # the winning pool indices like the merge branch above
            cand_total = jnp.concatenate(
                [jnp.logaddexp(stay_b, stay_nb), ext.reshape(b_dim, -1)], 1)
            top_scores, top_idx = jax.lax.top_k(cand_total, w)
            is_stay = top_idx < w
            pclip = jnp.minimum(top_idx, w - 1)
            eclip = jnp.clip(top_idx - w, 0, w * c_dim - 1)
            char = jnp.where(is_stay, -1, (top_idx - w) % c_dim).astype(jnp.int32)
            parent = jnp.where(is_stay, top_idx, (top_idx - w) // c_dim)
            gstay = lambda a: jnp.take_along_axis(a, pclip, axis=1)
            gext = lambda a: jnp.take_along_axis(a.reshape(b_dim, -1), eclip,
                                                 axis=1)
            new_p_b = jnp.where(is_stay, gstay(stay_b), NEG)
            new_p_nb = jnp.where(is_stay, gstay(stay_nb), gext(ext))
            new_last = jnp.where(is_stay, gstay(last), char)
            new_h1 = jnp.where(is_stay, gstay(h1), gext(ext_h1))
            new_h2 = jnp.where(is_stay, gstay(h2), gext(ext_h2))

        # dead beams must not alias live prefixes, and must carry NO mass:
        # top-k filler slots are run-interior positions whose (m_b, m_nb)
        # hold real PARTIAL run sums — left alive they would duplicate
        # their prefix's mass under a different hash
        dead = top_scores <= NEG / 2
        new_h1 = jnp.where(dead, -(slot_iota + 2), new_h1)
        new_h2 = jnp.where(dead, -(slot_iota + 2), new_h2)
        new_p_b = jnp.where(dead, NEG, new_p_b)
        new_p_nb = jnp.where(dead, NEG, new_p_nb)

        if lm is not None:
            # LM word state is a pure function of the selected prefix:
            # rebuild it from (parent, char) gathers instead of carrying
            # (B, W, C) candidate fields through the sort
            pick = lambda a: jnp.take_along_axis(a, parent, axis=1)
            p_cur1, p_cur2 = pick(cur1), pick(cur2)
            p_ctx = jnp.take_along_axis(ctx, parent[..., None], axis=1)
            p_in, p_memo = pick(in_word), pick(memo)
            p_bonus_new, p_wid = pick(bonus_new), pick(wid)
            is_stay = char < 0
            is_space = char == space
            cu = (jnp.maximum(char, 0) + 1).astype(jnp.uint32)
            new_cur1 = jnp.where(is_stay, p_cur1,
                                 jnp.where(is_space, CHAR_SEED,
                                           p_cur1 * CHAR_A1 + cu))
            new_cur2 = jnp.where(is_stay, p_cur2,
                                 jnp.where(is_space, CHAR_SEED,
                                           p_cur2 * CHAR_A2 + cu))
            new_in = jnp.where(is_stay, p_in, ~is_space)
            complete = is_space & p_in                  # a word just closed
            new_ctx = jnp.where(complete[..., None],
                                jnp.concatenate([p_ctx[..., 1:],
                                                 p_wid[..., None]], -1),
                                p_ctx)
            new_memo = jnp.where(complete, p_bonus_new, p_memo)
        else:
            new_cur1, new_cur2 = cur1, cur2
            new_ctx, new_in, new_memo = ctx, in_word, memo

        # frames past each utterance's length leave the state unchanged
        act = (t < sizes)[:, None]
        p_b = jnp.where(act, new_p_b, p_b)
        p_nb = jnp.where(act, new_p_nb, p_nb)
        last = jnp.where(act, new_last, last)
        h1 = jnp.where(act, new_h1, h1)
        h2 = jnp.where(act, new_h2, h2)
        lm_state = (jnp.where(act, new_cur1, cur1),
                    jnp.where(act, new_cur2, cur2),
                    jnp.where(act[..., None], new_ctx, ctx),
                    jnp.where(act, new_in, in_word),
                    jnp.where(act, new_memo, memo))
        bp = jnp.where(act, parent, slot_iota)
        em = jnp.where(act, char, -1)
        return ((p_b, p_nb, last, h1, h2), lm_state), (bp.astype(jnp.int32), em)

    init = carry0 if carry0 is not None else ((p_b0, p_nb0, last0, h1_0,
                                               h2_0), lm0)
    carry, (backptr, emit) = jax.lax.scan(step, init,
                                          (lp, jnp.arange(t_dim)))
    (p_b, p_nb, *_), lm_state = carry
    totals = jnp.logaddexp(p_b, p_nb)
    if lm is not None:
        # trailing-word finalization (host twin: prefix nonempty and not
        # ending in space gains one more word bonus); display-only — the
        # returned carry stays bonus-free so streaming can continue
        cur1, cur2, ctx, in_word, _ = lm_state
        score_ln, _ = score_word_ln(lm, cur1, cur2, ctx)
        totals = totals + jnp.where(in_word, alpha * score_ln + beta, 0.0)
    return backptr, emit, totals, carry


@jax.jit
def _backtrack(backptr, emit, order):
    """Chase parent pointers ON DEVICE: (T, B, W) backptr/emit + (B, K)
    slots-to-follow -> (T, B, K) emitted chars (int16, -1 = none) and the
    (B, K) start slots at t=0. Keeps the O(T) pointer chase off the host
    and shrinks the device->host transfer 4x (the two int32 pointer arrays
    never leave the device)."""
    def step(slot, be):
        bp, em = be
        ch = jnp.take_along_axis(em, slot, axis=1)
        return jnp.take_along_axis(bp, slot, axis=1), ch

    start, rev = jax.lax.scan(step, order, (backptr, emit), reverse=True)
    return rev.astype(jnp.int16), start


class _BeamStreamState:
    """Carried streaming-beam state: the device scan carry + per-beam
    hypothesis strings (host side) + the current best text."""

    __slots__ = ("carry", "strings", "text")

    def __init__(self, carry, strings, text):
        self.carry = carry
        self.strings = strings
        self.text = text


class DeviceBeamDecoder:
    """On-device batched beam search, with optional on-device LM fusion.

    Same decode() contract as GreedyDecoder/BeamCTCDecoder: returns
    (strings, offsets) with the top beam per utterance (top_paths beams
    available via n_best). With lm_path the word n-gram LM is packed into
    HBM hash tables once and every decode fuses alpha/beta inside the scan
    (reset_params does not rebuild the tables)."""

    def __init__(self, labels: Sequence[str], beam_width: int = 16,
                 blank_index: int = 0, lm_path: Optional[str] = None,
                 alpha: float = 0.0, beta: float = 0.0,
                 cutoff_top_n: int = 10 ** 9, cutoff_prob: float = 1.0):
        self.label_map = LabelMap(labels, blank_index)
        self.labels = list(labels)
        self.beam_width = beam_width
        self.blank_index = blank_index
        self.alpha = alpha
        self.beta = beta
        self.cutoff_top_n = cutoff_top_n
        self.cutoff_prob = cutoff_prob
        self._lm = None
        if lm_path:
            from dsjax.decode.lm_device import DeviceNgramLM

            if " " not in self.labels:
                raise ValueError("on-device LM fusion needs a space label "
                                 "(word boundaries)")
            self._lm = DeviceNgramLM(lm_path, labels, blank_index).device()

    def reset_params(self, alpha: float, beta: float) -> None:
        """LM weight update without rebuilding tables (tuner parity)."""
        self.alpha = alpha
        self.beta = beta

    def decode_chunk(self, probs, state=None):
        """Streaming decode: feed one (1, T, C) posterior chunk, carrying
        the FULL beam search state (scores, prefix hashes, LM word state)
        across calls — chunked decoding is exactly the one-shot decode of
        the concatenated posteriors.

        state: None for a new stream, else the value returned previously.
        Returns (best_text, new_state); new_state.text holds the current
        top hypothesis, new_state.strings all beam hypotheses."""
        probs = jnp.asarray(probs)
        if probs.ndim == 2:
            probs = probs[None]
        b, t = probs.shape[0], probs.shape[1]
        assert b == 1, "decode_chunk streams one utterance"
        lp = jnp.log(jnp.maximum(probs.astype(jnp.float32), 1e-30))
        lm_kw = {}
        if self._lm is not None:
            lm_kw = dict(lm=self._lm, alpha=jnp.float32(self.alpha),
                         beta=jnp.float32(self.beta),
                         space=self.label_map.space_index)
        carry0 = state.carry if state is not None else None
        backptr, emit, scores, carry = _beam_scan(
            lp, jnp.full((b,), t, jnp.int32), self.beam_width,
            self.blank_index, cutoff_top_n=self.cutoff_top_n,
            cutoff_prob=self.cutoff_prob, carry0=carry0, **lm_kw)
        w = self.beam_width
        # chunk-local backtrack ON DEVICE: slot at chunk end -> (start
        # slot, chars)
        rev_d, start_d = _backtrack(backptr, emit,
                                    jnp.arange(w, dtype=jnp.int32)[None, :])
        rev = np.asarray(rev_d)[:, 0]          # (T, W) int16
        slot = np.asarray(start_d)[0]
        old = state.strings if state is not None else [""] * w
        strings = []
        for p in range(w):
            chars = rev[:, p][rev[:, p] >= 0]
            strings.append(old[slot[p]] + "".join(
                self.label_map.int_to_char[int(c)] for c in chars))
        order = int(np.asarray(scores)[0].argmax())
        new_state = _BeamStreamState(carry, strings, strings[order])
        return strings[order], new_state

    def decode(self, probs, sizes: Optional[Sequence[int]] = None,
               n_best: Optional[int] = None
               ) -> Tuple[List[List[str]], List[List[np.ndarray]]]:
        # all beams by default (host BeamCTCDecoder contract: consumers
        # slice by lm.top_paths)
        n_best = self.beam_width if n_best is None else n_best
        probs = jnp.asarray(probs)
        b, t = probs.shape[0], probs.shape[1]
        sizes_arr = (jnp.full((b,), t, jnp.int32) if sizes is None
                     else jnp.asarray(sizes, jnp.int32))
        lp = jnp.log(jnp.maximum(probs.astype(jnp.float32), 1e-30))
        lm_kw = {}
        if self._lm is not None:
            lm_kw = dict(lm=self._lm, alpha=jnp.float32(self.alpha),
                         beta=jnp.float32(self.beta),
                         space=self.label_map.space_index)
        backptr, emit, scores, _ = _beam_scan(lp, sizes_arr, self.beam_width,
                                              self.blank_index,
                                              cutoff_top_n=self.cutoff_top_n,
                                              cutoff_prob=self.cutoff_prob,
                                              **lm_kw)
        order = np.argsort(-np.asarray(scores), axis=1)  # (B, W)

        # backtrack ON DEVICE; only the (T, B, n_best) int16 char stream
        # crosses to the host
        rev_d, _ = _backtrack(backptr, emit,
                              jnp.asarray(order[:, :n_best], jnp.int32))
        rev_chars = np.asarray(rev_d)                    # (T, B, n_best)
        b_dim = rev_chars.shape[1]

        lut = np.array([self.label_map.int_to_char.get(c, "")
                        for c in range(int(rev_chars.max(initial=0)) + 1)])
        strings: List[List[str]] = []
        offsets: List[List[np.ndarray]] = []
        for i in range(b_dim):
            utt_s, utt_o = [], []
            for p in range(n_best):
                pos = np.nonzero(rev_chars[:, i, p] >= 0)[0]
                utt_s.append("".join(lut[rev_chars[pos, i, p]]))
                utt_o.append(pos.astype(np.int32))
            strings.append(utt_s)
            offsets.append(utt_o)
        return strings, offsets
