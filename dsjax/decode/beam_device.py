"""Batched CTC PREFIX beam search ON DEVICE (no LM): the whole search runs
as one jitted lax.scan over time with (B, W) beam state, so serving/eval can
decode a full batch without shipping posteriors to the host (the reference's
ctcdecode copies probs to CPU and fans out to threads, decoder.py:113-114).

Algorithm: each beam keeps (p_blank, p_nonblank, last_char) plus two
independent rolling hashes of its collapsed prefix AND of that prefix minus
its last char. Per step the pool expands to {stay} ∪ {extend with each c}.
Because live beams hold pairwise-distinct prefixes, the only candidates
that can collapse to the same string are extend(q, c) and stay(r) with
prefix_r = prefix_q + c — found EXACTLY (collision odds ~2^-64) by an
O(W^2) hash join of parent-prefix hashes against beam hashes, with no sort
anywhere in the step. Matched extends have their mass absorbed into the
stay's p_nb; the top-W distinct prefixes then survive a plain top-k. This
is the same search as the host C++/Python decoder (dsjax.decode.beam) —
and at equal (non-exhaustive) widths it tends to find better hypotheses,
because merged mass competes for beam slots a step earlier than in the
dict-based formulation. Verified equal to the host search at exhaustive
widths.

Emission history is stored as per-step backpointers (parent slot, emitted
char) and reconstructed by a reverse on-device scan (_backtrack).

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
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dsjax.labels import LabelMap

NEG = -1e30


# numpy (not jnp) scalars: a module-level jnp constant lives on the
# device, and embedding it at trace time fetches its value back through
# the (high-latency) device transport on EVERY first lower
_P1 = np.int32(1000003)
_P2 = np.int32(10007)


def _top_k(scores, k, pallas=False):
    """Candidate selection — the hottest op of the beam step (XLA's
    lax.top_k at (16, 3840)->128 costs ~95 us of the ~150 us step).
    With pallas=True (single-device TPU decode; the DECODER decides
    outside jit — a Mosaic call cannot be GSPMD-partitioned, so sharded
    posteriors must keep lax.top_k) this dispatches to the exact Pallas
    bitonic top-k (dsjax.ops.topk_pallas; bit-identical incl. tie
    order) when the pool is >= 512 wide and k <= 128 — note the
    decoder's default beam_width=16 pool is 480, below the threshold.
    (An earlier full-sort Pallas attempt merely tied XLA — the win
    comes from the top-half-discarding merge tree.)"""
    from dsjax.ops.topk_pallas import topk

    return topk(scores, k, use_pallas=pallas)


def _as_i32(a):
    if a.dtype == jnp.int32:
        return a
    if a.dtype == jnp.bool_:
        return a.astype(jnp.int32)
    return jax.lax.bitcast_convert_type(a, jnp.int32)   # f32 / u32, exact


def _from_i32(a, dt):
    if dt == jnp.int32:
        return a
    if dt == jnp.bool_:
        return a != 0
    return jax.lax.bitcast_convert_type(a, dt)


def _gather_packed(payloads, idx):
    """Gather many (B, N) / (B, N, D) payloads at the SAME (B, K) indices
    with ONE take_along_axis. TPU gathers carry a large fixed cost per op,
    so S payloads through one (B, S, N) gather are ~S× cheaper than S
    separate gathers (the dominant cost of the beam step at width 128 was
    exactly this op dispatch). Mixed dtypes ride as exact int32 bitcasts;
    results keep each payload's dtype and trailing dim."""
    cols, widths = [], []
    for a in payloads:
        if a.ndim == 2:
            cols.append(_as_i32(a))
            widths.append(None)
        else:
            for d in range(a.shape[-1]):
                cols.append(_as_i32(a[..., d]))
            widths.append(a.shape[-1])
    stacked = jnp.stack(cols, axis=1)                    # (B, S, N)
    g = jnp.take_along_axis(stacked, idx[:, None, :], axis=2)
    out, pos = [], 0
    for a, s in zip(payloads, widths):
        if s is None:
            out.append(_from_i32(g[:, pos], a.dtype))
            pos += 1
        elif s == 0:
            out.append(jnp.zeros((idx.shape[0], idx.shape[1], 0), a.dtype))
        else:
            out.append(jnp.stack([_from_i32(g[:, pos + d], a.dtype)
                                  for d in range(s)], axis=-1))
            pos += s
    return out


@functools.partial(jax.jit, static_argnames=("beam_width", "blank", "merge",
                                              "space", "cutoff_top_n",
                                              "cutoff_prob", "pallas",
                                              "fused"))
def _beam_scan(log_probs: jnp.ndarray, sizes: jnp.ndarray, beam_width: int,
               blank: int, merge: bool = True, lm=None, alpha=None,
               beta=None, space: int = -1, cutoff_top_n: int = 10 ** 9,
               cutoff_prob: float = 1.0, carry0=None, pallas: bool = False,
               fused: bool = False):
    """log_probs (B, T, C) -> (backptr (T, B, W), emit (T, B, W),
    final total scores (B, W), carry).

    ``carry0`` resumes the search from a previous call's returned carry
    (streaming: decoding chunk-by-chunk with carried beam state is EXACTLY
    the one-shot decode of the concatenated posteriors).

    merge=True performs EXACT prefix merging via the sort-free O(W^2)
    parent-hash join described in the module docstring. Collision
    probability is ~2^-64 per pair.

    lm (dsjax.decode.lm_device.PackedLM) enables on-device shallow fusion:
    extending a beam with `space` adds alpha * ln P(word | context) + beta
    for the completed word (memoized re-score on consecutive spaces), and
    final scores include the trailing-word bonus — matching the host
    BeamCTCDecoder's scoring exactly."""
    from dsjax.decode.lm_device import (CHAR_A1, CHAR_A2, CHAR_SEED,
                                        CTX_ABSENT, EMPTY_KEY, score_word_ln)

    b_dim, t_dim, c_dim = log_probs.shape
    w = beam_width
    if (fused and lm is None and merge and cutoff_top_n >= c_dim
            and cutoff_prob >= 1.0 and w <= 128 and c_dim <= 30
            and b_dim > 0):
        # EXPERIMENTAL opt-in (``fused`` is decided by the DECODER
        # outside jit — see _fused_ok — so env/backend changes are
        # never silently burned into a cached trace): the whole scan
        # as one Pallas kernel (dsjax.ops.beam_pallas) — bit-identical
        # outputs, currently measured SLOWER than this XLA scan at
        # practical batch blocking (see its module docstring); kept as
        # the scaffold for future in-kernel LM fusion.
        from dsjax.ops.beam_pallas import fused_beam_scan

        bp_s, em_s, hists, totals, carry = fused_beam_scan(
            log_probs, sizes, w, blank, carry0=carry0)
        if carry0 is None:
            # structural carry parity with the XLA scan (lm state slot)
            cw = 1
            lm0 = (jnp.full((b_dim, w), CHAR_SEED, jnp.uint32),
                   jnp.full((b_dim, w), CHAR_SEED, jnp.uint32),
                   jnp.full((b_dim, w, 2 * cw), CTX_ABSENT, jnp.uint32),
                   jnp.zeros((b_dim, w), bool),
                   jnp.zeros((b_dim, w), jnp.float32),
                   jnp.zeros((b_dim, w, 0), jnp.float32))
            carry = (carry[0], lm0)
        return bp_s, em_s, hists, totals, carry
    lp = jnp.transpose(log_probs, (1, 0, 2))            # (T, B, C)

    p_b0 = jnp.full((b_dim, w), NEG).at[:, 0].set(0.0)  # only beam 0 alive
    p_nb0 = jnp.full((b_dim, w), NEG)
    last0 = jnp.full((b_dim, w), -1, jnp.int32)
    h1_0 = jnp.ones((b_dim, w), jnp.int32)
    h2_0 = jnp.ones((b_dim, w), jnp.int32)
    # hash of the prefix MINUS its last char (0 = empty prefix, no parent)
    ph1_0 = jnp.zeros((b_dim, w), jnp.int32)
    ph2_0 = jnp.zeros((b_dim, w), jnp.int32)
    cw = 1 if lm is None else max(1, lm.order - 1)
    nbo = 0 if lm is None else max(0, lm.order - 1)
    lm0 = (jnp.full((b_dim, w), CHAR_SEED, jnp.uint32),     # cur-word hash 1
           jnp.full((b_dim, w), CHAR_SEED, jnp.uint32),     # cur-word hash 2
           # context word hash pairs, interleaved [h1,h2]*cw oldest->newest
           jnp.full((b_dim, w, 2 * cw), CTX_ABSENT, jnp.uint32),
           jnp.zeros((b_dim, w), bool),                      # in_word
           jnp.zeros((b_dim, w), jnp.float32),               # last-word bonus
           # carried backoffs of the context's suffixes (see
           # lm_device.score_word_ln: probing them per step is the
           # avoidable half of the LM probe traffic); 0 = absent entry,
           # correct for the empty initial context
           jnp.zeros((b_dim, w, nbo), jnp.float32))

    classes = jnp.arange(c_dim)
    slot_iota = jnp.arange(w)[None, :]

    prune = cutoff_top_n < c_dim or cutoff_prob < 1.0

    def step(carry, inp):
        (p_b, p_nb, last, h1, h2, ph1, ph2), lm_state = carry
        cur1, cur2, ctx, in_word, memo, ctx_bos = lm_state
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
            # (a per-beam score cache probing only word-state-changing
            # lanes was built and A/B-measured SLOWER here: with LM fusion
            # 78-92% of w128 selections are extensions — the beam tail
            # churns — so the cache's extra carried state cost more than
            # the few duplicated gather rows it saved)
            score_ln, _, new_bos_cand = score_word_ln(
                lm, cur1, cur2, ctx.reshape(ctx.shape[:-1] + (cw, 2)),
                ctx_bos)
            has_words = ctx[..., -2] != CTX_ABSENT
            bonus_new = alpha * score_ln + beta
            bonus = jnp.where(in_word, bonus_new,
                              jnp.where(has_words, memo, 0.0))
            ext = ext.at[:, :, space].add(bonus)

        if merge:
            # EXACT merge WITHOUT sorting. Live beams hold pairwise-
            # distinct prefixes (maintained inductively), so extend
            # candidates are pairwise distinct too — extend(q, c) and
            # extend(r, c') collapse to the same string only when q = r,
            # c = c' — and stays are trivially distinct. The ONLY possible
            # equal-prefix pair is extend(q, c) vs stay(r) with
            # prefix_r = prefix_q + c, i.e. hash(q) = parent_hash(r) AND
            # c = last_r, and each such match is unique in both
            # directions. An O(W^2) hash join on the parent-prefix hashes
            # finds every match, absorbs the extend's mass into the
            # stay's p_nb, and kills the extend — replacing the
            # O(k log^2 k) 5-operand lax.sort + segmented scan (which
            # also took minutes of XLA compile at width 128).
            live = total > NEG / 2                      # beam-level
            hj = ((ph1[:, :, None] == h1[:, None, :])   # (B, Wr, Wq)
                  & (ph2[:, :, None] == h2[:, None, :])
                  & (last[:, :, None] >= 0)
                  & live[:, :, None] & live[:, None, :])
            # E[b, r, q] = ext[b, q, last_r] — the one extend score that
            # could merge into stay r from parent q. Expands in CLOSED
            # FORM (three (B, W, W) VPU ops, bitwise-identical arithmetic
            # to reading ext): the extend score is lp_t[b, last_r] plus
            # p_b[b, q] when last_q == last_r else total[b, q]; last_r is
            # never blank (extends exclude it), and pruning masks via the
            # stay path's last_kept. A (B, W, W) take_along_axis gather
            # here is pathologically slow on TPU, and the previous C
            # unrolled class selects cost ~C*W^2 where-ops per step.
            same = last[:, :, None] == last[:, None, :]     # (B, r, q)
            e_at = (jnp.where(same, p_b[:, None, :], total[:, None, :])
                    + lp_last[:, :, None])
            if keep is not None:
                e_at = jnp.where(last_kept[:, :, None], e_at, NEG)
            if lm is not None:
                # ext's space column carries the word-boundary LM bonus
                # (added above); mirror it for stays whose last char is
                # the space (-1e30 + bonus == -1e30 exactly, so masked
                # entries stay dead)
                e_at = e_at + jnp.where((last == space)[:, :, None],
                                        bonus[:, None, :], 0.0)
            absorbed = jnp.max(jnp.where(hj, e_at, NEG), axis=2)
            nb_stay = jnp.logaddexp(stay_nb, absorbed)
            # kill matched extends: killed[b, q, c] = any_r hj & last_r=c
            # (one small MXU matmul instead of a scatter)
            onehot = (jax.nn.one_hot(jnp.maximum(last, 0), c_dim,
                                     dtype=jnp.float32)
                      * (last >= 0)[..., None].astype(jnp.float32))
            killed = jnp.einsum("brq,brc->bqc", hj.astype(jnp.float32),
                                onehot) > 0.5
            ext_use = jnp.where(killed, NEG, ext)
        else:
            # extends carry no blank mass, so pool totals are just
            # [logaddexp(stay_b, stay_nb) | ext]
            nb_stay, ext_use = stay_nb, ext

        # pool layout [W stays | W*C extends]; winners reconstruct from
        # pool indices
        ext_flat = ext_use.reshape(b_dim, -1)
        cand_total = jnp.concatenate(
            [jnp.logaddexp(stay_b, nb_stay), ext_flat], 1)
        top_scores, top_idx = _top_k(cand_total, w, pallas)
        sel_stay = top_idx < w
        char = jnp.where(sel_stay, -1,
                         (top_idx - w) % c_dim).astype(jnp.int32)
        parent = jnp.where(sel_stay, top_idx, (top_idx - w) // c_dim)
        # winner payloads DERIVE from one (B, W)-wide packed gather at
        # `parent` instead of gathers over (B, W + W*C) pool arrays
        # (which cost their own construction — concats/broadcasts — plus
        # a (C+1)x-wider gather): a stay inherits its parent's fields
        # verbatim; an extend is a pure function of (parent fields,
        # char) — its p_nb IS its pool score, i.e. exactly top_scores at
        # that slot, its p_b is empty, and its hashes roll forward from
        # the parent's.
        base_payloads = [stay_b, nb_stay, last, h1, h2, ph1, ph2]
        if lm is not None:
            # fold the LM word-state payloads into the SAME packed gather
            # (one take_along_axis for all 19 columns instead of two ops;
            # every per-step gather carries a fixed dispatch cost)
            (g_sb, g_nb, g_last, g_h1, g_h2, g_ph1, g_ph2,
             p_cur1, p_cur2, p_ctx, p_in, p_memo, p_bonus_new,
             p_bos, p_newbos) = _gather_packed(
                base_payloads + [cur1, cur2, ctx, in_word, memo,
                                 bonus_new, ctx_bos, new_bos_cand], parent)
        else:
            (g_sb, g_nb, g_last, g_h1, g_h2, g_ph1,
             g_ph2) = _gather_packed(base_payloads, parent)
        new_p_b = jnp.where(sel_stay, g_sb, NEG)
        new_p_nb = jnp.where(sel_stay, g_nb, top_scores)
        new_last = jnp.where(sel_stay, g_last, char)
        new_h1 = jnp.where(sel_stay, g_h1, g_h1 * _P1 + char + 1)
        new_h2 = jnp.where(sel_stay, g_h2, g_h2 * _P2 + char + 1)
        # an extend's parent-prefix hash is its parent's full hash
        new_ph1 = jnp.where(sel_stay, g_ph1, g_h1)
        new_ph2 = jnp.where(sel_stay, g_ph2, g_h2)

        # dead beams must not alias live prefixes, and must carry NO mass:
        # left alive, a filler slot would shadow a real prefix (or match
        # the join) under a stale hash
        dead = top_scores <= NEG / 2
        new_h1 = jnp.where(dead, -(slot_iota + 2), new_h1)
        new_h2 = jnp.where(dead, -(slot_iota + 2), new_h2)
        new_ph1 = jnp.where(dead, -(slot_iota + 2), new_ph1)
        new_ph2 = jnp.where(dead, -(slot_iota + 2), new_ph2)
        new_p_b = jnp.where(dead, NEG, new_p_b)
        new_p_nb = jnp.where(dead, NEG, new_p_nb)

        if lm is not None:
            # LM word state is a pure function of the selected prefix:
            # rebuild it from the (parent, char) payloads gathered above
            # instead of carrying (B, W, C) candidate fields through the
            # sort — all payloads share the parent index, so the one
            # packed gather covered them
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
            # the committed word's canonical identity pair: the parent's
            # word hash, h1 remapped away from the vacancy/absent sentinel
            # (the same remap the build applies in lm_device._word_hash)
            w1 = jnp.where(p_cur1 == EMPTY_KEY, p_cur1 ^ jnp.uint32(1),
                           p_cur1)
            new_ctx = jnp.where(complete[..., None],
                                jnp.concatenate([p_ctx[..., 2:],
                                                 w1[..., None],
                                                 p_cur2[..., None]], -1),
                                p_ctx)
            new_memo = jnp.where(complete, p_bonus_new, p_memo)
            # the completed word's own probe backoffs become the new
            # context-suffix carries
            new_ctx_bos = jnp.where(complete[..., None], p_newbos, p_bos)
        else:
            new_cur1, new_cur2 = cur1, cur2
            new_ctx, new_in, new_memo = ctx, in_word, memo
            new_ctx_bos = ctx_bos

        # frames past each utterance's length leave the state unchanged
        act = (t < sizes)[:, None]
        p_b = jnp.where(act, new_p_b, p_b)
        p_nb = jnp.where(act, new_p_nb, p_nb)
        last = jnp.where(act, new_last, last)
        h1 = jnp.where(act, new_h1, h1)
        h2 = jnp.where(act, new_h2, h2)
        ph1 = jnp.where(act, new_ph1, ph1)
        ph2 = jnp.where(act, new_ph2, ph2)
        lm_state = (jnp.where(act, new_cur1, cur1),
                    jnp.where(act, new_cur2, cur2),
                    jnp.where(act[..., None], new_ctx, ctx),
                    jnp.where(act, new_in, in_word),
                    jnp.where(act, new_memo, memo),
                    jnp.where(act[..., None], new_ctx_bos, ctx_bos))
        bp = jnp.where(act, parent, slot_iota)
        em = jnp.where(act, char, -1)
        # post-step beam hashes stream out so ctcdecode-parity offsets can
        # reconstruct per-step beam membership on the host (dead slots hold
        # sentinel hashes that match no real prefix)
        return ((p_b, p_nb, last, h1, h2, ph1, ph2), lm_state), (
            bp.astype(jnp.int32), em, h1, h2)

    init = carry0 if carry0 is not None else ((p_b0, p_nb0, last0, h1_0,
                                               h2_0, ph1_0, ph2_0), lm0)
    carry, (backptr, emit, h1_seq, h2_seq) = jax.lax.scan(
        step, init, (lp, jnp.arange(t_dim)))
    (p_b, p_nb, *_), lm_state = carry
    totals = jnp.logaddexp(p_b, p_nb)
    if lm is not None:
        # trailing-word finalization (host twin: prefix nonempty and not
        # ending in space gains one more word bonus); display-only — the
        # returned carry stays bonus-free so streaming can continue
        cur1, cur2, ctx, in_word, _, ctx_bos = lm_state
        score_ln, _, _ = score_word_ln(
            lm, cur1, cur2, ctx.reshape(ctx.shape[:-1] + (cw, 2)), ctx_bos)
        totals = totals + jnp.where(in_word, alpha * score_ln + beta, 0.0)
    return backptr, emit, (h1_seq, h2_seq), totals, carry


@jax.jit
def _backtrack(backptr, emit, order):
    """Chase parent pointers ON DEVICE: (T, B, W) backptr/emit + (B, K)
    slots-to-follow -> (T, B, K) emitted chars (int16, -1 = none) and the
    (B, K) start slots at t=0. Keeps the O(T) pointer chase off the host
    and shrinks the device->host transfer 4x (the two int32 pointer arrays
    never leave the device)."""
    # one fused (parent, char) stream: both per-step gathers share the slot
    # index, so packing them halves the scan's op count (char in the low
    # 16 bits — chars are tiny ints, parents < W)
    packed = backptr * 65536 + (emit & 0xFFFF)

    def step(slot, pk):
        v = jnp.take_along_axis(pk, slot, axis=1)
        ch = (v & 0xFFFF).astype(jnp.int16)             # sign-extends via i16
        return v >> 16, ch

    start, rev = jax.lax.scan(step, order, packed, reverse=True)
    return rev, start


@functools.partial(jax.jit, static_argnames=("beam_width", "blank", "merge",
                                              "space", "cutoff_top_n",
                                              "cutoff_prob", "n_best",
                                              "want_hists", "pallas",
                                              "fused"))
def _decode_device(log_probs, sizes, beam_width, blank, n_best,
                   want_hists=False, merge=True, lm=None, alpha=None,
                   beta=None, space=-1, cutoff_top_n=10 ** 9,
                   cutoff_prob=1.0, pallas=False, fused=False):
    """One device program for the whole batch decode: beam scan -> rank
    beams by total score -> backtrack the top n_best. A single call (and a
    single host fetch of the (T, B, n_best) int16 char stream) instead of
    scan / score-fetch / backtrack round trips — per-call dispatch latency
    was a visible share of decode wall-clock."""
    backptr, emit, hists, totals, _carry = _beam_scan(
        log_probs, sizes, beam_width, blank, merge=merge, lm=lm, alpha=alpha,
        beta=beta, space=space, cutoff_top_n=cutoff_top_n,
        cutoff_prob=cutoff_prob, pallas=pallas, fused=fused)
    # ties resolve to the lower slot index, same as np.argsort(-scores)
    top_totals, order = jax.lax.top_k(totals, n_best)
    rev, _ = _backtrack(backptr, emit, order.astype(jnp.int32))
    return rev, (hists if want_hists else None), top_totals


@functools.partial(jax.jit, static_argnames=("beam_width", "blank", "merge",
                                              "space", "cutoff_top_n",
                                              "cutoff_prob", "pallas",
                                              "fused"))
def _decode_chunk_device(log_probs, sizes, beam_width, blank, merge=True,
                         lm=None, alpha=None, beta=None, space=-1,
                         cutoff_top_n=10 ** 9, cutoff_prob=1.0, carry0=None,
                         pallas=False, fused=False):
    """Streaming twin of _decode_device: scan one chunk from carry0, then
    backtrack EVERY beam slot to the chunk start — one device call per
    chunk (scan + backtrack + best-slot argmax fused)."""
    backptr, emit, _hists, totals, carry = _beam_scan(
        log_probs, sizes, beam_width, blank, merge=merge, lm=lm, alpha=alpha,
        beta=beta, space=space, cutoff_top_n=cutoff_top_n,
        cutoff_prob=cutoff_prob, carry0=carry0, pallas=pallas, fused=fused)
    order = jnp.broadcast_to(jnp.arange(beam_width, dtype=jnp.int32)[None],
                             (log_probs.shape[0], beam_width))
    rev, start = _backtrack(backptr, emit, order)
    return rev, start, jnp.argmax(totals, axis=1), carry


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

    # see GreedyDecoder: evaluate() may pass device arrays straight in
    accepts_device_arrays = True

    def __init__(self, labels: Sequence[str], beam_width: int = 16,
                 blank_index: int = 0, lm_path: Optional[str] = None,
                 alpha: float = 0.0, beta: float = 0.0,
                 cutoff_top_n: int = 10 ** 9, cutoff_prob: float = 1.0,
                 shared_lm=None, ctc_offsets: bool = False):
        self.label_map = LabelMap(labels, blank_index)
        self.labels = list(labels)
        self.beam_width = beam_width
        self.blank_index = blank_index
        self.alpha = alpha
        self.beta = beta
        self.cutoff_top_n = cutoff_top_n
        self.cutoff_prob = cutoff_prob
        # ctc_offsets=True: report ctcdecode-parity timesteps (loudest
        # attempt frame per char, reconstructed host-side from the streamed
        # beam-hash history + posteriors — costs one (T,B,W) int32 x2 and
        # one (B,T,C) device->host transfer per decode). Default False:
        # emission-frame offsets, zero extra transfer (eval/WER paths
        # discard offsets entirely).
        self.ctc_offsets = ctc_offsets
        self._lm = None
        if lm_path or shared_lm is not None:
            if " " not in self.labels:
                raise ValueError("on-device LM fusion needs a space label "
                                 "(word boundaries)")
        if shared_lm is not None:
            # already-packed PackedLM (e.g. one HBM table set shared by
            # several tuner workers) — skip the per-decoder build
            self._lm = shared_lm
        elif lm_path:
            from dsjax.decode.lm_device import DeviceNgramLM

            self._lm = DeviceNgramLM(lm_path, labels, blank_index).device()
        self._lm_rep = None          # lazily replicated copy (see _lm_for)
        self._lm_rep_devices = None

    @staticmethod
    def _single_device_tpu(lp) -> bool:
        """Backend is TPU and the posteriors are not sharded over more
        than one device — a Mosaic custom call has no GSPMD partitioning
        rule, while the pure-XLA path partitions cleanly."""
        if jax.default_backend() != "tpu":
            return False
        dset = getattr(getattr(lp, "sharding", None), "device_set", None)
        return not dset or len(dset) <= 1

    def _pallas_ok(self, lp) -> bool:
        """Whether the scan may use Pallas kernels for THIS decode —
        decided here, outside jit, where sharding/backend/env are
        concrete (inside a traced function they would be burned into the
        first compilation and silently stale afterwards)."""
        return (os.environ.get("DSJAX_PALLAS_TOPK", "1") != "0"
                and self._single_device_tpu(lp))

    def _fused_ok(self, lp) -> bool:
        """Whether THIS decode may use the whole-scan fused Pallas beam
        kernel (dsjax.ops.beam_pallas) — like _pallas_ok, decided
        outside jit so the DSJAX_FUSED_BEAM opt-in is re-read every
        decode (never burned stale into a cached trace), and
        independent of the DSJAX_PALLAS_TOPK top-k toggle. Also requires
        a decode the kernel can actually take (no LM, no pruning,
        width <= 128, classes <= 30): fused=True is a STATIC jit arg, so
        passing it when _beam_scan would fall through anyway forces a
        second, behaviorally identical compilation of the scan."""
        return (os.environ.get("DSJAX_FUSED_BEAM") == "1"
                and self._lm is None
                and self.beam_width <= 128
                and lp.shape[-1] <= 30
                and self.cutoff_top_n >= lp.shape[-1]
                and self.cutoff_prob >= 1.0
                and self._single_device_tpu(lp))

    def _lm_for(self, lp):
        """LM tables placed to match the posteriors: when ``lp`` is sharded
        over several devices (data-parallel evaluate), the tables must be
        COMMITTED replicated across that device set once — an uncommitted
        single-device operand of a sharded jit is re-broadcast on every
        call, which for a real LM means shipping hundreds of MB per
        batch."""
        lm = self._lm
        if lm is None:
            return None
        dset = getattr(getattr(lp, "sharding", None), "device_set", None)
        if not dset or len(dset) <= 1:
            return lm
        if self._lm_rep is None or self._lm_rep_devices != dset:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec

            mesh = Mesh(np.array(sorted(dset, key=lambda d: d.id)),
                        ("data",))
            self._lm_rep = jax.device_put(
                lm, NamedSharding(mesh, PartitionSpec()))
            self._lm_rep_devices = dset
        return self._lm_rep

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
        # one fused device call per chunk: scan + per-slot backtrack +
        # best-slot argmax (was three round trips — at streaming chunk
        # rates the per-call dispatch latency dominated)
        rev_d, start_d, best_d, carry = _decode_chunk_device(
            lp, jnp.full((b,), t, jnp.int32), self.beam_width,
            self.blank_index, cutoff_top_n=self.cutoff_top_n,
            cutoff_prob=self.cutoff_prob, carry0=carry0,
            pallas=self._pallas_ok(lp), fused=self._fused_ok(lp), **lm_kw)
        w = self.beam_width
        rev = np.asarray(rev_d)[:, 0]          # (T, W) int16
        slot = np.asarray(start_d)[0]
        old = state.strings if state is not None else [""] * w
        strings = []
        for p in range(w):
            chars = rev[:, p][rev[:, p] >= 0]
            strings.append(old[slot[p]] + "".join(
                self.label_map.int_to_char[int(c)] for c in chars))
        order = int(np.asarray(best_d)[0])
        new_state = _BeamStreamState(carry, strings, strings[order])
        return strings[order], new_state

    def decode(self, probs, sizes: Optional[Sequence[int]] = None,
               n_best: Optional[int] = None, with_scores: bool = False
               ) -> Tuple[List[List[str]], List[List[np.ndarray]]]:
        """with_scores=True appends a third element — (B, n_best) total
        log-scores per hypothesis (ctcdecode score semantics, incl. the
        trailing-word LM bonus) — for tuning/parity checks."""
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
            lm_kw = dict(lm=self._lm_for(lp), alpha=jnp.float32(self.alpha),
                         beta=jnp.float32(self.beta),
                         space=self.label_map.space_index)
        # scan + rank + backtrack in ONE device program; only the
        # (T, B, n_best) int16 char stream crosses to the host
        rev_d, hists, scores_d = _decode_device(
            lp, sizes_arr, self.beam_width, self.blank_index,
            n_best=min(n_best, self.beam_width),
            want_hists=self.ctc_offsets,
            cutoff_top_n=self.cutoff_top_n,
            cutoff_prob=self.cutoff_prob,
            pallas=self._pallas_ok(lp), fused=self._fused_ok(lp), **lm_kw)
        rev_chars = np.asarray(rev_d)                    # (T, B, n_best)
        n_best = rev_chars.shape[2]
        b_dim = rev_chars.shape[1]

        chars = [self.label_map.int_to_char.get(c, "\x00")
                 for c in range(int(rev_chars.max(initial=0)) + 1)]
        ascii_ok = all(len(ch) == 1 and ord(ch) < 128 for ch in chars)
        if ascii_ok:
            # bytes fast path: uint8 LUT + tobytes is ~7x faster than
            # joining numpy unicode scalars across B*W beams
            lut = np.array([ord(ch) for ch in chars], np.uint8)
            mk = lambda row: lut[row].tobytes().decode("ascii")
        else:
            slut = np.array(chars)
            mk = lambda row: "".join(slut[row])
        ctc = None
        if self.ctc_offsets:
            sizes_np = np.asarray(sizes_arr)
            ctc = _CtcOffsets(np.asarray(lp), sizes_np,
                              np.asarray(hists[0]), np.asarray(hists[1]),
                              self.blank_index, self.cutoff_top_n,
                              self.cutoff_prob)
        strings: List[List[str]] = []
        offsets: List[List[np.ndarray]] = []
        for i in range(b_dim):
            utt_s, utt_o = [], []
            for p in range(n_best):
                pos = np.nonzero(rev_chars[:, i, p] >= 0)[0]
                chars_row = rev_chars[pos, i, p]
                utt_s.append(mk(chars_row))
                if ctc is not None:
                    utt_o.append(ctc.offsets(i, chars_row.astype(np.int64),
                                             pos))
                else:
                    utt_o.append(pos.astype(np.int32))
            strings.append(utt_s)
            offsets.append(utt_o)
        if with_scores:
            return strings, offsets, np.asarray(scores_d)[:, :n_best]
        return strings, offsets


class _CtcOffsets:
    """ctcdecode-parity timesteps for the device beam, reconstructed on the
    host from the scan's streamed per-step beam hashes.

    ctcdecode's rule (parlance/ctcdecode path_trie.cpp, surfaced by the
    reference decoder.py:85-101): a char node's timestep is the frame with
    the highest per-frame char log-prob among every extension ATTEMPT —
    attempts happen whenever the parent prefix is in the beam and the char
    passes candidate pruning — and a pruned childless node is deleted, so
    state restarts at its next re-creation. Reconstruction per char c_j of
    a winning beam (prefix p_{j-1}, node p_j, emission frame tau_j from
    the device backtrack):

      attempts_j = {t : p_{j-1} in beam entering step t, c_j in cand_t}
      R_j        = 1 + max{t in attempts_j, t < tau_j :
                           p_j not in beam after step t}   (node death ->
                   state reset; assumes the node is childless before its
                   final emission, the overwhelmingly common case)
      offset_j   = argmax_{t in attempts_j, t >= R_j} logp[t, c_j]

    Beam membership is tested by the same int32 rolling-hash pair the scan
    merges on (collision odds ~2^-64). Exactness regimes: when _keep_all()
    proves the host trie never outgrew the width (so nothing was ever
    pruned), reconstruction is exact with no hash lookups; otherwise the
    hash path above is best-effort — attempts made by -inf "zombie"
    parents are invisible to the hash record (the scan nukes their
    hashes), a deliberate trade for streaming O(W) state."""

    def __init__(self, lp, sizes, h1_hist, h2_hist, blank,
                 cutoff_top_n, cutoff_prob):
        self.lp = lp                    # (B, T, C) log posteriors
        self.sizes = sizes
        # uint32 views so python-side hash arithmetic is plain mod-2^32
        self.h1 = h1_hist.astype(np.int64) & 0xFFFFFFFF   # (T, B, W)
        self.h2 = h2_hist.astype(np.int64) & 0xFFFFFFFF
        self.blank = blank
        self.cutoff_top_n = cutoff_top_n
        self.cutoff_prob = cutoff_prob
        self._cand = {}
        self._keepall = {}

    def _keep_all(self, i):
        """True iff a keep-all host run is self-consistent for utterance i.

        The host twin's width-prune counts EVERY live trie node — root and
        -inf "zombie" extension attempts included — not just finite-mass
        prefixes, so "the device had spare slots at every step" does NOT
        imply the host never removed a node. Replay the host's node
        creation under never-prune semantics (every live node attempts
        every non-blank candidate char each step) and confirm the node
        count never exceeds the beam width within `size` steps: then the
        host's prune really was keep-all, nothing was ever removed, and
        the exhaustive offset reconstruction below is exact. Cheap by
        construction — the count either stalls tiny (few candidates) or
        blows past W within a couple of steps (early abort)."""
        if i in self._keepall:
            return self._keepall[i]
        w = self.h1.shape[2]
        cand = self._cand_mask(i)
        size = int(self.sizes[i])
        children = [{}]          # node id -> {char: child id}; root = 0
        ok = True
        for t in range(size):
            cs = [int(c) for c in np.nonzero(cand[t])[0]
                  if int(c) != self.blank]
            for p in range(len(children)):   # nodes existing before step t
                kids = children[p]
                for c in cs:
                    if c not in kids:
                        kids[c] = len(children)
                        children.append({})
                        if len(children) > w:
                            ok = False
                            break
                if not ok:
                    break
            if not ok:
                break
        self._keepall[i] = ok
        return ok

    def _cand_mask(self, i):
        """(T, C) candidate mask replicating the scan's pruning."""
        if i in self._cand:
            return self._cand[i]
        lp = self.lp[i]
        t_dim, c_dim = lp.shape
        if self.cutoff_top_n >= c_dim and self.cutoff_prob >= 1.0:
            mask = np.ones((t_dim, c_dim), bool)
        else:
            # stable: ties at equal log-probs (clipped tiny posteriors)
            # resolve to the lower index, matching the scan's jnp.argsort
            # and the host twin's candidate selection
            order = np.argsort(-lp, axis=1, kind="stable")
            rank = np.argsort(order, axis=1)
            mask = rank < self.cutoff_top_n
            if self.cutoff_prob < 1.0:
                svals = np.take_along_axis(lp, order, axis=1)
                cum = np.cumsum(np.exp(svals), axis=1)
                n_keep = np.sum(cum < self.cutoff_prob, axis=1,
                                keepdims=True) + 1
                mask &= rank < n_keep
        self._cand[i] = mask
        return mask

    def offsets(self, i, chars, pos):
        t_dim = self.h1.shape[0]
        size = int(self.sizes[i])
        m1, m2 = self.h1[:, i, :], self.h2[:, i, :]      # post-step (T, W)
        cand = self._cand_mask(i)
        tvalid = np.arange(t_dim) < size

        # Exhaustive regime: the scan marks unfilled slots with the
        # sentinel pair (-(slot+2), -(slot+2)). Dead slots at every step
        # mean fewer FINITE prefixes than W existed throughout — but the
        # host's prune also counts -inf "zombie" trie nodes (whose hashes
        # the scan intentionally nukes), so spare device slots alone do
        # not prove the host never removed a node. _keep_all() replays
        # the host's node creation and confirms the trie never outgrew W:
        # only then was the host's prune keep-all, nothing was ever
        # removed, and attempts are a pure function of candidate masks
        # and chain creation times — reconstruct exactly, with no hash
        # lookups. (If the trie DID outgrow W, fall through to the
        # hash-history path below, which is best-effort in that regime:
        # zombie-parent attempts are invisible to the hash record.)
        w = m1.shape[1]
        sent = (np.arange(w) + 2) & 0xFFFFFFFF  # uint32 view of -(slot+2)
        dead_any = ((m1 == (0x100000000 - sent)) &
                    (m2 == (0x100000000 - sent))).any(axis=1)
        if size > 0 and bool(dead_any[:size].all()) and self._keep_all(i):
            lp = self.lp[i]
            out = np.empty(len(chars), np.int32)
            create_parent = -1                    # root exists from t=0
            for j, c in enumerate(chars):
                attempts = (cand[:, int(c)] & tvalid
                            & (np.arange(t_dim) >= create_parent + 1))
                if not attempts.any():            # defensive
                    attempts[int(pos[j])] = True
                col = np.where(attempts, lp[:, int(c)], -np.inf)
                out[j] = int(np.argmax(col))
                create_parent = int(np.nonzero(attempts)[0][0])
            return out
        # prefix hashes: empty prefix = 1 (scan init), then the scan's
        # int32 rolling update mod 2^32
        hp1, hp2 = [1], [1]
        for c in chars:
            hp1.append((hp1[-1] * int(_P1) + int(c) + 1) & 0xFFFFFFFF)
            hp2.append((hp2[-1] * int(_P2) + int(c) + 1) & 0xFFFFFFFF)
        out = np.empty(len(chars), np.int32)
        lp = self.lp[i]
        for j, c in enumerate(chars):
            # membership ENTERING step t = state after step t-1; at t=0 the
            # scan starts with the empty prefix alive (hash 1)
            in_after = (m1 == hp1[j]) & (m2 == hp2[j])
            parent_in = np.empty(t_dim, bool)
            parent_in[1:] = in_after.any(axis=1)[:-1]
            parent_in[0] = hp1[j] == 1 and hp2[j] == 1
            attempts = parent_in & cand[:, int(c)] & tvalid
            child_after = ((m1 == hp1[j + 1])
                           & (m2 == hp2[j + 1])).any(axis=1)
            tau = int(pos[j])
            deaths = np.nonzero(attempts & ~child_after
                                & (np.arange(t_dim) < tau))[0]
            r = int(deaths[-1]) + 1 if len(deaths) else 0
            window = attempts & (np.arange(t_dim) >= r)
            if not window.any():        # defensive: emission frame always
                window[tau] = True      # qualifies
            col = np.where(window, lp[:, int(c)], -np.inf)
            out[j] = int(np.argmax(col))
        return out
