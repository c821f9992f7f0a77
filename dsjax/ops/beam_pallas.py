"""The WHOLE CTC prefix-beam-search scan as ONE Pallas TPU kernel.

Status: EXPERIMENTAL, opt-in via DSJAX_FUSED_BEAM=1 — measured SLOWER
than the XLA scan it mirrors, and kept (bit-exact + tested) as the
scaffold for future in-kernel LM fusion.  The honest numbers, all on a
v5e chip at (B=16, T=500, W=128, C=29):

* XLA scan (beam_device._beam_scan after the round-4 rewrites: derived
  payloads, closed-form e_at, Pallas top-k): 128 us/step.
* a pallas_call per frame inside lax.scan: ~78 us LAUNCH OVERHEAD alone
  (a trivial copy kernel) — why the per-step Pallas top-k only nets
  ~14 us despite its network running in 9-13 us.
* this kernel (whole scan fused, state resident in VMEM across a
  (batch-blocks, T) grid): 157 us/step at bblk=8 — the VPU executes the
  step's ~250 vector ops serially, while XLA's per-op schedule overlaps
  DMA/VPU across its small HLOs; and bblk=16, which would halve the
  serial blocks, is WORSE on both axes (166 us/step, 578 s Mosaic
  compile vs ~90 s — VMEM pressure from the (16, 128, 128) merge
  intermediates).

Scope: the no-LM, no-pruning search; beam_device._beam_scan dispatches
here only when DSJAX_FUSED_BEAM=1, W <= 128, C <= 30 on TPU, and falls
back to the XLA scan otherwise.

Design notes (all exactness-critical — this kernel must reproduce the
XLA scan BIT-FOR-BIT, slot order included, because the decoder-parity
fuzz suite pins strings, ctcdecode offsets, scores, and tie behavior):

* Layouts: beam state is (B, 128) — W on the 128 hardware lanes, padded
  with permanently-dead slots when W < 128 (their candidates tie at the
  same -1e30 the XLA pool produces and rank after the real stays, so
  they are never selected while any real slot exists; forced dead +
  sentinel-hashed every step regardless).  The candidate pool is
  (B, C+1 rows, 128 lanes): row 0 the stays, row 1+c the class-c
  extends — exactly the shape the bitonic top-k network (see
  dsjax.ops.topk_pallas) wants, so selection runs with zero reshaping.
* Pool order keys: lax.top_k breaks score ties by flat pool index
  [W stays | W*C extends, q-major].  The kernel carries the
  order-isomorphic key ik = q for stays, 2^14 + (q << ceil_log2(C)) + c
  for extends — same (stay-first, then q-major, c-minor) order, cheap
  shift/mask decomposition into (parent, char) after selection.
* No gathers, no matmuls, no transposes exist on the VPU; every
  data-dependent access is a masked-broadcast + reduce:
    - lane->sublane "transpose" of a (B, 1, W) vector: broadcast against
      a STATIC identity mask (iota_row == iota_lane) and max-reduce the
      lanes — two VPU ops, exact for every dtype.
    - gather payload[b, parent[b, k]]: payloads transposed to rows once,
      then masked by (iota_row == parent[b, k]) and row-reduced.
    - the O(W^2) merge hash-join keeps its (B, W, W) equality mask, but
      the matched parent's fields are extracted by masked reduction —
      the (B, W, W) e_at score matrix of the XLA path is never
      materialized (the join match is unique per beam, so a masked max
      IS the gather).
  The one extra care: XLA's `absorbed` fills no-match rows with -1e30
  (not -inf), which CLAMPS a decayed p_nb back up to ~-1e30 through the
  logaddexp — reproduced exactly (`where(has_match, val, NEG)`).
* f32 ops (logaddexp via max + log1p(exp(-|d|)), the jnp formula) hit
  the same VPU instructions as the XLA scan, so values match bitwise —
  asserted on hardware by tests/test_beam_pallas.py (DSJAX_TEST_TPU=1)
  and continuously by the fuzz suite run against the dispatching
  decoder.

Reference behavior matched: the prefix beam search of parlance/ctcdecode
(wrapped at reference decoder.py:56-118), reimplemented TPU-resident;
see dsjax/decode/beam_device.py for the algorithm-level docs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

# the authoritative prefix-hash constants (beam_device imports this
# module lazily inside _beam_scan, so the top-level import is cycle-free)
from dsjax.decode.beam_device import _P1, _P2
from dsjax.ops.topk_pallas import (_before, _clean_rows, _half_desc_mask,
                                   _sort_rows)

NEG = np.float32(-1e30)          # the scan's "log zero" (beam_device.NEG)
NEG_FILL = np.float32(-np.inf)   # pool padding: strictly below every score
LANES = 128
EXT_BASE = np.int32(1 << 14)     # ik offset separating extends from stays
I32_MIN = np.int32(-2 ** 31)


def _ceil_log2(n: int) -> int:
    b = 0
    while (1 << b) < n:
        b += 1
    return b


def _logaddexp(a, b):
    """jnp.logaddexp's exact formula (max + log1p(exp(-|d|))); neither
    operand is ever NaN here and at least one is > -inf."""
    m = jnp.maximum(a, b)
    d = jnp.abs(a - b)
    return m + jnp.log1p(jnp.exp(-d))


def _to_rows(x, fill):
    """(B, 1, W) lane vector -> (B, W, 1) row vector via a static
    identity mask + lane reduction (no transpose unit needed; exact)."""
    ident = (lax.broadcasted_iota(jnp.int32, (1, LANES, LANES), 1)
             == lax.broadcasted_iota(jnp.int32, (1, LANES, LANES), 2))
    return jnp.max(jnp.where(ident, x, fill), axis=2, keepdims=True)


def _to_lanes(x, fill):
    """(B, W, 1) row vector -> (B, 1, W) lane vector (same trick)."""
    ident = (lax.broadcasted_iota(jnp.int32, (1, LANES, LANES), 1)
             == lax.broadcasted_iota(jnp.int32, (1, LANES, LANES), 2))
    return jnp.max(jnp.where(ident, x, fill), axis=1, keepdims=True)


def _beam_kernel(lp_ref, sizes_ref, init_refs_and_outs, *, c_dim,
                 w, blank, bblk):
    (ipb, ipnb, ilast, ih1, ih2, iph1, iph2,
     bp_ref, em_ref, h1s_ref, h2s_ref,
     pb_ref, pnb_ref, last_ref, h1_ref, h2_ref, ph1_ref, ph2_ref) = \
        init_refs_and_outs
    t = pl.program_id(1)
    rows = 1 << _ceil_log2(c_dim + 1)            # pool rows (pow2 >= C+1)
    sc = _ceil_log2(c_dim)                        # ik class-bit width

    @pl.when(t == 0)
    def _init():
        pb_ref[...] = ipb[...]
        pnb_ref[...] = ipnb[...]
        last_ref[...] = ilast[...]
        h1_ref[...] = ih1[...]
        h2_ref[...] = ih2[...]
        ph1_ref[...] = iph1[...]
        ph2_ref[...] = iph2[...]

    # ---- read state (B, 128); a (B, 1, W) view for 3D broadcasts
    p_b = pb_ref[...]
    p_nb = pnb_ref[...]
    last = last_ref[...]
    h1 = h1_ref[...]
    h2 = h2_ref[...]
    ph1 = ph1_ref[...]
    ph2 = ph2_ref[...]
    v = lambda x: x[:, None, :]                   # (B, W) -> (B, 1, W)

    lp_t = lp_ref[0]                              # (B, Cpad) lanes=classes
    total = _logaddexp(p_b, p_nb)

    # lp as (B, rows, 1) row vectors via identity-mask lane reduction:
    # lp_cls_rows[b, r] = lp_t[b, r] (class-indexed, for the lp_last
    # lookup); lp_ext_rows[b, row] = lp_t[b, row - 1] (pool-row-indexed:
    # pool row 1 + c is class c).  Pad classes hold -inf.
    riota = lax.broadcasted_iota(jnp.int32, (1, rows, lp_t.shape[1]), 1)
    liota = lax.broadcasted_iota(jnp.int32, (1, rows, lp_t.shape[1]), 2)
    lp_cls_rows = jnp.max(jnp.where(riota == liota, lp_t[:, None, :],
                                    NEG_FILL),
                          axis=2, keepdims=True)  # (B, rows, 1)
    lp_ext_rows = jnp.max(jnp.where(riota - 1 == liota, lp_t[:, None, :],
                                    NEG_FILL),
                          axis=2, keepdims=True)  # (B, rows, 1)

    # ---- stays
    lp_blank = lp_t[:, blank][:, None]            # (B, 1)
    # lp_last[b, q] = lp_t[b, last[b, q]] : mask class rows by last and
    # row-reduce (exact; -inf where last < 0, masked below like XLA's
    # max(last, 0) + where)
    row_iota = lax.broadcasted_iota(jnp.int32, (1, rows, LANES), 1)
    lp_last = jnp.max(jnp.where(row_iota == v(last), lp_cls_rows,
                                NEG_FILL),
                      axis=1)                     # (B, W)
    stay_b = total + lp_blank
    stay_nb = jnp.where(last >= 0, p_nb + lp_last, NEG)

    # ---- merge join (exact prefix merge, see beam_device docstring):
    # the one parent q whose full hash equals stay r's parent-prefix
    # hash absorbs its extend into r.  All r-indexed values live on
    # rows, q-indexed on lanes.
    live = total > NEG / 2
    ph1_r = _to_rows(v(ph1), I32_MIN)
    ph2_r = _to_rows(v(ph2), I32_MIN)
    last_r = _to_rows(v(last), I32_MIN)
    live_r = _to_rows(v(live.astype(jnp.int32)), I32_MIN) > 0
    hj = ((ph1_r == v(h1)) & (ph2_r == v(h2))
          & (last_r >= 0) & live_r & v(live))     # (B, Wr, Wq)
    has_match = jnp.any(hj, axis=2, keepdims=True)          # (B, Wr, 1)
    # matched parent's fields, gathered by masked reduction (unique match)
    pbq = jnp.max(jnp.where(hj, v(p_b), NEG_FILL), axis=2, keepdims=True)
    totq = jnp.max(jnp.where(hj, v(total), NEG_FILL), axis=2,
                   keepdims=True)
    lastq = jnp.max(jnp.where(hj, v(last), I32_MIN), axis=2, keepdims=True)
    lp_last_r = _to_rows(v(lp_last), NEG_FILL)
    # e_at in closed form (bitwise-identical arithmetic to the pool's
    # extend scores); XLA fills no-match rows with NEG — reproduce, it
    # clamps decayed p_nb through the logaddexp
    e_abs = (jnp.where(lastq == last_r, pbq, totq) + lp_last_r)
    # XLA's absorbed = max(where(hj, e_at, NEG)) clamps at NEG even when
    # the matched extend scored below it — reproduce both the no-match
    # NEG and the clamp
    absorbed_r = jnp.maximum(jnp.where(has_match, e_abs, NEG), NEG)
    absorbed = _to_lanes(absorbed_r, NEG_FILL)[:, 0]        # (B, W)
    nb_stay = _logaddexp(stay_nb, absorbed)
    # kills: every matched extend (q = parent, c = last_r) leaves the
    # pool.  One parent can match up to C stays (the empty prefix is the
    # parent of every single-char beam), but each (q, c) kill pair is
    # unique (two stays with equal parent hash AND equal last char would
    # be the same prefix) — so summing per-row class bits equals their
    # OR: killed_bits[b, q] has bit c set iff extend (q, c) is killed.
    # shift amount clamped to >= 0: lanes where last_r is the I32_MIN /
    # -1 fill are masked off by hj, but the shift itself must still be
    # defined on every lane (a negative-count shift is implementation-
    # defined in XLA; the clamp is free on the VPU)
    killed_bits = jnp.sum(jnp.where(hj, 1 << jnp.maximum(last_r, 0), 0),
                          axis=1,
                          keepdims=True).astype(jnp.int32)  # (B, 1, Wq)

    # ---- candidate pool (B, rows, 128): row 0 stays, row 1+c extends.
    # Killed extends and the blank row sit at the XLA pool's NEG (they
    # tie with other NEG candidates and can win dead slots by index
    # order — slot parity requires the same value, not -inf); only
    # structurally-absent entries (pad class rows) are -inf.
    cand_stay = _logaddexp(stay_b, nb_stay)                 # (B, W)
    crow = row_iota - 1                                     # class of row
    ext = (jnp.where(crow == v(last), v(p_b), v(total))
           + lp_ext_rows)                                   # (B, rows, W)
    ext = jnp.where(crow == blank, NEG, ext)
    killed_here = (killed_bits >> jnp.maximum(crow, 0)) & 1
    ext = jnp.where(killed_here > 0, NEG, ext)
    ext = jnp.where(crow >= c_dim, NEG_FILL, ext)
    pool_s = jnp.where(row_iota == 0, v(cand_stay), ext)
    lane_iota = lax.broadcasted_iota(jnp.int32, (1, rows, LANES), 2)
    pool_ik = jnp.where(
        row_iota == 0, lane_iota,
        EXT_BASE + (lane_iota << sc) + crow).astype(jnp.int32)

    # ---- exact top-128 (bit-equal to lax.top_k incl. tie order)
    s_srt, ik_srt = _sort_rows(pool_s, pool_ik,
                               _half_desc_mask(pool_s.shape, rows))
    r = rows
    while r > 1:
        h = r // 2
        a_first = _before(s_srt[:, :h], ik_srt[:, :h],
                          s_srt[:, h:], ik_srt[:, h:])
        s_srt = jnp.where(a_first, s_srt[:, :h], s_srt[:, h:])
        ik_srt = jnp.where(a_first, ik_srt[:, :h], ik_srt[:, h:])
        r = h
        s_srt, ik_srt = _clean_rows(s_srt, ik_srt,
                                    _half_desc_mask(s_srt.shape, r))
    top_scores = s_srt[:, 0]                               # (B, 128)
    top_ik = ik_srt[:, 0]

    # ---- decompose winners, derive the new state (beam_device "derive")
    sel_stay = top_ik < EXT_BASE
    parent = jnp.where(sel_stay, top_ik,
                       (top_ik - EXT_BASE) >> sc).astype(jnp.int32)
    char = jnp.where(sel_stay, -1,
                     (top_ik - EXT_BASE) & ((1 << sc) - 1)).astype(
                         jnp.int32)
    # parent-gathers: payloads to rows once, mask rows by parent, reduce
    identw = lax.broadcasted_iota(jnp.int32, (1, LANES, LANES), 1)
    pm = identw == v(parent)                               # (B, Wold_r, Wk)
    gather = lambda row_vec, fill: jnp.max(
        jnp.where(pm, row_vec, fill), axis=1)              # (B, Wk)
    g_sb = gather(_to_rows(v(stay_b), NEG_FILL), NEG_FILL)
    g_nb = gather(_to_rows(v(nb_stay), NEG_FILL), NEG_FILL)
    g_last = gather(last_r, I32_MIN)
    g_h1 = gather(_to_rows(v(h1), I32_MIN), I32_MIN)
    g_h2 = gather(_to_rows(v(h2), I32_MIN), I32_MIN)
    g_ph1 = gather(ph1_r, I32_MIN)
    g_ph2 = gather(ph2_r, I32_MIN)

    new_p_b = jnp.where(sel_stay, g_sb, NEG)
    new_p_nb = jnp.where(sel_stay, g_nb, top_scores)
    new_last = jnp.where(sel_stay, g_last, char)
    new_h1 = jnp.where(sel_stay, g_h1, g_h1 * _P1 + char + 1)
    new_h2 = jnp.where(sel_stay, g_h2, g_h2 * _P2 + char + 1)
    new_ph1 = jnp.where(sel_stay, g_ph1, g_h1)
    new_ph2 = jnp.where(sel_stay, g_ph2, g_h2)

    # dead slots (XLA rule) + structurally-absent lanes when W < 128
    slot = lax.broadcasted_iota(jnp.int32, (bblk, LANES), 1)
    dead = (top_scores <= NEG / 2) | (slot >= w)
    sent = -(slot + 2)
    new_h1 = jnp.where(dead, sent, new_h1)
    new_h2 = jnp.where(dead, sent, new_h2)
    new_ph1 = jnp.where(dead, sent, new_ph1)
    new_ph2 = jnp.where(dead, sent, new_ph2)
    new_p_b = jnp.where(dead, NEG, new_p_b)
    new_p_nb = jnp.where(dead, NEG, new_p_nb)

    # frames past each utterance's length leave the state unchanged
    act = t < sizes_ref[...]                               # (B, 1)
    upd = lambda n, o: jnp.where(act, n, o)
    pb_ref[...] = upd(new_p_b, p_b)
    pnb_ref[...] = upd(new_p_nb, p_nb)
    last_ref[...] = upd(new_last, last)
    h1_ref[...] = upd(new_h1, h1)
    h2_ref[...] = upd(new_h2, h2)
    ph1_ref[...] = upd(new_ph1, ph1)
    ph2_ref[...] = upd(new_ph2, ph2)
    bp_ref[0] = jnp.where(act, parent, slot)
    em_ref[0] = jnp.where(act, char, -1)
    h1s_ref[0] = upd(new_h1, h1)
    h2s_ref[0] = upd(new_h2, h2)


@functools.partial(jax.jit,
                   static_argnames=("w", "blank", "interpret"))
def fused_beam_scan(log_probs, sizes, w: int, blank: int, carry0=None,
                    interpret: bool = False):
    """Drop-in twin of beam_device._beam_scan for the no-LM, no-prune
    case: log_probs (B, T, C) -> (backptr (T, B, W) i32,
    emit (T, B, W) i32, (h1_seq, h2_seq) (T, B, W) i32,
    totals (B, W) f32, carry) — same values, same slot order.

    carry0: ((p_b, p_nb, last, h1, h2, ph1, ph2), lm_state) from a prior
    call (streaming); lm_state is carried through untouched.
    """
    b, t_dim, c_dim = log_probs.shape
    if w > LANES:
        raise ValueError(f"fused_beam_scan supports width <= {LANES}")
    if c_dim > 30:
        raise ValueError("fused_beam_scan supports <= 30 classes")
    cpad = 1 << _ceil_log2(max(c_dim, 8))
    lp = jnp.transpose(log_probs, (1, 0, 2)).astype(jnp.float32)
    lp = jnp.pad(lp, ((0, 0), (0, 0), (0, cpad - c_dim)),
                 constant_values=NEG_FILL)                 # (T, B, Cpad)

    # bblk=16 was A/B'd: worse on both axes (166 vs 157 us/step, 578 s
    # Mosaic compile vs ~90 s — VMEM pressure from the (16, 128, 128)
    # merge intermediates), so batches over 8 pay serial b-blocks
    bblk = min(b, 8)
    nb = -(-b // bblk)
    bp = nb * bblk
    if bp > b:
        lp = jnp.pad(lp, ((0, 0), (0, bp - b), (0, 0)),
                     constant_values=NEG_FILL)
        sizes = jnp.pad(jnp.asarray(sizes), (0, bp - b))
    sizes2 = jnp.asarray(sizes, jnp.int32).reshape(bp, 1)

    if carry0 is None:
        pb0 = jnp.full((bp, LANES), NEG,
                       jnp.float32).at[:, 0].set(0.0)
        pnb0 = jnp.full((bp, LANES), NEG, jnp.float32)
        last0 = jnp.full((bp, LANES), -1, jnp.int32)
        h0 = jnp.ones((bp, LANES), jnp.int32)
        ph0 = jnp.zeros((bp, LANES), jnp.int32)
        # NOTE pad lanes >= w start with the same h=1/ph=0 the XLA scan
        # gives its own dead slots 1..w-1 — NOT sentinels.  That aliases
        # the live empty prefix's hash, but the merge join's live mask
        # (total > NEG/2) excludes them at step 0, and the per-step dead
        # rule sentinels every lane >= w from the first step onward.
        init = (pb0, pnb0, last0, h0, h0, ph0, ph0)
        lm_state = None
    else:
        (pb0, pnb0, last0, h10, h20, ph10, ph20), lm_state = carry0
        pad_w = [(0, bp - pb0.shape[0]), (0, LANES - pb0.shape[1])]
        padf = lambda a, fill: jnp.pad(a, pad_w, constant_values=fill)
        init = (padf(pb0, NEG), padf(pnb0, NEG), padf(last0, -1),
                padf(h10, 1), padf(h20, 1), padf(ph10, 0), padf(ph20, 0))
        # padded lanes must not alias live prefixes: sentinel-hash them
        if pb0.shape[1] < LANES:
            lane = jnp.arange(LANES, dtype=jnp.int32)[None, :]
            m = lane >= pb0.shape[1]
            init = (init[0], init[1], init[2],
                    jnp.where(m, -(lane + 2), init[3]),
                    jnp.where(m, -(lane + 2), init[4]),
                    jnp.where(m, -(lane + 2), init[5]),
                    jnp.where(m, -(lane + 2), init[6]))

    kern = functools.partial(_beam_kernel, c_dim=c_dim, w=w,
                             blank=blank, bblk=bblk)

    state_spec = pl.BlockSpec((bblk, LANES), lambda ib, t: (ib, 0))
    stream_spec = pl.BlockSpec((1, bblk, LANES), lambda ib, t: (t, ib, 0))
    f32, i32 = jnp.float32, jnp.int32
    outs = pl.pallas_call(
        lambda lp_ref, sz_ref, *rest: kern(lp_ref, sz_ref, rest),
        grid=(nb, t_dim),
        in_specs=[pl.BlockSpec((1, bblk, cpad), lambda ib, t: (t, ib, 0)),
                  pl.BlockSpec((bblk, 1), lambda ib, t: (ib, 0))]
        + [state_spec] * 7,
        out_specs=[stream_spec] * 4 + [state_spec] * 7,
        out_shape=[jax.ShapeDtypeStruct((t_dim, bp, LANES), i32),
                   jax.ShapeDtypeStruct((t_dim, bp, LANES), i32),
                   jax.ShapeDtypeStruct((t_dim, bp, LANES), i32),
                   jax.ShapeDtypeStruct((t_dim, bp, LANES), i32),
                   jax.ShapeDtypeStruct((bp, LANES), f32),
                   jax.ShapeDtypeStruct((bp, LANES), f32),
                   jax.ShapeDtypeStruct((bp, LANES), i32),
                   jax.ShapeDtypeStruct((bp, LANES), i32),
                   jax.ShapeDtypeStruct((bp, LANES), i32),
                   jax.ShapeDtypeStruct((bp, LANES), i32),
                   jax.ShapeDtypeStruct((bp, LANES), i32)],
        interpret=interpret,
    )(lp, sizes2, *init)
    bp_s, em_s, h1_s, h2_s, pb, pnb, lastf, h1f, h2f, ph1f, ph2f = outs
    cut = lambda a: a[:, :b, :w]
    fin = lambda a: a[:b, :w]
    carry = ((fin(pb), fin(pnb), fin(lastf), fin(h1f), fin(h2f),
              fin(ph1f), fin(ph2f)), lm_state)
    totals = jnp.logaddexp(fin(pb), fin(pnb))
    return (cut(bp_s), cut(em_s), (cut(h1_s), cut(h2_s)), totals, carry)
