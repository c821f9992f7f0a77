"""Exact batched top-k as ONE Pallas TPU kernel.

Why: the device beam search (dsjax.decode.beam_device) selects the top-W
of a (B, W + W*C) candidate pool EVERY frame inside a lax.scan.  XLA's
`lax.top_k` at those shapes ((16, 3840) -> 128) measures ~95 us per call
on a v5e chip — over half the whole beam step — because its generic
variadic-sort lowering makes many passes over HBM.  This kernel keeps the
pool in VMEM and runs a bitonic selection network, with bit-identical
results to `lax.top_k` (descending order, ties broken to the lower
index — `lax.top_k`'s stable-sort semantics).

Algorithm (vectorized over batch; the pool (B, N) is viewed as
(B, R, 128) rows of 128 lanes, rows padded to a power of two with -inf):

  1. bitonic-sort every row along its 128 lanes — rows in the top half
     descending, rows in the bottom half ascending.  All exchanges are
     lane rolls (the cheapest data movement on the VPU).
  2. halving rounds: elementwise compare-exchange row r of the top half
     against row r of the bottom half (static sublane slices, no rolls).
     A descending-sorted row vs an ascending-sorted row is the first
     stage of a bitonic merge of their union: the elementwise winners
     provably contain the union's top 128 (if x loses at lane l, the
     128 - l tail of the ascending row and the l + 1 head of the
     descending row are 129 elements that beat x).  Each winner row is a
     "valley" — bitonic — so 7 lane-strided stages re-sort it, again top
     half descending / bottom ascending for the next round.
  3. after log2(R) rounds one descending row of 128 remains: the global
     top-128 in `lax.top_k` order; emit lanes [:k] (hence k <= 128).

The comparator is the total order (score desc, index asc); indices are
distinct, so there are no comparator ties — which is what makes the
result unique and bit-equal to lax.top_k under heavy score ties (the
beam pool is full of equal -1e30 dead slots every step).

Measured (B=16, N=3840, k=128, v5e, inside a 500-step scan): the
network itself runs in ~13 us of kernel time (5.7 sort + 7.2 rounds),
but a pallas_call launched from inside lax.scan pays ~78 us of launch
overhead on this runtime (a trivial copy kernel measures the same), so
the dispatched op nets 95 -> 81 us per beam step.  A later same-day
sweep across pool sizes (N=480/960/1920/3840) measured the dispatched
op within +-15 us of lax.top_k either way — the launch overhead
dominates both paths and session-to-session variance is that large —
so the >= 512 dispatch threshold is neutral-at-worst; the kernel's
unambiguous win needs the launch amortized across the whole scan, see
ops/beam_pallas.py for that experiment and its own trade-offs.

Used by the beam decoder via `topk` below. Dispatch policy lives in the
CALLER: the decoder decides outside jit (DeviceBeamDecoder._pallas_ok —
TPU backend, unsharded operands, DSJAX_PALLAS_TOPK kill switch) and
passes an explicit use_pallas bool; topk itself only applies the
shape gate (N < 512 falls back to lax.top_k) and defaults to lax.top_k
when use_pallas is None, because this kernel has no GSPMD partitioning
rule and must not be reached through a sharded jit by default.
Reference behavior matched: candidate selection inside the beam step of
parlance/ctcdecode (wrapped by reference decoder.py:56-118); exactness
vs `lax.top_k` is what the decoder-parity fuzz tests pin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_FILL = np.float32(-np.inf)
LANES = 128


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _before(sa, ia, sb, ib):
    """True where (sa, ia) precedes (sb, ib) in descending-score order
    with ties to the lower index (a total order: indices are distinct)."""
    return (sa > sb) | ((sa == sb) & (ia < ib))


def _lane_stage(s, i, j, desc):
    """One compare-exchange stage along the lane axis: lane l trades with
    lane l XOR j; `desc` marks positions whose block sorts descending
    (bool array broadcastable to s.shape)."""
    bit = (lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1) & j) != 0
    back = LANES - j
    ps = jnp.where(bit, pltpu.roll(s, j, s.ndim - 1),
                   pltpu.roll(s, back, s.ndim - 1))
    pi = jnp.where(bit, pltpu.roll(i, j, s.ndim - 1),
                   pltpu.roll(i, back, s.ndim - 1))
    self_first = _before(s, i, ps, pi)
    # keep-self = self_first XOR upper-of-pair XOR ~descending (Mosaic
    # rejects selects over i1 values, so the conditional flips are xors)
    keep = jnp.logical_xor(jnp.logical_xor(self_first, bit),
                           jnp.logical_not(desc))
    return jnp.where(keep, s, ps), jnp.where(keep, i, pi)


def _sort_rows(s, i, desc):
    """Bitonic-sort each row along its 128 lanes; `desc` gives each
    position's final direction (must be constant within a row)."""
    kk = 2
    while kk <= LANES:
        blk = (lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
               & kk) == 0
        eff = jnp.logical_xor(jnp.logical_not(blk), desc)  # blk XNOR desc
        j = kk // 2
        while j >= 1:
            s, i = _lane_stage(s, i, j, eff)
            j //= 2
        kk *= 2
    return s, i


def _clean_rows(s, i, desc):
    """Re-sort bitonic ("valley") rows along lanes into `desc` order."""
    j = LANES // 2
    while j >= 1:
        s, i = _lane_stage(s, i, j, desc)
        j //= 2
    return s, i


def _half_desc_mask(shape, rows):
    """(…, rows, 128) mask: True on the top half's rows (sorted
    descending), False on the bottom half's (ascending).  One row left:
    all True."""
    if rows == 1:
        return jnp.ones(shape, jnp.bool_)
    return lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2) < rows // 2


def _topk_kernel(s_ref, o_s_ref, o_i_ref, *, rows, k):
    # the wrapper already padded in-row tails with -inf; the kernel only
    # pads ROWS up to the power of two the sort needs
    rows_p = _next_pow2(rows)
    s = s_ref[...]                                     # (Bblk, rows, 128)
    i = (lax.broadcasted_iota(jnp.int32, s.shape, 1) * LANES
         + lax.broadcasted_iota(jnp.int32, s.shape, 2))
    if rows_p > rows:
        pad = (s.shape[0], rows_p - rows, LANES)
        s = jnp.concatenate([s, jnp.full(pad, NEG_FILL, s.dtype)], axis=1)
        i = jnp.concatenate(
            [i, jnp.full(pad, np.int32(2 ** 30), jnp.int32)], axis=1)
    r = rows_p
    s, i = _sort_rows(s, i, _half_desc_mask(s.shape, r))
    while r > 1:
        h = r // 2
        a_s, a_i, b_s, b_i = s[:, :h], i[:, :h], s[:, h:], i[:, h:]
        a_first = _before(a_s, a_i, b_s, b_i)
        s = jnp.where(a_first, a_s, b_s)
        i = jnp.where(a_first, a_i, b_i)
        r = h
        s, i = _clean_rows(s, i, _half_desc_mask(s.shape, r))
    o_s_ref[...] = s[:, 0, :k]
    o_i_ref[...] = i[:, 0, :k]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def topk_pallas(scores: jnp.ndarray, k: int, interpret: bool = False):
    """Exact top-k over the last axis of (B, N) f32 scores; returns
    (values (B, k) f32, indices (B, k) i32), == `jax.lax.top_k`.
    Requires k <= 128: each halving round provably preserves the top 128
    of every pair, not more (a discarded pair-local rank-129 element
    could still make a global top-256)."""
    b, n = scores.shape
    if k > LANES:
        raise ValueError(f"topk_pallas supports k <= {LANES}, got {k}")
    rows = -(-n // LANES)
    pad = rows * LANES - n
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)),
                         constant_values=NEG_FILL)
    tiles = scores.reshape(b, rows, LANES)
    # transients stay (bblk, rows_p, 128): 32 batch rows x 32 pool rows
    # is ~1 MB held x2 arrays — far inside VMEM
    bblk = min(b, 32)
    grid = -(-b // bblk)
    if b % bblk:
        tiles = jnp.pad(tiles, ((0, grid * bblk - b), (0, 0), (0, 0)),
                        constant_values=NEG_FILL)
    out_s, out_i = pl.pallas_call(
        functools.partial(_topk_kernel, rows=rows, k=k),
        grid=(grid,),
        in_specs=[pl.BlockSpec((bblk, rows, LANES), lambda g: (g, 0, 0))],
        out_specs=[pl.BlockSpec((bblk, k), lambda g: (g, 0)),
                   pl.BlockSpec((bblk, k), lambda g: (g, 0))],
        out_shape=[jax.ShapeDtypeStruct((grid * bblk, k), scores.dtype),
                   jax.ShapeDtypeStruct((grid * bblk, k), jnp.int32)],
        interpret=interpret,
    )(tiles)
    return out_s[:b], out_i[:b]


def topk(scores: jnp.ndarray, k: int, use_pallas=None):
    """`lax.top_k` twin: the Pallas kernel when the pool is wide enough
    to pay for it (N >= 512 — the default beam_width=16 pool of 480 is
    cheaper on lax.top_k), XLA's top_k otherwise.

    use_pallas: tri-state, decided by the CALLER outside jit.  None (the
    default) is CONSERVATIVE: always lax.top_k — safe under jit/pjit with
    sharded inputs, where the Mosaic kernel would be wrong (no GSPMD
    partitioning rule).  False = always lax.top_k.  True = Pallas when
    the shape gates pass; pass it only where backend and sharding are
    concrete (e.g. DeviceBeamDecoder._pallas_ok decides per decode,
    outside jit).  Callers MUST NOT pass True for scores sharded across
    devices.  Caveat either way: the comparator assumes no NaNs (the
    beam pool cannot produce them); NaN scores would break the total
    order and silently diverge from lax.top_k.
    """
    n = scores.shape[-1]
    if (use_pallas and scores.ndim == 2 and scores.dtype == jnp.float32
            and n >= 512 and k <= LANES and scores.shape[0] > 0):
        return topk_pallas(scores, k)
    return jax.lax.top_k(scores, k)
