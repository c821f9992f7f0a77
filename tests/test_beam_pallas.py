"""Fused Pallas beam scan vs the XLA scan: bit-exact equivalence.

Runs the Pallas kernel in interpret mode on the CPU test mesh (the TPU
path compiles the same kernel; tests/test_beam_device.py and the fuzz
suite cover the dispatching decoder).  Equality is asserted on EVERY
output — backpointers, emitted chars, streamed hash history, totals,
and the full carry — because the decoder-parity suite pins slot order
and tie behavior, not just decoded strings.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from dsjax.decode.beam_device import _beam_scan  # noqa: E402
from dsjax.ops.beam_pallas import fused_beam_scan  # noqa: E402

pytestmark = pytest.mark.slow  # integration-scale; fast path: -m 'not slow'


def _probs(rng, b, t, c, tie_rows=True):
    logits = rng.standard_normal((b, t, c)) * 3.0
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = (e / e.sum(-1, keepdims=True)).astype(np.float32)
    if tie_rows:      # clipped flats force heavy score ties
        p[0, : t // 2] = np.maximum(p[0, : t // 2], 1e-30)
    return p


def _assert_equal(ref, got):
    for name, rv, gv in [("backptr", ref[0], got[0]),
                         ("emit", ref[1], got[1]),
                         ("h1", ref[2][0], got[2][0]),
                         ("h2", ref[2][1], got[2][1]),
                         ("totals", ref[3], got[3])]:
        np.testing.assert_array_equal(np.asarray(rv), np.asarray(gv),
                                      err_msg=name)
    (rc, _), (gc, _) = ref[4], got[4]
    for i, (ra, ga) in enumerate(zip(rc, gc)):
        np.testing.assert_array_equal(np.asarray(ra), np.asarray(ga),
                                      err_msg=f"carry[{i}]")


@pytest.mark.parametrize("b,t,c,w,blank", [
    (3, 12, 5, 8, 0),      # merges + dead slots + truncated sizes
    (2, 30, 29, 16, 0),    # full label set
    (1, 7, 4, 128, 0),     # exhaustive width: every prefix merges
    (4, 20, 29, 10, 0),    # the reference's default width
    (2, 25, 6, 32, 2),     # non-zero blank index
])
def test_fused_scan_matches_xla(b, t, c, w, blank, rng):
    p = _probs(rng, b, t, c)
    lp = jnp.asarray(np.log(np.maximum(p, 1e-30)))
    sizes = np.full(b, t, np.int32)
    sizes[0] = max(1, t - 3)
    if b > 1:
        sizes[1] = 0               # empty utterance rides along
    sizes = jnp.asarray(sizes)
    ref = _beam_scan(lp, sizes, w, blank)
    got = fused_beam_scan(lp, sizes, w, blank, interpret=True)
    _assert_equal(ref, got)


def test_fused_scan_streaming_carry(rng):
    """Chunked decode from a carried state == one-shot decode (the same
    invariant the XLA scan guarantees for /stream)."""
    b, t, c, w = 2, 16, 6, 12
    p = _probs(rng, b, t, c, tie_rows=False)
    lp = jnp.asarray(np.log(np.maximum(p, 1e-30)))
    sizes = jnp.full((b,), t // 2, jnp.int32)
    one_ref = _beam_scan(lp[:, : t // 2], sizes, w, 0)
    one_got = fused_beam_scan(lp[:, : t // 2], sizes, w, 0,
                              interpret=True)
    _assert_equal(one_ref, one_got)
    # resume both from the XLA carry: the kernel must accept and
    # continue a mid-stream state identically
    carry = one_ref[4]
    two_ref = _beam_scan(lp[:, t // 2:], sizes, w, 0, carry0=carry)
    two_got = fused_beam_scan(lp[:, t // 2:], sizes, w, 0, carry0=carry,
                              interpret=True)
    _assert_equal(two_ref, two_got)


@pytest.mark.skipif(not os.environ.get("DSJAX_TEST_TPU"),
                    reason="hardware A/B; set DSJAX_TEST_TPU=1 on a TPU")
def test_fused_scan_bit_equal_on_hardware(rng):
    """The compiled Mosaic kernel (not interpret mode) against the XLA
    scan on the real chip — the claim the module docstring makes.
    ~3-4 min: both programs compile for (16, 200, 29)."""
    b, t, c, w = 16, 200, 29, 128
    logits = rng.standard_normal((b, t, c)) * 3.0
    logits[..., 0] += 3.0
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = (e / e.sum(-1, keepdims=True)).astype(np.float32)
    lp = jax.device_put(jnp.asarray(np.log(np.maximum(p, 1e-30))))
    sizes = jax.device_put(jnp.full((b,), t, jnp.int32))
    ref = _beam_scan(lp, sizes, w, 0)
    got = fused_beam_scan(lp, sizes, w, 0)
    _assert_equal(ref, got)
