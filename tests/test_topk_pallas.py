"""Pallas exact top-k vs `jax.lax.top_k` (interpret mode on the CPU test
mesh; the TPU path compiles the same kernel).

The beam decoder's candidate selection rides on bit-exact equivalence:
descending values AND `lax.top_k`'s stable tie order (equal scores ->
lower index first).  Ties are the adversarial case — the beam pool is
full of equal NEG fillers every step — so the sweep forces heavy ties.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from dsjax.ops.topk_pallas import topk, topk_pallas  # noqa: E402


@pytest.mark.parametrize("b,n,k", [
    (16, 3840, 128),   # the width-128 beam pool: 128 + 128*29
    (3, 310, 10),      # the width-10 pool: 10 + 10*30
    (1, 512, 1),
    (5, 700, 33),      # n not a multiple of 128, k not a power of two
    (16, 1664, 128),
    (9, 129, 64),      # k exceeds half the pool
])
def test_matches_lax_top_k(b, n, k, rng):
    s = rng.standard_normal((b, n)).astype(np.float32)
    s[:, ::7] = np.float32(-1e30)          # beam-style dead-slot ties
    s[:, 1::5] = np.float32(0.5)           # mid-range ties
    vs, idx = topk_pallas(jnp.asarray(s), k, interpret=True)
    rv, ri = jax.lax.top_k(jnp.asarray(s), k)
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))


def test_all_equal_and_sorted_inputs(rng):
    # fully-degenerate pools: every candidate equal; ascending; descending
    for row in (np.zeros(640), np.arange(640.0), -np.arange(640.0)):
        s = np.tile(row.astype(np.float32), (4, 1))
        vs, idx = topk_pallas(jnp.asarray(s), 17, interpret=True)
        rv, ri = jax.lax.top_k(jnp.asarray(s), 17)
        np.testing.assert_array_equal(np.asarray(vs), np.asarray(rv))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))


def test_k_above_128_rejected(rng):
    # the halving rounds only preserve each pair's top 128, so larger k
    # must be refused (the dispatcher falls back to lax.top_k there)
    s = rng.standard_normal((2, 600)).astype(np.float32)
    with pytest.raises(ValueError, match="k <= 128"):
        topk_pallas(jnp.asarray(s), 129, interpret=True)


def test_topk_dispatch_falls_back_off_tpu(rng):
    # on the CPU test mesh the dispatcher must return lax.top_k results
    s = rng.standard_normal((2, 600)).astype(np.float32)
    vs, idx = topk(jnp.asarray(s), 8)
    rv, ri = jax.lax.top_k(jnp.asarray(s), 8)
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))
