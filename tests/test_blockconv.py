"""Banded-block conv == lax.conv equivalence (values and gradients)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from dsjax.ops.blockconv import banded_conv2d


def _ref(x, w, strides, padding):
    return lax.conv_general_dilated(x, w, strides, padding,
                                    dimension_numbers=("NHWC", "HWIO", "NHWC"))


CASES = [
    # (x_shape, k_shape, strides, padding, block_j) — DS2 conv1/conv2 + odd shapes
    ((2, 161, 96, 1), (41, 11, 1, 32), (2, 2), ((20, 20), (5, 5)), 16),
    ((2, 81, 96, 32), (21, 11, 32, 32), (2, 1), ((10, 10), (5, 5)), 8),
    ((1, 40, 33, 3), (7, 5, 3, 8), (2, 1), ((3, 3), (2, 2)), 4),
    ((3, 17, 20, 2), (5, 3, 2, 4), (1, 1), ((2, 2), (1, 1)), 8),
]


@pytest.mark.parametrize("xs,ks,st,pad,bj", CASES)
def test_banded_conv_matches_lax(xs, ks, st, pad, bj):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(xs), jnp.float32)
    w = jnp.asarray(rng.standard_normal(ks) * 0.1, jnp.float32)
    ref = _ref(x, w, st, pad)
    got = banded_conv2d(x, w, st, pad, block_j=bj)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_banded_conv_grads_match():
    xs, ks, st, pad, bj = CASES[1]
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(xs), jnp.float32)
    w = jnp.asarray(rng.standard_normal(ks) * 0.1, jnp.float32)

    def loss_ref(w, x):
        return jnp.sum(jnp.sin(_ref(x, w, st, pad)))

    def loss_blk(w, x):
        return jnp.sum(jnp.sin(banded_conv2d(x, w, st, pad, block_j=bj)))

    gw_r, gx_r = jax.grad(loss_ref, (0, 1))(w, x)
    gw_b, gx_b = jax.grad(loss_blk, (0, 1))(w, x)
    # f32 summation-reorder noise; near-zero elements dominate rel error
    np.testing.assert_allclose(np.asarray(gw_b), np.asarray(gw_r),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gx_b), np.asarray(gx_r),
                               rtol=1e-3, atol=2e-3)
