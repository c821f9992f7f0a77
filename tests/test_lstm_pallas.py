"""Pallas fused LSTM scan: forward + gradient parity vs the lax.scan twin
(interpret mode on CPU)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsjax.ops.lstm_pallas import lstm_scan, lstm_scan_reference


def _problem(rng, T=12, B=8, H=128, dtype=jnp.float32):
    xp = jnp.asarray(rng.standard_normal((T, B, 4 * H)) * 0.3, dtype)
    w = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.1, dtype)
    b = jnp.asarray(rng.standard_normal((4 * H,)) * 0.1, dtype)
    h0 = jnp.asarray(rng.standard_normal((B, H)) * 0.1, dtype)
    c0 = jnp.asarray(rng.standard_normal((B, H)) * 0.1, dtype)
    lengths = np.full((B,), T)
    lengths[1::2] = T // 2
    lengths[2] = 1
    mask = jnp.asarray((np.arange(T)[:, None] < lengths[None, :]), jnp.float32)
    return xp, mask, w, b, h0, c0


def test_forward_parity():
    rng = np.random.default_rng(0)
    xp, mask, w, b, h0, c0 = _problem(rng)
    y_p, h_p, c_p = lstm_scan(xp, mask, w, b, h0, c0, True)
    y_r, h_r, c_r = lstm_scan_reference(xp, mask.astype(xp.dtype), w, b, h0, c0)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_r), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_r), atol=1e-5, rtol=1e-5)


def test_masked_carry_freezes():
    """Carry must equal the value at each sequence's true end."""
    rng = np.random.default_rng(1)
    xp, mask, w, b, h0, c0 = _problem(rng, T=10, B=8, H=128)
    y, h_t, c_t = lstm_scan(xp, mask, w, b, h0, c0, True)
    # sample 2 has length 1: carry == state after step 0
    y1, h1, c1 = lstm_scan(xp[:1], mask[:1], w, b, h0, c0, True)
    np.testing.assert_allclose(np.asarray(h_t)[2], np.asarray(h1)[2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_t)[2], np.asarray(c1)[2], atol=1e-6)
    # outputs past length are zero
    np.testing.assert_array_equal(np.asarray(y)[1:, 2], 0)


def test_gradient_parity():
    rng = np.random.default_rng(2)
    xp, mask, w, b, h0, c0 = _problem(rng, T=8, B=8, H=128)
    tangent = jnp.asarray(rng.standard_normal((3,)), jnp.float32)

    def loss_pallas(xp, w, b, h0, c0):
        y, h_t, c_t = lstm_scan(xp, mask, w, b, h0, c0, True)
        return (tangent[0] * jnp.sum(y * y) + tangent[1] * jnp.sum(h_t)
                + tangent[2] * jnp.sum(jnp.tanh(c_t)))

    def loss_ref(xp, w, b, h0, c0):
        y, h_t, c_t = lstm_scan_reference(xp, mask.astype(xp.dtype), w, b, h0, c0)
        return (tangent[0] * jnp.sum(y * y) + tangent[1] * jnp.sum(h_t)
                + tangent[2] * jnp.sum(jnp.tanh(c_t)))

    grads_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(xp, w, b, h0, c0)
    grads_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(xp, w, b, h0, c0)
    names = ["dxp", "dw", "db", "dh0", "dc0"]
    for name, gp, gr in zip(names, grads_p, grads_r):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   atol=2e-4, rtol=2e-3, err_msg=name)


def test_model_pallas_flag_matches_scan():
    """Full model forward with use_pallas=True (interpret via monkeypatch)
    equals use_pallas=False."""
    from dsjax.config import BiDirectionalConfig, SpectConfig
    from dsjax.model import ds2
    from dsjax.ops import lstm_pallas

    cfg = BiDirectionalConfig(hidden_size=128, hidden_layers=2)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((8, 161, 40)).astype(np.float32)
    lengths = np.array([40, 30, 20, 40, 10, 40, 25, 40], np.int32)

    model_scan = ds2.DeepSpeech2(num_classes=29, spect_cfg=SpectConfig(),
                                 model_cfg=cfg, use_pallas=False)
    variables = model_scan.init(jax.random.PRNGKey(0), jnp.asarray(x),
                                jnp.asarray(lengths), train=False)
    out_scan, lens_scan, _ = model_scan.apply(variables, jnp.asarray(x),
                                              jnp.asarray(lengths), train=False)

    orig = lstm_pallas.lstm_scan

    def interp_scan(xp, mask, w, b, h0, c0, interpret=False):
        return orig(xp, mask, w, b, h0, c0, True)

    lstm_pallas.lstm_scan = interp_scan
    try:
        model_p = ds2.DeepSpeech2(num_classes=29, spect_cfg=SpectConfig(),
                                  model_cfg=cfg, use_pallas=True)
        out_p, lens_p, _ = model_p.apply(variables, jnp.asarray(x),
                                         jnp.asarray(lengths), train=False)
    finally:
        lstm_pallas.lstm_scan = orig
    np.testing.assert_array_equal(np.asarray(lens_scan), np.asarray(lens_p))
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_scan),
                               atol=2e-5, rtol=1e-4)
