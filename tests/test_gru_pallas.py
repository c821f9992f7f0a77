"""Pallas fused GRU scan: forward + gradient parity vs the lax.scan twin."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsjax.ops.gru_pallas import gru_scan, gru_scan_reference


def _problem(rng, T=10, B=8, H=128, dtype=jnp.float32):
    xp = jnp.asarray(rng.standard_normal((T, B, 3 * H)) * 0.3, dtype)
    w = jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.1, dtype)
    b = jnp.asarray(rng.standard_normal((3 * H,)) * 0.1, dtype)
    h0 = jnp.asarray(rng.standard_normal((B, H)) * 0.1, dtype)
    lengths = np.full((B,), T)
    lengths[1::2] = T // 2
    lengths[2] = 1
    mask = jnp.asarray((np.arange(T)[:, None] < lengths[None, :]), jnp.float32)
    return xp, mask, w, b, h0


def test_forward_parity():
    rng = np.random.default_rng(0)
    xp, mask, w, b, h0 = _problem(rng)
    y_p, h_p = gru_scan(xp, mask, w, b, h0, True)
    y_r, h_r = gru_scan_reference(xp, mask.astype(xp.dtype), w, b, h0)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_r), atol=1e-5, rtol=1e-5)


def test_gradient_parity():
    rng = np.random.default_rng(1)
    xp, mask, w, b, h0 = _problem(rng, T=7)
    t3 = jnp.asarray(rng.standard_normal((2,)), jnp.float32)

    def lp(xp, w, b, h0):
        y, h_t = gru_scan(xp, mask, w, b, h0, True)
        return t3[0] * jnp.sum(y * y) + t3[1] * jnp.sum(jnp.tanh(h_t))

    def lr(xp, w, b, h0):
        y, h_t = gru_scan_reference(xp, mask.astype(xp.dtype), w, b, h0)
        return t3[0] * jnp.sum(y * y) + t3[1] * jnp.sum(jnp.tanh(h_t))

    gp = jax.grad(lp, argnums=(0, 1, 2, 3))(xp, w, b, h0)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3))(xp, w, b, h0)
    for name, a, r in zip(["dxp", "dw", "db", "dh0"], gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-4, rtol=2e-3, err_msg=name)


def test_model_gru_pallas_matches_scan():
    from dsjax.config import BiDirectionalConfig, RNNType, SpectConfig
    from dsjax.model import ds2
    from dsjax.ops import gru_pallas

    cfg = BiDirectionalConfig(rnn_type=RNNType.gru, hidden_size=128,
                              hidden_layers=2)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((8, 161, 32)).astype(np.float32)
    lengths = np.array([32, 20, 32, 8, 32, 16, 32, 25], np.int32)

    model_scan = ds2.DeepSpeech2(num_classes=29, spect_cfg=SpectConfig(),
                                 model_cfg=cfg, use_pallas=False)
    variables = model_scan.init(jax.random.PRNGKey(0), jnp.asarray(x),
                                jnp.asarray(lengths), train=False)
    out_scan, _, _ = model_scan.apply(variables, jnp.asarray(x),
                                      jnp.asarray(lengths), train=False)

    orig = gru_pallas.gru_scan

    def interp(xp, mask, w, b, h0, interpret=False):
        return orig(xp, mask, w, b, h0, True)

    gru_pallas.gru_scan = interp
    try:
        model_p = ds2.DeepSpeech2(num_classes=29, spect_cfg=SpectConfig(),
                                  model_cfg=cfg, use_pallas=True)
        out_p, _, _ = model_p.apply(variables, jnp.asarray(x),
                                    jnp.asarray(lengths), train=False)
    finally:
        gru_pallas.gru_scan = orig
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_scan),
                               atol=2e-5, rtol=1e-4)
