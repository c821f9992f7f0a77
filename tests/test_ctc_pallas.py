"""Pallas CTC (alpha kernel + analytic VJP) vs the pure-JAX reference
(itself validated against torch.nn.CTCLoss)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsjax.model.ctc import ctc_loss
from dsjax.ops.ctc_pallas import ctc_loss_pallas


def _problem(rng, B=4, T=16, C=8, L=5):
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    in_lens = rng.integers(2 * L + 2, T + 1, size=B).astype(np.int32)
    in_lens[0] = T
    tgt_lens = rng.integers(1, L + 1, size=B).astype(np.int32)
    tgt_lens[-1] = 0 if B > 2 else tgt_lens[-1]
    targets = rng.integers(1, C, size=(B, L)).astype(np.int32)
    return logits, lp, in_lens, targets, tgt_lens


@pytest.mark.parametrize("reduction", ["sum", "none"])
def test_values_match_reference(reduction):
    rng = np.random.default_rng(0)
    logits, lp, in_lens, targets, tgt_lens = _problem(rng)
    ref = ctc_loss(lp, jnp.asarray(in_lens), jnp.asarray(targets),
                   jnp.asarray(tgt_lens), reduction=reduction)
    got = ctc_loss_pallas(lp, jnp.asarray(in_lens), jnp.asarray(targets),
                          jnp.asarray(tgt_lens), reduction=reduction,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_grads_match_reference():
    rng = np.random.default_rng(1)
    logits, lp, in_lens, targets, tgt_lens = _problem(rng, B=5, T=20, C=7, L=6)

    def loss_ref(x):
        return ctc_loss(jax.nn.log_softmax(x, -1), jnp.asarray(in_lens),
                        jnp.asarray(targets), jnp.asarray(tgt_lens))

    def loss_pal(x):
        return ctc_loss_pallas(jax.nn.log_softmax(x, -1), jnp.asarray(in_lens),
                               jnp.asarray(targets), jnp.asarray(tgt_lens),
                               interpret=True)

    g_ref = jax.grad(loss_ref)(jnp.asarray(logits))
    g_pal = jax.grad(loss_pal)(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_zero_infinity_and_empty_targets():
    rng = np.random.default_rng(2)
    B, T, C, L = 3, 6, 5, 4
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    targets = np.full((B, L), 2, np.int32)
    tgt_lens = np.array([4, 1, 0], np.int32)   # sample 0 infeasible (repeats)
    in_lens = np.array([T, T, T], np.int32)

    def loss_pal(x):
        return ctc_loss_pallas(jax.nn.log_softmax(x, -1), jnp.asarray(in_lens),
                               jnp.asarray(targets), jnp.asarray(tgt_lens),
                               reduction="none", interpret=True)

    nll, vjp = jax.vjp(loss_pal, jnp.asarray(logits))
    ref = ctc_loss(lp, jnp.asarray(in_lens), jnp.asarray(targets),
                   jnp.asarray(tgt_lens), reduction="none")
    np.testing.assert_allclose(np.asarray(nll), np.asarray(ref), rtol=1e-4)
    (g,) = vjp(jnp.ones((B,), jnp.float32))
    assert np.all(np.asarray(g)[0] == 0)       # infeasible -> zero grad
    assert np.any(np.asarray(g)[1] != 0)
    assert np.all(np.isfinite(np.asarray(g)))


def test_grads_match_torch_direct():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    logits, lp, in_lens, targets, tgt_lens = _problem(rng, B=4, T=18, C=6, L=5)
    tgt_lens = np.maximum(tgt_lens, 1)

    t_logits = torch.tensor(logits, requires_grad=True)
    t_lp = torch.log_softmax(t_logits, dim=-1).transpose(0, 1)
    crit = torch.nn.CTCLoss(blank=0, reduction="sum", zero_infinity=True)
    flat = torch.tensor(np.concatenate([targets[b, :tgt_lens[b]]
                                        for b in range(len(tgt_lens))]))
    t_loss = crit(t_lp, flat, torch.tensor(in_lens), torch.tensor(tgt_lens))
    t_loss.backward()

    def loss_pal(x):
        return ctc_loss_pallas(jax.nn.log_softmax(x, -1), jnp.asarray(in_lens),
                               jnp.asarray(targets), jnp.asarray(tgt_lens),
                               interpret=True)

    val, g = jax.value_and_grad(loss_pal)(jnp.asarray(logits))
    np.testing.assert_allclose(float(val), float(t_loss), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g), t_logits.grad.numpy(),
                               rtol=1e-3, atol=1e-4)
