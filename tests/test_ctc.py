"""CTC loss parity vs torch.nn.CTCLoss (values and gradients) and vs a
brute-force path enumeration."""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsjax.model.ctc import ctc_forward, ctc_loss


def _rand_problem(rng, B=4, T=20, C=6, L=5):
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    input_lengths = rng.integers(L * 2 + 2, T + 1, size=B).astype(np.int32)
    input_lengths[0] = T
    target_lengths = rng.integers(1, L + 1, size=B).astype(np.int32)
    targets = rng.integers(1, C, size=(B, L)).astype(np.int32)
    return logits, np.asarray(log_probs), input_lengths, targets, target_lengths


def _brute_force_nll(log_probs, T_len, target):
    """Sum over all alignments of length T_len that collapse to target."""
    C = log_probs.shape[1]
    total = -np.inf
    for path in itertools.product(range(C), repeat=T_len):
        # collapse: remove repeats then blanks (blank=0)
        collapsed = []
        prev = None
        for p in path:
            if p != prev:
                collapsed.append(p)
            prev = p
        collapsed = [p for p in collapsed if p != 0]
        if collapsed == list(target):
            lp = sum(log_probs[t, p] for t, p in enumerate(path))
            total = np.logaddexp(total, lp)
    return -total


def test_ctc_matches_brute_force():
    rng = np.random.default_rng(0)
    T, C = 5, 3
    logits = rng.standard_normal((1, T, C)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    for target in ([1], [1, 2], [2, 2], [1, 2, 1]):
        tgt = np.zeros((1, 3), np.int32)
        tgt[0, :len(target)] = target
        nll = ctc_forward(jnp.asarray(lp), jnp.array([T]), jnp.asarray(tgt),
                          jnp.array([len(target)]))
        expect = _brute_force_nll(lp[0], T, target)
        np.testing.assert_allclose(float(nll[0]), expect, rtol=1e-4, atol=3e-4)


@pytest.mark.parametrize("reduction", ["sum", "mean", "none"])
def test_ctc_matches_torch(reduction):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    logits, lp, in_lens, targets, tgt_lens = _rand_problem(rng)

    t_logits = torch.tensor(logits, requires_grad=True)
    t_lp = torch.log_softmax(t_logits, dim=-1).transpose(0, 1)  # (T, B, C)
    crit = torch.nn.CTCLoss(blank=0, reduction=reduction, zero_infinity=True)
    flat_targets = torch.tensor(
        np.concatenate([targets[b, :tgt_lens[b]] for b in range(len(tgt_lens))]))
    t_loss = crit(t_lp, flat_targets, torch.tensor(in_lens), torch.tensor(tgt_lens))

    def jax_loss(logits):
        lp = jax.nn.log_softmax(logits, axis=-1)
        return ctc_loss(lp, jnp.asarray(in_lens), jnp.asarray(targets),
                        jnp.asarray(tgt_lens), reduction=reduction)

    j_loss = jax_loss(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(j_loss), t_loss.detach().numpy(),
                               rtol=1e-4, atol=1e-4)

    if reduction == "sum":
        t_loss.backward()
        j_grad = jax.grad(lambda x: jax_loss(x))(jnp.asarray(logits))
        np.testing.assert_allclose(np.asarray(j_grad), t_logits.grad.numpy(),
                                   rtol=1e-3, atol=1e-4)


def test_ctc_zero_infinity():
    """Targets longer than inputs -> loss 0 and zero grads for that sample."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    B, T, C, L = 2, 4, 5, 4
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    targets = np.full((B, L), 2, np.int32)  # repeated label needs 2L-1 frames
    tgt_lens = np.array([L, 1], np.int32)
    in_lens = np.array([T, T], np.int32)

    def jax_loss(x):
        lp = jax.nn.log_softmax(x, axis=-1)
        return ctc_loss(lp, jnp.asarray(in_lens), jnp.asarray(targets),
                        jnp.asarray(tgt_lens), reduction="sum")

    loss, grad = jax.value_and_grad(jax_loss)(jnp.asarray(logits))
    assert np.isfinite(float(loss))
    g = np.asarray(grad)
    assert np.all(g[0] == 0), "infeasible sample must have zero grad"
    assert np.any(g[1] != 0)

    t_logits = torch.tensor(logits, requires_grad=True)
    t_lp = torch.log_softmax(t_logits, dim=-1).transpose(0, 1)
    crit = torch.nn.CTCLoss(blank=0, reduction="sum", zero_infinity=True)
    t_loss = crit(t_lp, torch.tensor(np.concatenate([targets[0], targets[1, :1]])),
                  torch.tensor(in_lens), torch.tensor(tgt_lens))
    np.testing.assert_allclose(float(loss), float(t_loss), rtol=1e-4)


def test_ctc_empty_target():
    rng = np.random.default_rng(3)
    T, C = 6, 4
    logits = rng.standard_normal((1, T, C)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    nll = ctc_forward(lp, jnp.array([T]), jnp.zeros((1, 2), jnp.int32), jnp.array([0]))
    expect = -float(jnp.sum(lp[0, :, 0]))
    np.testing.assert_allclose(float(nll[0]), expect, rtol=1e-5)


def test_ctc_variable_input_lengths_match_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    logits, lp, in_lens, targets, tgt_lens = _rand_problem(rng, B=6, T=30, C=8, L=6)
    in_lens = rng.integers(13, 31, size=6).astype(np.int32)

    t_lp = torch.log_softmax(torch.tensor(logits), dim=-1).transpose(0, 1)
    crit = torch.nn.CTCLoss(blank=0, reduction="none", zero_infinity=True)
    flat = torch.tensor(np.concatenate([targets[b, :tgt_lens[b]] for b in range(6)]))
    t_nll = crit(t_lp, flat, torch.tensor(in_lens), torch.tensor(tgt_lens))

    j_lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    j_nll = ctc_loss(j_lp, jnp.asarray(in_lens), jnp.asarray(targets),
                     jnp.asarray(tgt_lens), reduction="none")
    np.testing.assert_allclose(np.asarray(j_nll), t_nll.numpy(), rtol=1e-4, atol=1e-4)
