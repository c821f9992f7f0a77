"""Connectionist Temporal Classification loss on device.

The reference relies on torch's native C++/CUDA ``nn.CTCLoss(blank=0,
reduction='sum', zero_infinity=True)`` applied to time-major log-softmax
outputs (reference: model.py:203,241-249). This is the TPU-native
equivalent: a log-semiring alpha recursion expressed as a `lax.scan` over
time, fully vectorized over (batch, extended-label) so every step is VPU
work on static shapes; gradients come from JAX AD through the scan, which
is algebraically the standard forward-backward gradient.

Numerical notes:
  * impossible paths use a large finite negative (NEG) instead of -inf so
    reverse-mode AD never sees inf-inf -> nan;
  * `zero_infinity=True` semantics: when a sample is infeasible
    (input too short for the target), its loss AND its gradient are zeroed
    via a `where` on the final per-sample loss;
  * the recursion runs in float32 even under bfloat16 training — the
    summands span a huge dynamic range and bf16's 8 mantissa bits would
    destroy the loss signal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

NEG = -1e30  # effectively log(0), but finite so AD stays nan-free


def _extend_targets(targets: Array, blank: int) -> Array:
    """(B, L) -> (B, 2L+1) with blanks interleaved: [b, y0, b, y1, ..., b]."""
    b_dim, l_dim = targets.shape
    s_dim = 2 * l_dim + 1
    ext = jnp.full((b_dim, s_dim), blank, dtype=targets.dtype)
    ext = ext.at[:, 1::2].set(targets)
    return ext


def ctc_forward(log_probs: Array, input_lengths: Array, targets: Array,
                target_lengths: Array, blank: int = 0) -> Array:
    """Per-sample negative log-likelihoods, shape (B,).

    Args:
      log_probs: (B, T, C) log-softmax outputs.
      input_lengths: (B,) valid frame counts.
      targets: (B, L) padded label ids (pad value irrelevant; masked by
        target_lengths).
      target_lengths: (B,) valid label counts.
    """
    log_probs = log_probs.astype(jnp.float32)
    b_dim, t_dim, _ = log_probs.shape
    ext = _extend_targets(targets, blank)                      # (B, S)
    s_dim = ext.shape[1]
    s_idx = jnp.arange(s_dim)[None, :]                         # (1, S)
    s_valid = s_idx < (2 * target_lengths[:, None] + 1)        # (B, S)

    # can we skip from s-2 (label transition, not repeat / not blank)?
    ext_m2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :s_dim]
    can_skip = (ext != blank) & (ext != ext_m2)                # (B, S)

    # per-step extended-label log-probs, one gather: (T, B, S)
    lp = jnp.transpose(log_probs, (1, 0, 2))                   # (T, B, C)
    lp_ext = jnp.take_along_axis(lp, jnp.broadcast_to(ext[None], (t_dim, b_dim, s_dim)),
                                 axis=2)

    alpha0 = jnp.full((b_dim, s_dim), NEG)
    alpha0 = alpha0.at[:, 0].set(lp_ext[0, :, 0])
    has_label = target_lengths > 0
    alpha0 = alpha0.at[:, 1].set(jnp.where(has_label, lp_ext[0, :, 1], NEG))
    alpha0 = jnp.where(s_valid, alpha0, NEG)

    def shift1(a):
        return jnp.pad(a, ((0, 0), (1, 0)), constant_values=NEG)[:, :s_dim]

    def shift2(a):
        return jnp.pad(a, ((0, 0), (2, 0)), constant_values=NEG)[:, :s_dim]

    def logaddexp3(a, b, c):
        m = jnp.maximum(jnp.maximum(a, b), c)
        out = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))
        return jnp.maximum(out, NEG)

    def step(alpha, inp):
        lp_t, t = inp
        stay = alpha
        from1 = shift1(alpha)
        from2 = jnp.where(can_skip, shift2(alpha), NEG)
        new = logaddexp3(stay, from1, from2) + lp_t
        new = jnp.where(s_valid, new, NEG)
        active = (t < input_lengths)[:, None]
        alpha = jnp.where(active, new, alpha)
        return alpha, None

    ts = jnp.arange(1, t_dim)
    alpha, _ = jax.lax.scan(step, alpha0, (lp_ext[1:], ts))

    end = 2 * target_lengths                                   # index of final blank
    a_last = jnp.take_along_axis(alpha, end[:, None], axis=1)[:, 0]
    a_prev = jnp.where(
        end >= 1,
        jnp.take_along_axis(alpha, jnp.maximum(end - 1, 0)[:, None], axis=1)[:, 0],
        NEG,
    )
    m = jnp.maximum(a_last, a_prev)
    ll = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    return -ll


def ctc_loss_auto(log_probs: Array, input_lengths: Array, targets: Array,
                  target_lengths: Array, blank: int = 0, reduction: str = "sum",
                  zero_infinity: bool = True) -> Array:
    """ctc_loss that dispatches to the Pallas kernel on TPU (the lax.scan
    version is latency-bound there; see dsjax/ops/ctc_pallas.py)."""
    import jax as _jax

    if _jax.default_backend() == "tpu":
        from dsjax.ops.ctc_pallas import ctc_loss_pallas

        return ctc_loss_pallas(log_probs, input_lengths, targets,
                               target_lengths, blank, reduction, zero_infinity)
    return ctc_loss(log_probs, input_lengths, targets, target_lengths, blank,
                    reduction, zero_infinity)


def ctc_loss(log_probs: Array, input_lengths: Array, targets: Array,
             target_lengths: Array, blank: int = 0, reduction: str = "sum",
             zero_infinity: bool = True) -> Array:
    """CTC loss with torch-compatible semantics (reference: model.py:203).

    reduction: 'sum' (reference default), 'mean' (torch's target-length
    weighted mean), or 'none'.
    """
    nll = ctc_forward(log_probs, input_lengths, targets, target_lengths, blank)
    if zero_infinity:
        nll = jnp.where(nll > -NEG / 2, 0.0, nll)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        denom = jnp.maximum(target_lengths, 1).astype(nll.dtype)
        return jnp.mean(nll / denom)
    raise ValueError(f"unknown reduction {reduction!r}")
