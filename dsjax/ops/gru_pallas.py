"""Fused GRU time-scan as a Pallas TPU kernel (companion to lstm_pallas).

Same design as the LSTM kernel (see dsjax/ops/lstm_pallas.py for the VMEM /
DMA rationale): W_hh pinned in VMEM, per-step activations staged by DMA,
per-gate matmuls. The forward streams its (r, z, n, hn) gate trajectory to
HBM; the reverse scan reads it back instead of recomputing h_prev @ W_hh
(the gates residual replaces the xp residual, and r rides along for the
dW reduction instead of being a separate backward output).

GRU semantics match torch (gate order r, z, n; reference model.py uses
nn.GRU via RNNType, enums.py:18-21):
    r = sigmoid(xr + hr);  z = sigmoid(xz + hz)
    n = tanh(xn + r * hn)          [hn includes b_hn: torch puts the
                                    recurrent bias INSIDE the r-gate product]
    h' = (1 - z) * n + z * h
where xp = x @ W_ih + b_ih (hoisted outside) and h-side terms use W_hh+b_hh.

The backward kernel emits dxp (== d gates pre-activation on the x side);
dW_hh/db_hh reduce outside as one MXU matmul with the n-column scaled by
the saved r (the only place x-side and h-side gate gradients differ).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(save_residuals, *refs):
    if save_residuals:
        (xp_hbm, mask_ref, w_ref, b_ref, h0_ref,
         y_hbm, h_out_ref, g_seq_hbm,
         xp_buf, y_buf, g_buf, h_scr, in_sem, ysem, gsem) = refs
    else:
        # inference path: skip the (T, B, 4H) gates HBM stream entirely
        (xp_hbm, mask_ref, w_ref, b_ref, h0_ref,
         y_hbm, h_out_ref,
         xp_buf, y_buf, h_scr, in_sem, ysem) = refs
        g_seq_hbm = g_buf = gsem = None
    t_dim = xp_hbm.shape[0]
    h_dim = w_ref.shape[0]
    h_scr[:] = h0_ref[:]
    n_buf = 2

    def in_copy(t, slot):
        return pltpu.make_async_copy(xp_hbm.at[t], xp_buf.at[slot],
                                     in_sem.at[slot])

    in_copy(0, 0).start()

    def step(t, _):
        slot = jax.lax.rem(t, n_buf)

        @pl.when(t + 1 < t_dim)
        def _():
            in_copy(t + 1, jax.lax.rem(t + 1, n_buf)).start()

        in_copy(t, slot).wait()
        h = h_scr[:]

        def hp(g):
            z = jnp.dot(h, w_ref[:, g * h_dim:(g + 1) * h_dim],
                        preferred_element_type=jnp.float32)
            return z + b_ref[g * h_dim:(g + 1) * h_dim].astype(jnp.float32)

        def xg(g):
            return xp_buf[slot][:, g * h_dim:(g + 1) * h_dim].astype(jnp.float32)

        hn = hp(2)
        r = jax.nn.sigmoid(xg(0) + hp(0))
        z = jax.nn.sigmoid(xg(1) + hp(1))
        n = jnp.tanh(xg(2) + r * hn)
        h_new = (1 - z) * n + z * h.astype(jnp.float32)
        m = mask_ref[t][:, None].astype(jnp.float32)
        h_keep = m * h_new + (1 - m) * h.astype(jnp.float32)
        h_scr[:] = h_keep.astype(h_scr.dtype)

        @pl.when(t >= n_buf)
        def _():
            pltpu.make_async_copy(y_buf.at[slot], y_hbm.at[t - n_buf],
                                  ysem.at[slot]).wait()
            if save_residuals:
                pltpu.make_async_copy(g_buf.at[slot], g_seq_hbm.at[t - n_buf],
                                      gsem.at[slot]).wait()

        y_buf[slot] = (h_new * m).astype(y_buf.dtype)
        pltpu.make_async_copy(y_buf.at[slot], y_hbm.at[t], ysem.at[slot]).start()
        if save_residuals:
            # (r, z, n, hn) stream out for the recompute-free backward
            g_buf[slot, :, 0 * h_dim:1 * h_dim] = r.astype(g_buf.dtype)
            g_buf[slot, :, 1 * h_dim:2 * h_dim] = z.astype(g_buf.dtype)
            g_buf[slot, :, 2 * h_dim:3 * h_dim] = n.astype(g_buf.dtype)
            g_buf[slot, :, 3 * h_dim:4 * h_dim] = hn.astype(g_buf.dtype)
            pltpu.make_async_copy(g_buf.at[slot], g_seq_hbm.at[t], gsem.at[slot]).start()
        return 0

    jax.lax.fori_loop(0, t_dim, step, 0)

    def drain(i, _):
        t = t_dim - 1 - i
        slot = jax.lax.rem(t, n_buf)
        pltpu.make_async_copy(y_buf.at[slot], y_hbm.at[t], ysem.at[slot]).wait()
        if save_residuals:
            pltpu.make_async_copy(g_buf.at[slot], g_seq_hbm.at[t], gsem.at[slot]).wait()
        return 0

    jax.lax.fori_loop(0, min(2, t_dim), drain, 0)
    h_out_ref[:] = h_scr[:]


def _gru_fwd_pallas(xp, mask, w_hh, b_hh, h0, interpret,
                    save_residuals: bool = True):
    t_dim, b_dim, g3 = xp.shape
    h_dim = w_hh.shape[0]
    dtype = xp.dtype
    out_shapes = [jax.ShapeDtypeStruct((t_dim, b_dim, h_dim), dtype),
                  jax.ShapeDtypeStruct((b_dim, h_dim), dtype)]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY),
                 pl.BlockSpec(memory_space=pltpu.VMEM)]
    scratch = [pltpu.VMEM((2, b_dim, g3), dtype),
               pltpu.VMEM((2, b_dim, h_dim), dtype)]
    if save_residuals:
        out_shapes.append(
            jax.ShapeDtypeStruct((t_dim, b_dim, 4 * h_dim), dtype))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(pltpu.VMEM((2, b_dim, 4 * h_dim), dtype))  # gates
    scratch += [pltpu.VMEM((b_dim, h_dim), dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,))]
    if save_residuals:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, save_residuals),
        out_shape=tuple(out_shapes),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xp, mask, w_hh, b_hh, h0)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(g_seq_hbm, mask_ref, w_ref, h0_ref, y_hbm, dy_hbm,
                dh_T_ref,
                dxp_hbm, dh0_ref,
                g_buf, y_buf, dy_buf, dxp_stage, dh_scr,
                gsem, ysem, dysem, dxsem):
    t_dim = g_seq_hbm.shape[0]
    h_dim = w_ref.shape[0]
    dh_scr[:] = dh_T_ref[:].astype(jnp.float32)
    n_buf = 2

    def start_loads(t, slot):
        tm1 = jnp.maximum(t - 1, 0)
        pltpu.make_async_copy(g_seq_hbm.at[t], g_buf.at[slot], gsem.at[slot]).start()
        pltpu.make_async_copy(dy_hbm.at[t], dy_buf.at[slot], dysem.at[slot]).start()
        pltpu.make_async_copy(y_hbm.at[tm1], y_buf.at[slot], ysem.at[slot]).start()

    def wait_loads(slot):
        for buf, sem in ((g_buf, gsem), (dy_buf, dysem), (y_buf, ysem)):
            pltpu.make_async_copy(buf.at[slot], buf.at[slot], sem.at[slot]).wait()

    start_loads(t_dim - 1, (t_dim - 1) % n_buf)

    def step(i, _):
        t = t_dim - 1 - i
        slot = jax.lax.rem(t, n_buf)

        @pl.when(t - 1 >= 0)
        def _():
            start_loads(t - 1, jax.lax.rem(t - 1, n_buf))

        wait_loads(slot)
        h_prev = jnp.where(t == 0, h0_ref[:], y_buf[slot])
        hp32 = h_prev.astype(jnp.float32)

        # gates saved by the forward — no h_prev @ W recompute
        gb = g_buf[slot]
        r = gb[:, 0 * h_dim:1 * h_dim].astype(jnp.float32)
        z = gb[:, 1 * h_dim:2 * h_dim].astype(jnp.float32)
        n = gb[:, 2 * h_dim:3 * h_dim].astype(jnp.float32)
        hn = gb[:, 3 * h_dim:4 * h_dim].astype(jnp.float32)

        m = mask_ref[t][:, None].astype(jnp.float32)
        dh_acc = dh_scr[:] + dy_buf[slot].astype(jnp.float32) * m
        dh_new = dh_acc * m

        dz = dh_new * (hp32 - n)
        dn = dh_new * (1 - z)
        dn_pre = dn * (1 - n * n)
        dr = dn_pre * hn
        dhn = dn_pre * r
        dr_pre = dr * r * (1 - r)
        dz_pre = dz * z * (1 - z)

        @pl.when(i >= n_buf)
        def _():
            t_old = t + n_buf
            pltpu.make_async_copy(dxp_stage.at[slot], dxp_hbm.at[t_old],
                                  dxsem.at[slot]).wait()

        dxp_stage[slot, :, 0:h_dim] = dr_pre.astype(dxp_stage.dtype)
        dxp_stage[slot, :, h_dim:2 * h_dim] = dz_pre.astype(dxp_stage.dtype)
        dxp_stage[slot, :, 2 * h_dim:3 * h_dim] = dn_pre.astype(dxp_stage.dtype)
        pltpu.make_async_copy(dxp_stage.at[slot], dxp_hbm.at[t], dxsem.at[slot]).start()

        dh_prev = dh_new * z
        for g, dgate in enumerate((dr_pre, dz_pre, dhn)):
            dh_prev += jax.lax.dot_general(
                dgate.astype(w_ref.dtype), w_ref[:, g * h_dim:(g + 1) * h_dim],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        dh_scr[:] = dh_prev + dh_acc * (1 - m)
        return 0

    jax.lax.fori_loop(0, t_dim, step, 0)

    def drain(j, _):
        slot = jax.lax.rem(j, n_buf)
        pltpu.make_async_copy(dxp_stage.at[slot], dxp_hbm.at[j], dxsem.at[slot]).wait()
        return 0

    jax.lax.fori_loop(0, min(2, t_dim), drain, 0)
    dh0_ref[:] = dh_scr[:].astype(dh0_ref.dtype)


def _gru_bwd_pallas(g_seq, mask, w_hh, h0, y, dy, dh_T, interpret):
    t_dim, b_dim, g4 = g_seq.shape
    h_dim = w_hh.shape[0]
    g3 = 3 * h_dim
    dtype = g_seq.dtype
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=(jax.ShapeDtypeStruct((t_dim, b_dim, g3), dtype),   # dxp
                   jax.ShapeDtypeStruct((b_dim, h_dim), dtype)),      # dh0
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),      # gates
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, b_dim, g4), dtype),       # gates staging
            pltpu.VMEM((2, b_dim, h_dim), dtype),    # y staging
            pltpu.VMEM((2, b_dim, h_dim), dtype),    # dy staging
            pltpu.VMEM((2, b_dim, g3), dtype),       # dxp staging
            pltpu.VMEM((b_dim, h_dim), jnp.float32), # dh carry
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(g_seq, mask, w_hh, h0, y, dy, dh_T)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gru_scan(xp: Array, mask: Array, w_hh: Array, b_hh: Array, h0: Array,
             interpret: bool = False) -> Tuple[Array, Array]:
    """Masked GRU recurrence over time. Returns (y, h_T).

    Forward-only (primal) calls skip the gates HBM stream; _vjp_fwd saves
    residuals when differentiated."""
    y, h_t = _gru_fwd_pallas(xp, mask, w_hh, b_hh, h0, interpret,
                             save_residuals=False)
    return y, h_t


def _vjp_fwd(xp, mask, w_hh, b_hh, h0, interpret):
    y, h_t, g_seq = _gru_fwd_pallas(xp, mask, w_hh, b_hh, h0, interpret)
    # the gates residual replaces xp (4H vs 3H — the r trajectory the old
    # backward emitted separately now rides along inside it)
    return (y, h_t), (g_seq, mask, w_hh, b_hh, h0, y)


def _vjp_bwd(interpret, residuals, cotangents):
    g_seq, mask, w_hh, b_hh, h0, y = residuals
    dy, dh_T = cotangents
    dxp, dh0 = _gru_bwd_pallas(
        g_seq, mask, w_hh, h0, y, dy.astype(g_seq.dtype),
        dh_T.astype(h0.dtype), interpret)
    t_dim, b_dim, g3 = dxp.shape
    h_dim = w_hh.shape[0]
    # h-side gate grads: same as dxp except the n column scales by r
    dxp32 = dxp.astype(jnp.float32)
    r_traj = g_seq[:, :, 0:h_dim]
    dhp = jnp.concatenate(
        [dxp32[:, :, : 2 * h_dim],
         dxp32[:, :, 2 * h_dim:] * r_traj.astype(jnp.float32)], axis=-1)
    # see lstm_pallas: h_prev must read h0 (not the zero-masked y) until
    # the first valid step, for suffix-shaped masks with nonzero carry
    h_prev = jnp.concatenate([h0[None], y[:-1]], axis=0)
    seen_valid = (jnp.cumsum(mask, axis=0) - mask) > 0
    h_prev = jnp.where(seen_valid[..., None], h_prev,
                       h0[None].astype(h_prev.dtype))
    dw = jax.lax.dot_general(
        h_prev.reshape(t_dim * b_dim, -1), dhp.reshape(t_dim * b_dim, g3),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db = jnp.sum(dhp, axis=(0, 1))
    return (dxp, None, dw.astype(w_hh.dtype), db.astype(b_hh.dtype),
            dh0)


gru_scan.defvjp(_vjp_fwd, _vjp_bwd)


def gru_scan_reference(xp, mask, w_hh, b_hh, h0):
    """lax.scan twin for parity tests."""
    dtype = xp.dtype
    h_dim = w_hh.shape[0]

    def step(h, inp):
        xp_t, m = inp
        hp = (jnp.dot(h, w_hh, preferred_element_type=jnp.float32)
              + b_hh.astype(jnp.float32))
        xr, xz, xn = jnp.split(xp_t.astype(jnp.float32), 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1 - z) * n + z * h.astype(jnp.float32)
        m1 = m[:, None].astype(jnp.float32)
        h = (m1 * h_new + (1 - m1) * h.astype(jnp.float32)).astype(dtype)
        return h, (h_new * m1).astype(dtype)

    h_t, y = jax.lax.scan(step, h0, (xp, mask))
    return y, h_t
