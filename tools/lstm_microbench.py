"""Microbenchmark: the fused Pallas LSTM layer alone, vs its MXU roofline.

Quantifies where the flagship step's remaining MFU gap lives: per-step
recurrent-matmul time at the training batch size, forward vs backward,
and the pure-matmul floor (same matmul chain, no gate math) so the VPU
(transcendental) share and the sequential-latency share are separable.

Timing uses bench.py's N-rep difference methodology (the whole benchmark
is ONE jitted program per N; per-iter time = (t(N2)-t(N1))/(N2-N1)), so
the dev tunnel's async dispatch and constant upload latency cancel.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dsjax.ops.lstm_pallas import lstm_scan, _vjp_fwd

B = int(os.environ.get("B", "64"))
H = int(os.environ.get("H", "1024"))
T = int(os.environ.get("T", "512"))
DT = jnp.bfloat16


def timed(name, body, n1=2, n2=10):
    """body(xp, w) -> scalar; iterated with a data dependency."""

    def prog(n):
        @jax.jit
        def run(seed):
            rng = jax.random.PRNGKey(seed)
            xp = jax.random.normal(rng, (T, B, 4 * H), DT)
            w = (jax.random.normal(rng, (H, 4 * H), DT) * 0.01).astype(DT)

            def it(carry, _):
                s = body((xp * (1 + carry * 1e-12)).astype(DT), w)
                return s, ()

            s, _ = jax.lax.scan(it, jnp.float32(0), None, length=n)
            return s

        return run

    f1, f2 = prog(n1), prog(n2)
    float(f1(0)); float(f2(0))
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter(); float(f1(i)); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f2(i)); tb = time.perf_counter() - t0
        best = min(best, (tb - ta) / (n2 - n1))
    print(f"{name:34s} {best*1e3:8.3f} ms   {best/T*1e6:7.3f} us/step")
    return best


def main():
    mask = jnp.ones((T, B), jnp.float32)
    b = jnp.zeros((4 * H,), DT)
    h0 = jnp.zeros((B, H), DT)
    c0 = jnp.zeros((B, H), DT)

    print(f"B={B} H={H} T={T}")
    step_flops = 2 * B * H * 4 * H
    peak = 197e12
    print(f"recurrent matmul/step: {step_flops/1e6:.0f} MFLOP "
          f"-> {step_flops/peak*1e6:.2f} us at peak bf16")

    def fwd(xp, w):
        y, h, c = lstm_scan(xp, mask, w, b, h0, c0)
        return jnp.sum(h.astype(jnp.float32))

    t_fwd = timed("pallas fwd (inference)", fwd)

    def fwd_res(xp, w):
        (y, h, c), res = _vjp_fwd(xp, mask, w, b, h0, c0, False)
        return jnp.sum(h.astype(jnp.float32)) + jnp.sum(
            res[0][0, 0, :8].astype(jnp.float32))

    t_fwd_r = timed("pallas fwd (train, residuals)", fwd_res)

    def full(xp, w):
        def loss(xp, w):
            y, h, c = lstm_scan(xp, mask, w, b, h0, c0)
            return jnp.sum(y.astype(jnp.float32))

        g = jax.grad(loss, argnums=(0, 1))(xp, w)
        return jnp.sum(g[1].astype(jnp.float32))

    t_full = timed("pallas fwd+bwd (train)", full)
    print(f"  implied bwd-only: {(t_full - t_fwd_r)*1e3:.3f} ms")

    # pure-matmul floor: identical sequential chain, no gate math
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _mm_kernel(xp_hbm, w_ref, h0_ref, h_out_ref, xp_buf, h_scr, in_sem):
        t_dim = xp_hbm.shape[0]
        h_scr[:] = h0_ref[:]

        def in_copy(t, slot):
            return pltpu.make_async_copy(xp_hbm.at[t], xp_buf.at[slot],
                                         in_sem.at[slot])
        in_copy(0, 0).start()

        def step(t, _):
            slot = jax.lax.rem(t, 2)

            @pl.when(t + 1 < t_dim)
            def _():
                in_copy(t + 1, jax.lax.rem(t + 1, 2)).start()
            in_copy(t, slot).wait()
            z = (jnp.dot(h_scr[:], w_ref[:],
                         preferred_element_type=jnp.float32)
                 + xp_buf[slot].astype(jnp.float32))
            h_scr[:] = z[:, :h_scr.shape[1]].astype(h_scr.dtype)
            return 0
        jax.lax.fori_loop(0, t_dim, step, 0)
        h_out_ref[:] = h_scr[:]

    mm_call = pl.pallas_call(
        _mm_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H), DT),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, B, 4 * H), DT),
                        pltpu.VMEM((B, H), DT),
                        pltpu.SemaphoreType.DMA((2,))],
    )

    def mm(xp, w):
        return jnp.sum(mm_call(xp, w, h0).astype(jnp.float32))

    t_mm = timed("matmul-only chain (floor)", mm)

    print(f"\nper-step: floor {t_mm/T*1e6:.2f} us | fwd {t_fwd/T*1e6:.2f} us "
          f"(gate math +{(t_fwd-t_mm)/T*1e6:.2f}) | "
          f"train fwd {t_fwd_r/T*1e6:.2f} us | "
          f"bwd {(t_full-t_fwd_r)/T*1e6:.2f} us")
    print(f"peak-matmul share of floor: {step_flops/peak/(t_mm/T)*100:.0f}%")


if __name__ == "__main__":
    main()
