"""Isolate the alpha-kernel cost: roll-based vs slice-based vs transposed."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, T = 32, 640, 512
NEG = -1e30


def kernel_roll(lp_hbm, a0, out, buf, scr, sem):
    col = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    scr[:] = a0[:]

    def step(t, _):
        slot = jax.lax.rem(t, 2)
        pltpu.make_async_copy(lp_hbm.at[t], buf.at[slot], sem.at[slot]).start()
        pltpu.make_async_copy(lp_hbm.at[t], buf.at[slot], sem.at[slot]).wait()
        a = scr[:]
        a1 = jnp.where(col >= 1, pltpu.roll(a, shift=1, axis=1), NEG)
        a2 = jnp.where(col >= 2, pltpu.roll(a, shift=2, axis=1), NEG)
        m = jnp.maximum(jnp.maximum(a, a1), a2)
        scr[:] = m + jnp.log(jnp.exp(a - m) + jnp.exp(a1 - m) + jnp.exp(a2 - m)) + buf[slot]
        return 0

    jax.lax.fori_loop(0, T, step, 0)
    out[:] = scr[:]


def kernel_sub(lp_hbm, a0, out, buf, scr, sem):
    # S on sublanes: arrays are (S, B)
    row = jax.lax.broadcasted_iota(jnp.int32, (S, B), 0)
    scr[:] = a0[:]

    def step(t, _):
        slot = jax.lax.rem(t, 2)
        pltpu.make_async_copy(lp_hbm.at[t], buf.at[slot], sem.at[slot]).start()
        pltpu.make_async_copy(lp_hbm.at[t], buf.at[slot], sem.at[slot]).wait()
        a = scr[:]
        a1 = jnp.where(row >= 1, pltpu.roll(a, shift=1, axis=0), NEG)
        a2 = jnp.where(row >= 2, pltpu.roll(a, shift=2, axis=0), NEG)
        m = jnp.maximum(jnp.maximum(a, a1), a2)
        scr[:] = m + jnp.log(jnp.exp(a - m) + jnp.exp(a1 - m) + jnp.exp(a2 - m)) + buf[slot]
        return 0

    jax.lax.fori_loop(0, T, step, 0)
    out[:] = scr[:]


def kernel_noshift(lp_hbm, a0, out, buf, scr, sem):
    # lower bound: no shifts at all (pure elementwise)
    scr[:] = a0[:]

    def step(t, _):
        slot = jax.lax.rem(t, 2)
        pltpu.make_async_copy(lp_hbm.at[t], buf.at[slot], sem.at[slot]).start()
        pltpu.make_async_copy(lp_hbm.at[t], buf.at[slot], sem.at[slot]).wait()
        a = scr[:]
        m = jnp.maximum(a, a * 0.5)
        scr[:] = m + jnp.log(jnp.exp(a - m) * 3.0) + buf[slot]
        return 0

    jax.lax.fori_loop(0, T, step, 0)
    out[:] = scr[:]


def run(kernel, shape):
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2,) + shape, jnp.float32),
                        pltpu.VMEM(shape, jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return f


def bench(name, kernel, transposed, n1=1, n2=11):
    shape = (S, B) if transposed else (B, S)

    def prog(n):
        @jax.jit
        def r(seed):
            k = jax.random.PRNGKey(seed)
            lp = jax.random.normal(k, (T,) + shape, jnp.float32) * 0.1
            a0 = jnp.zeros(shape, jnp.float32)

            def body(a0, _):
                o = run(kernel, shape)(lp, a0)
                return o * 1e-6, jnp.sum(o)

            a, s = jax.lax.scan(body, a0, None, length=n)
            return jnp.sum(a) + s[-1]

        return r

    f1, f2 = prog(n1), prog(n2)
    float(f1(0)); float(f2(0))

    def t(f):
        best = 1e9
        for i in range(2):
            t0 = time.perf_counter(); float(f(i + 3)); best = min(best, time.perf_counter() - t0)
        return best

    dt = (t(f2) - t(f1)) / (n2 - n1)
    print(f"{name:24s} {dt * 1e3:8.3f} ms  ({dt / T * 1e6:.2f} us/step)")


if __name__ == "__main__":
    bench("no-shift lower bound", kernel_noshift, False)
    bench("roll on lanes (B,S)", kernel_roll, False)
    bench("roll on sublanes (S,B)", kernel_sub, True)
