"""TPU-side validation + micro-benchmark of the Pallas LSTM scan.

Timing uses the N-rep difference trick (everything on-device in one program;
only a scalar is fetched) because the axon tunnel's block_until_ready is
async and per-call transfers dominate.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from dsjax.ops.lstm_pallas import lstm_scan, lstm_scan_reference

T, B, H = 512, 32, 1024
DT = jnp.bfloat16


def make_inputs(seed):
    k = jax.random.split(jax.random.PRNGKey(seed), 5)
    xp = jax.random.normal(k[0], (T, B, 4 * H), DT) * 0.3
    w = jax.random.normal(k[1], (H, 4 * H), DT) * 0.05
    b = jax.random.normal(k[2], (4 * H,), DT) * 0.1
    h0 = jnp.zeros((B, H), DT)
    c0 = jnp.zeros((B, H), DT)
    lengths = jnp.where(jnp.arange(B) % 2 == 0, T, T // 2)
    mask = (jnp.arange(T)[:, None] < lengths[None, :]).astype(jnp.float32)
    return xp, mask, w, b, h0, c0


# ---- correctness on real TPU (compiled pallas vs compiled scan) ----
@jax.jit
def compare(seed):
    xp, mask, w, b, h0, c0 = make_inputs(seed)
    y_p, h_p, c_p = lstm_scan(xp, mask, w, b, h0, c0)
    y_r, h_r, c_r = lstm_scan_reference(xp, mask.astype(DT), w, b, h0, c0)
    return (jnp.max(jnp.abs(y_p.astype(jnp.float32) - y_r.astype(jnp.float32))),
            jnp.max(jnp.abs(h_p.astype(jnp.float32) - h_r.astype(jnp.float32))),
            jnp.mean(jnp.abs(y_r.astype(jnp.float32))))


@jax.jit
def compare_grads(seed):
    xp, mask, w, b, h0, c0 = make_inputs(seed)

    def lp(w):
        y, h, c = lstm_scan(xp, mask, w, b, h0, c0)
        return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(h.astype(jnp.float32))

    def lr(w):
        y, h, c = lstm_scan_reference(xp, mask.astype(DT), w, b, h0, c0)
        return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(h.astype(jnp.float32))

    gp = jax.grad(lp)(w)
    gr = jax.grad(lr)(w)
    scale = jnp.mean(jnp.abs(gr.astype(jnp.float32))) + 1e-9
    return jnp.max(jnp.abs(gp.astype(jnp.float32) - gr.astype(jnp.float32))) / scale, scale


def bench(fn_builder, n1=1, n2=6):
    def prog(n):
        @jax.jit
        def run(seed):
            xp, mask, w, b, h0, c0 = make_inputs(seed)

            def body(carry, _):
                xp_c, out_acc = carry
                y, h, c = fn_builder(xp_c, mask, w, b, h0, c0)
                # feed y-dependent value back so steps can't be elided/overlapped
                xp_c = xp_c + jnp.mean(y).astype(DT) * 1e-6
                return (xp_c, out_acc + jnp.sum(h.astype(jnp.float32))), None

            (xp_f, acc), _ = jax.lax.scan(body, (xp, 0.0), None, length=n)
            return acc

        return run

    f1, f2 = prog(n1), prog(n2)
    float(f1(0)); float(f2(0))  # warm

    def t(f):
        best = 1e9
        for i in range(2):
            t0 = time.perf_counter(); float(f(i + 7)); best = min(best, time.perf_counter() - t0)
        return best
    return (t(f2) - t(f1)) / (n2 - n1)


if __name__ == "__main__":
    dy, dh, scale = compare(0)
    print(f"fwd maxdiff y={float(dy):.5f} h={float(dh):.5f} (mean |y|={float(scale):.3f})")
    gd, gs = compare_grads(0)
    print(f"grad rel maxdiff={float(gd):.5f} (mean |g|={float(gs):.5f})")

    tp = bench(lambda *a: lstm_scan(*a))
    tr = bench(lambda xp, mask, w, b, h0, c0:
               lstm_scan_reference(xp, mask.astype(DT), w, b, h0, c0))
    print(f"pallas: {tp * 1000:.2f} ms/call   xla-scan: {tr * 1000:.2f} ms/call  "
          f"speedup {tr / tp:.2f}x")
