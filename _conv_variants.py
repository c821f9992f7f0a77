"""Conv backward-pass variants: find a TPU-fast formulation."""
import time, sys, functools
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
F, T = 161, 1024
DT = jnp.bfloat16

def timed_pair(build):
    f1 = build(2); f2 = build(12)
    float(f1(0)); float(f2(0))
    t1 = min(_t(f1, i + 1) for i in range(2))
    t2 = min(_t(f2, i + 1) for i in range(2))
    return (t2 - t1) / 10 * 1000

def _t(f, s):
    t0 = time.perf_counter(); v = float(f(s)); t1 = time.perf_counter()
    assert np.isfinite(v)
    return t1 - t0

def bench_train(apply, w_shape, x_shape, wrt_x=False):
    def build(n):
        def prog(seed):
            rng = jax.random.PRNGKey(seed)
            x = jax.random.normal(rng, x_shape, DT)
            w = jax.random.normal(jax.random.fold_in(rng, 1), w_shape, DT) * 0.05
            def loss(w, x):
                return jnp.sum(apply(w, x).astype(jnp.float32) ** 2)
            def step(carry, _):
                w, x = carry
                if wrt_x:
                    gw, gx = jax.grad(loss, argnums=(0, 1))(w, x)
                    x = x - 1e-9 * gx.astype(x.dtype)
                else:
                    gw = jax.grad(loss)(w, x)
                return (w - 1e-9 * gw.astype(w.dtype), x), jnp.float32(0)
            (w, _), _ = jax.lax.scan(step, (w, x), None, length=n)
            return jnp.sum(w.astype(jnp.float32))
        return jax.jit(prog)
    return timed_pair(build)

dn = lambda: lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))

# V0 conv1 as-is: x (B,161,1024,1), k (41,11,1,32), stride (2,2)
def conv1_v0(w, x):
    return lax.conv_general_dilated(x, w, (2, 2), ((20, 20), (5, 5)),
                                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

# V1 conv1 NCHW
def conv1_nchw(w, x):
    return lax.conv_general_dilated(x, w, (2, 2), ((20, 20), (5, 5)),
                                    dimension_numbers=("NCHW", "OIHW", "NCHW"))

# V2 conv1 freq-patches: xf (B,81,1024,41) precomputed OUTSIDE grad (it is a
# fixed linear gather of x; grads flow through the time-conv only... but for
# dW comparison the patch step must be inside; keep inside, it's a slice op)
def conv1_patches(w, x):
    # w: (41,11,1,32) -> reshape (11,41,32) time-conv kernel (H=11? use 1D)
    xp = jnp.pad(x[..., 0], ((0, 0), (20, 20), (0, 0)))  # (B,201,1024)
    idx_f = 2 * jnp.arange(81)
    # strided freq patches: (B, 81, 1024, 41)
    xf = jnp.stack([lax.dynamic_slice_in_dim(xp, df, 161, axis=1)[:, ::2]
                    for df in range(41)], axis=-1)
    k = jnp.transpose(w[:, :, 0, :], (1, 0, 2))  # (11, 41, 32) HWIO with H=time
    return lax.conv_general_dilated(xf[:, :, :, :], k[:, :, :], (2,),
                                    ((5, 5),),
                                    dimension_numbers=("NHC", "HIO", "NHC")
                                    ) if False else lax.conv_general_dilated(
        xf.reshape(B * 81, 1024, 41)[:, :, None, :].transpose(0, 1, 3, 2)[..., 0][..., None] if False else xf.reshape(B * 81, 1, 1024, 41),
        k[None], (1, 2), ((0, 0), (5, 5)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).reshape(B, 81, 512, 32)

# V3 conv2 as-is: x (B,81,512,32), k (21,11,32,32), stride (2,1)
def conv2_v0(w, x):
    return lax.conv_general_dilated(x, w, (2, 1), ((10, 10), (5, 5)),
                                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

def conv2_nchw(w, x):
    return lax.conv_general_dilated(x, w, (2, 1), ((10, 10), (5, 5)),
                                    dimension_numbers=("NCHW", "OIHW", "NCHW"))

print(f"B={B}")
print(f"conv1 v0  (dW only): {bench_train(conv1_v0, (41, 11, 1, 32), (B, F, T, 1)):7.1f} ms")
print(f"conv1 nchw(dW only): {bench_train(conv1_nchw, (32, 1, 41, 11), (B, 1, F, T)):7.1f} ms")
print(f"conv2 v0  (dW+dx):   {bench_train(conv2_v0, (21, 11, 32, 32), (B, 81, 512, 32), wrt_x=True):7.1f} ms")
print(f"conv2 v0  (dW only): {bench_train(conv2_v0, (21, 11, 32, 32), (B, 81, 512, 32)):7.1f} ms")
print(f"conv2 nchw(dW+dx):   {bench_train(conv2_nchw, (32, 32, 21, 11), (B, 32, 81, 512), wrt_x=True):7.1f} ms")
