"""Per-component device timing via the N-rep difference trick."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

from dsjax.config import BiDirectionalConfig, SpectConfig, TrainConfig, compose
from dsjax.labels import DEFAULT_LABELS
from dsjax.model.ctc import ctc_loss_auto as ctc_loss
from dsjax.model.ds2 import DeepSpeech2

B, F, T, L = 32, 161, 1024, 256
C = len(DEFAULT_LABELS)
DT = jnp.bfloat16


def timed(name, make_step, n1=1, n2=6):
    def prog(n):
        @jax.jit
        def run(seed):
            rng = jax.random.PRNGKey(seed)
            init = make_step(rng)

            def body(carry, _):
                carry, out = init["step"](carry)
                return carry, out

            carry, outs = jax.lax.scan(body, init["carry"], None, length=n)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x.astype(jnp.float32)), carry, 0.0)

        return run

    f1, f2 = jax.jit(prog(n1)), jax.jit(prog(n2))
    float(f1(0)); float(f2(0))

    def t(f):
        best = 1e9
        for i in range(2):
            t0 = time.perf_counter(); float(f(i + 3)); best = min(best, time.perf_counter() - t0)
        return best

    dt = (t(f2) - t(f1)) / (n2 - n1)
    print(f"{name:28s} {dt * 1000:8.2f} ms")
    return dt


def fwd_bwd_model(train=True, pallas=None):
    cfg = BiDirectionalConfig(hidden_size=1024, hidden_layers=5)
    model = DeepSpeech2(num_classes=C, spect_cfg=SpectConfig(), model_cfg=cfg,
                        dtype=DT, use_pallas=pallas)

    def make(rng):
        x = jax.random.normal(rng, (B, F, T), jnp.float32)
        lengths = jnp.full((B,), T, jnp.int32)
        targets = jax.random.randint(rng, (B, L), 1, C, jnp.int32)
        tlens = jnp.full((B,), L, jnp.int32)
        variables = model.init(rng, x, lengths, train=False)
        params = variables["params"]
        stats = variables.get("batch_stats", {})

        def step(carry):
            params, x = carry

            def loss_fn(p):
                (out, out_lens, _), mut = model.apply(
                    {"params": p, "batch_stats": stats}, x, lengths,
                    train=True, mutable=["batch_stats"])
                lp = jax.nn.log_softmax(out.astype(jnp.float32), -1)
                return ctc_loss(lp, out_lens, targets, tlens)

            if train:
                loss, grads = jax.value_and_grad(loss_fn)(params)
                params = jax.tree_util.tree_map(lambda a, g: a - 1e-6 * g, params, grads)
            else:
                out, out_lens, _ = model.apply({"params": params, "batch_stats": stats},
                                               x, lengths, train=False)
                loss = jnp.sum(out.astype(jnp.float32))
                params = jax.tree_util.tree_map(lambda a: a + 1e-9 * loss, params)
            return (params, x + 1e-9 * loss), loss

        return {"carry": (params, x), "step": step}

    return make


def ctc_only():
    def make(rng):
        logits = jax.random.normal(rng, (B, T // 2, C), jnp.float32)
        targets = jax.random.randint(rng, (B, L), 1, C, jnp.int32)
        lens = jnp.full((B,), T // 2, jnp.int32)
        tlens = jnp.full((B,), L, jnp.int32)

        def step(carry):
            logits = carry

            def loss_fn(lg):
                return ctc_loss(jax.nn.log_softmax(lg, -1), lens, targets, tlens)

            loss, g = jax.value_and_grad(loss_fn)(logits)
            return logits - 1e-6 * g, loss

        return {"carry": logits, "step": step}

    return make


if __name__ == "__main__":
    timed("full train step (pallas)", fwd_bwd_model(True, None))
    timed("full train step (xla scan)", fwd_bwd_model(True, False))
    timed("forward only (pallas)", fwd_bwd_model(False, None))
    timed("forward only (xla scan)", fwd_bwd_model(False, False))
    timed("ctc fwd+bwd only", ctc_only())
