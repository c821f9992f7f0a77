"""End-to-end training sanity on real TPU: overfit a tiny batch with the
full TPU path (bf16, Pallas LSTM, analytic-VJP CTC) and verify the loss
collapses. Entirely on-device (one jitted program) because the axon tunnel
makes per-step host round-trips unusable."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from dsjax.config import BiDirectionalConfig, SpectConfig, TrainConfig, compose
from dsjax.labels import DEFAULT_LABELS
from dsjax.model.ctc import ctc_loss_auto as ctc_loss
from dsjax.model.ds2 import DeepSpeech2
from dsjax.train.state import TrainState, make_optimizer

B, F, T, L = 8, 161, 128, 6
C = len(DEFAULT_LABELS)


def main():
    cfg = compose(TrainConfig, [
        "model.hidden_size=128", "model.hidden_layers=2",
        "trainer.precision=16", "optim.learning_rate=3e-4",
    ])
    model = DeepSpeech2(num_classes=C, spect_cfg=SpectConfig(),
                        model_cfg=cfg.model, dtype=jnp.bfloat16)
    tx = make_optimizer(cfg.optim, cfg.trainer)

    @jax.jit
    def run(seed):
        k = jax.random.split(jax.random.PRNGKey(seed), 3)
        x = jax.random.normal(k[0], (B, F, T), jnp.float32)
        lens = jnp.full((B,), T, jnp.int32)
        targets = jax.random.randint(k[1], (B, L), 1, C, jnp.int32)
        tlens = jnp.full((B,), L, jnp.int32)
        variables = model.init(k[2], x, lens, train=False)
        state = TrainState(variables["params"], variables.get("batch_stats", {}),
                           tx.init(variables["params"]),
                           jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))

        def step(state, _):
            def loss_fn(p):
                (out, out_lens, _), mut = model.apply(
                    {"params": p, "batch_stats": state.batch_stats}, x, lens,
                    train=True, mutable=["batch_stats"])
                lp = jax.nn.log_softmax(out.astype(jnp.float32), -1)
                return ctc_loss(lp, out_lens, targets, tlens), mut["batch_stats"]

            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = jax.tree_util.tree_map(lambda a, u: a + u, state.params, updates)
            return TrainState(params, stats, opt_state, state.step + 1,
                              state.epoch), loss

        state, losses = jax.lax.scan(step, state, None, length=150)
        return losses

    losses = run(0)
    first, mid, last = float(losses[0]), float(losses[75]), float(losses[-1])
    print(f"loss: step0={first:.1f} step75={mid:.1f} step150={last:.1f}")
    assert last < first * 0.3, "training did not converge on TPU path"
    print("TPU end-to-end training path OK")


if __name__ == "__main__":
    main()
