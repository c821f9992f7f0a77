"""Train state + optimizer construction.

Optimizer parity with the reference (model.py:273-297): AdamW (decoupled wd,
betas, eps) or SGD (nesterov, momentum, coupled L2 wd), both with per-epoch
exponential LR decay (gamma = learning_anneal) and global-norm gradient
clipping at trainer.gradient_clip_val (applied pre-optimizer, as Lightning
does). The LR schedule reads the epoch from the state so it needs no
steps-per-epoch constant baked into the compiled step.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from dsjax.config import AdamConfig, OptimConfig, SGDConfig, TrainerConfig


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray              # int32 scalar
    epoch: jnp.ndarray             # int32 scalar (drives LR anneal)

    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_optimizer(optim_cfg: OptimConfig, trainer_cfg: TrainerConfig
                   ) -> optax.GradientTransformation:
    """Build the optax chain. The injected `epoch` hyperparam implements
    torch's ExponentialLR: lr = base * gamma^epoch."""
    base_lr = optim_cfg.learning_rate
    gamma = optim_cfg.learning_anneal

    def make(epoch_lr: Any) -> optax.GradientTransformation:
        if isinstance(optim_cfg, SGDConfig):
            # torch SGD: coupled L2 weight decay added to the gradient
            # BEFORE momentum (reference: model.py:275-281)
            return optax.chain(
                optax.add_decayed_weights(optim_cfg.weight_decay),
                optax.sgd(epoch_lr, momentum=optim_cfg.momentum, nesterov=True),
            )
        adam: AdamConfig = optim_cfg if isinstance(optim_cfg, AdamConfig) else AdamConfig()
        return optax.adamw(epoch_lr, b1=adam.betas[0], b2=adam.betas[1],
                           eps=adam.eps, weight_decay=adam.weight_decay)

    @optax.inject_hyperparams
    def with_lr(learning_rate):
        return make(learning_rate)

    opt = with_lr(base_lr)
    if trainer_cfg.gradient_clip_val and trainer_cfg.gradient_clip_val > 0:
        opt = optax.chain(optax.clip_by_global_norm(trainer_cfg.gradient_clip_val), opt)
    return opt


def epoch_lr(optim_cfg: OptimConfig, epoch: jnp.ndarray) -> jnp.ndarray:
    return optim_cfg.learning_rate * optim_cfg.learning_anneal ** epoch.astype(jnp.float32)


def set_lr(opt_state: Any, lr: jnp.ndarray) -> Any:
    """Update the injected learning_rate hyperparam in-place in the chain."""
    def visit(s):
        hp = getattr(s, "hyperparams", None)
        if hp is not None and "learning_rate" in hp:
            hp = dict(hp)
            hp["learning_rate"] = lr
            return s._replace(hyperparams=hp)
        return s

    if isinstance(opt_state, tuple) and not hasattr(opt_state, "hyperparams"):
        return tuple(visit(s) for s in opt_state)
    return visit(opt_state)
