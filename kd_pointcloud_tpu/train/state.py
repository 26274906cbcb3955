"""Train state + optimizer.

Optimizer matches the reference exactly (train_bid_pointconv.py:117-124):
Adam(β=(0.9, 0.999), ε=1e-8) with additive L2 weight decay 1e-4 folded into
the gradient before the moment updates (torch Adam `weight_decay` semantics,
NOT AdamW), StepLR(step_size=100 epochs, γ=0.5) with lr clipped at ≥1e-5
(:126, 131-135). The learning rate is an injected hyperparam set once per
epoch from the host, like the reference's per-epoch param_group update.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp
import optax

LEARNING_RATE_CLIP = 1e-5


def step_lr(base_lr: float, epoch: int, step_size: int = 100,
            gamma: float = 0.5, clip: float = LEARNING_RATE_CLIP) -> float:
    return max(base_lr * gamma ** (epoch // step_size), clip)


def custom_lr(epoch: int, lrs, lr_switch_epochs) -> float:
    """Reference custom-lr schedule (main_utils.py:12-31 + the descending
    parse in cmd_args.py:31-39): lrs/switch epochs are stored descending;
    the lr is the first entry whose switch epoch the current epoch has
    reached."""
    for lr, switch in zip(lrs, lr_switch_epochs):
        if epoch >= switch:
            return lr
    return lrs[-1]


def lr_for_epoch(args, epoch: int) -> float:
    """Resolve the epoch's learning rate from a config: custom_lr schedule
    when configured, StepLR otherwise."""
    if args.get("custom_lr"):
        return custom_lr(epoch, args.lrs, args.lr_switch_epochs)
    return step_lr(args.learning_rate, epoch)


def make_optimizer(learning_rate: float = 1e-3,
                   weight_decay: float = 1e-4) -> optax.GradientTransformation:
    def tx(lr):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-lr),
        )
    return optax.inject_hyperparams(tx)(lr=learning_rate)


def set_learning_rate(opt_state, lr: float):
    """Update the injected lr in-place-style (returns new opt state)."""
    opt_state.hyperparams["lr"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation):
        return cls(params=variables["params"],
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(variables["params"]),
                   step=jnp.zeros((), jnp.int32))

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}
