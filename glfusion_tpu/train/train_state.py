"""Train state + optimizer with torch-Adam-compatible semantics.

Reference optimizer: ``Adam(lr=3e-4, weight_decay=1e-5)`` +
``CosineAnnealingLR(T_max=100)`` stepped per EPOCH (``main.py:162-169,257``).
torch Adam's ``weight_decay`` is an L2 term added to the gradient BEFORE the
moment updates (not AdamW) — reproduced with ``optax.add_decayed_weights``
placed before ``scale_by_adam``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state

from glfusion_tpu.config import Config


class TrainState(train_state.TrainState):
    batch_stats: Any = struct.field(default=None)


def cosine_epoch_schedule(base_lr: float, t_max: int, steps_per_epoch: int):
    """torch CosineAnnealingLR(eta_min=0) stepped once per epoch."""

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, t_max)
        return 0.5 * base_lr * (1.0 + jnp.cos(jnp.pi * epoch / t_max))

    return schedule


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = cosine_epoch_schedule(cfg.opt.lr, cfg.opt.cosine_t_max,
                                  steps_per_epoch)
    return optax.chain(
        optax.add_decayed_weights(cfg.opt.weight_decay),
        optax.scale_by_adam(b1=cfg.opt.betas[0], b2=cfg.opt.betas[1],
                            eps=1e-8),
        optax.scale_by_learning_rate(sched),
    )


def create_train_state(cfg: Config, model, rng: jax.Array,
                       sample_input: jnp.ndarray,
                       steps_per_epoch: int = 1) -> TrainState:
    variables = model.init(rng, sample_input, False)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg, steps_per_epoch),
    )
