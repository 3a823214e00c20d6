"""Optimizer + LR schedule construction (optax).

Mirrors the reference executors' configure_optimizers
(reference: src/trainers/few_shot_vqa_executor.py:65-137): AdamW over the
trainable (mapper) parameters with linear / cosine / constant-with-warmup
schedules, gradient clipping, and gradient accumulation
(reference gradient_accumulation_steps, src/main.py:118) via
``optax.MultiSteps``.
"""

from __future__ import annotations

from typing import Any, Tuple

import optax


def make_schedule(config: Any, total_steps: int):
    """LR schedule per config.train.scheduler."""
    lr = float(config.train.lr)
    warmup = int(config.train.additional.get("warmup_steps", 0))
    kind = config.train.get("scheduler", "none")
    if kind == "linear":
        # linear warmup then linear decay to 0 over the training run
        return optax.schedules.warmup_linear_schedule(
            init_value=0.0 if warmup > 0 else lr,
            peak_value=lr,
            warmup_steps=max(warmup, 1),
            decay_steps=max(total_steps, warmup + 1),
            end_value=0.0,
        ) if hasattr(optax.schedules, "warmup_linear_schedule") else \
            _manual_linear(lr, warmup, total_steps)
    if kind == "cosine":
        # cosine annealing to eta_min=1e-5
        # (reference: few_shot_vqa_executor.py:100-108)
        return _manual_cosine(lr, warmup, total_steps, eta_min=1e-5)
    # constant with warmup (reference default branch :109-117)
    if warmup > 0:
        return lambda step: lr * _clip01(step / warmup)
    return lr


def _clip01(x):
    import jax.numpy as jnp

    return jnp.clip(x, 0.0, 1.0)


def _manual_linear(lr: float, warmup: int, total_steps: int):
    import jax.numpy as jnp

    def schedule(step):
        warm = jnp.where(
            warmup > 0, jnp.clip(step / max(warmup, 1), 0.0, 1.0), 1.0
        )
        decay = jnp.clip(
            (total_steps - step) / max(total_steps - warmup, 1), 0.0, 1.0
        )
        return lr * jnp.where(step < warmup, warm, decay)

    return schedule


def _manual_cosine(lr: float, warmup: int, total_steps: int,
                   eta_min: float = 1e-5):
    import jax.numpy as jnp

    def schedule(step):
        warm = jnp.clip(step / max(warmup, 1), 0.0, 1.0)
        progress = jnp.clip(
            (step - warmup) / max(total_steps - warmup, 1), 0.0, 1.0
        )
        cos = eta_min + 0.5 * (lr - eta_min) * (1 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup, lr * warm, cos)

    return schedule


def make_optimizer(
    config: Any, total_steps: int
) -> Tuple[optax.GradientTransformation, Any]:
    """Returns (optimizer, schedule). The optimizer includes clipping and
    gradient accumulation when configured."""
    schedule = make_schedule(config, total_steps)
    clipping = float(config.train.additional.get("gradient_clipping", 0))
    chain = []
    if clipping and clipping > 0:
        chain.append(optax.clip_by_global_norm(clipping))
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            eps=float(config.train.get("adam_epsilon", 1e-8)),
            weight_decay=0.01,  # torch AdamW default, used by the reference
        )
    )
    tx = optax.chain(*chain)
    accum = int(config.train.additional.get("gradient_accumulation_steps", 1))
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedule
