"""Learning-rate schedules.

All five scheduler choices the reference exposes through
``SentenceTransformer.fit`` (reference training/main.py:223-225:
constantlr, warmupconstant, warmuplinear, warmupcosine,
warmupcosinewithhardrestarts), built on optax.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp
import optax


def constantlr(lr: float, warmup_steps: int, total_steps: int):
    return optax.constant_schedule(lr)


def warmupconstant(lr: float, warmup_steps: int, total_steps: int):
    warmup = max(1, warmup_steps)
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup), optax.constant_schedule(lr)],
        boundaries=[warmup],
    )


def warmuplinear(lr: float, warmup_steps: int, total_steps: int):
    warmup = max(1, min(warmup_steps, max(total_steps - 1, 1)))
    decay = max(1, total_steps - warmup)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup),
            optax.linear_schedule(lr, 0.0, decay),
        ],
        boundaries=[warmup],
    )


def warmupcosine(lr: float, warmup_steps: int, total_steps: int):
    warmup = max(1, min(warmup_steps, max(total_steps - 1, 1)))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr, warmup_steps=warmup,
        decay_steps=max(total_steps, warmup + 1), end_value=0.0)


def warmupcosinewithhardrestarts(lr: float, warmup_steps: int,
                                 total_steps: int, num_cycles: int = 3):
    warmup = max(1, min(warmup_steps, max(total_steps - 1, 1)))
    decay = max(1, total_steps - warmup)

    def after_warmup(step):
        progress = jnp.clip(step / decay, 0.0, 1.0)
        cycle_progress = (progress * num_cycles) % 1.0
        return lr * jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * cycle_progress)))

    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup), after_warmup],
        boundaries=[warmup],
    )


SCHEDULES: Dict[str, Callable] = {
    "constantlr": constantlr,
    "warmupconstant": warmupconstant,
    "warmuplinear": warmuplinear,
    "warmupcosine": warmupcosine,
    "warmupcosinewithhardrestarts": warmupcosinewithhardrestarts,
}


def get_schedule(name: str, lr: float, warmup_steps: int, total_steps: int):
    if name not in SCHEDULES:
        raise ValueError(
            f"unknown scheduler {name!r}; choices: {sorted(SCHEDULES)}")
    return SCHEDULES[name](lr, warmup_steps, total_steps)
