"""AnnealingLR (reference: sat/training/learning_rates.py:24-110).

Implemented as a pure step->lr function compatible with optax schedules.
Semantics preserved: linear warmup over `warmup_iter` steps, then
linear / cosine / exponential / None decay over `num_iters`, floored at
`decay_ratio` of the base lr.
"""

from __future__ import annotations

import math


def annealing_lr(start_lr: float, warmup_iter: int, num_iters: int,
                 decay_style: str = "linear", decay_ratio: float = 0.1):
    """Returns schedule(step) -> lr."""
    assert decay_style in ("linear", "cosine", "exponential", "constant", "None", None)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = start_lr * step / max(warmup_iter, 1)

        progress = jnp.clip((step - warmup_iter) / max(num_iters - warmup_iter, 1), 0.0, 1.0)
        if decay_style == "linear":
            decayed = start_lr * (1.0 - progress * (1.0 - decay_ratio))
        elif decay_style == "cosine":
            decayed = start_lr * (
                decay_ratio + (1 - decay_ratio) * 0.5 * (1.0 + jnp.cos(math.pi * progress))
            )
        elif decay_style == "exponential":
            decayed = start_lr * (decay_ratio ** progress)
        else:
            decayed = jnp.asarray(start_lr)
        return jnp.where((warmup_iter > 0) & (step < warmup_iter), warm, decayed)

    return schedule
