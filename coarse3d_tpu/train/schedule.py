"""Per-iteration warmup + cosine LR schedule.

Behavioral model: reference WarmupCosineLR (utils/warmup_lr.py:55-107) as the
trainer configures it (trainer.py:135-144): linear 0 -> lr over
`warmup_epochs * iters_per_epoch` steps (the CyclicLR up-leg), then cosine
annealing to 0 over `iters_per_epoch * (n_epochs - warmup_epochs)` steps,
stepped every iteration (trainer.py:704).
"""

from __future__ import annotations

import optax


def warmup_cosine_schedule(
    lr: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    warmup_steps = max(warmup_steps, 1)
    decay_steps = max(total_steps - warmup_steps, 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup_steps),
            optax.cosine_decay_schedule(lr, decay_steps),
        ],
        boundaries=[warmup_steps],
    )


def warmup_exp_schedule(
    lr: float, warmup_steps: int, decay: float
) -> optax.Schedule:
    """Legacy WarmupLR (utils/warmup_lr.py:6-52): linear warmup to lr, then
    lr * decay^step exponential decay."""
    warmup_steps = max(warmup_steps, 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup_steps),
            optax.exponential_decay(lr, transition_steps=1, decay_rate=decay),
        ],
        boundaries=[warmup_steps],
    )


def warmup_multistep_schedule(
    lr: float, warmup_steps: int, milestones: tuple[int, ...],
    gamma: float = 0.1
) -> optax.Schedule:
    """WarmupMultiStepLR analog (utils/lr_scheduler.py:9-57)."""
    warmup_steps = max(warmup_steps, 1)
    boundaries = {m: gamma for m in milestones}
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup_steps),
            optax.piecewise_constant_schedule(lr, boundaries),
        ],
        boundaries=[warmup_steps],
    )


def poly_schedule(lr: float, total_steps: int, power: float = 0.9
                  ) -> optax.Schedule:
    """PolyOptimizer analog (utils/lr_scheduler.py:59-83):
    lr * (1 - step/total)^power."""

    def schedule(step):
        import jax.numpy as jnp

        frac = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        return lr * (1.0 - frac) ** power

    return schedule


def clipped_schedule(base: optax.Schedule, min_lr: float) -> optax.Schedule:
    """ClipLR analog (utils/lr_scheduler.py:85-...): floor the LR."""

    def schedule(step):
        import jax.numpy as jnp

        return jnp.maximum(base(step), min_lr)

    return schedule
