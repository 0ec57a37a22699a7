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
