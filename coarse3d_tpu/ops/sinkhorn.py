"""Masked Sinkhorn-Knopp sub-prototype assignment.

Behavioral model: /root/reference/pc_processor/models/sinkhorn.py:5-33
(`distributed_sinkhorn`): Q = exp(sim / eps) over the (pixels-of-one-class,
sub_prototypes) similarity block, normalized to a doubly-"stochastic"
transport plan with 3 row/col iterations, followed by a hard Gumbel-softmax
(tau=0.5) sample of the assignment one-hot and a noise-free argmax index.

TPU design: the reference runs this on a dynamically-sized `label == c`
subset; here the pixel axis is a fixed budget with a validity mask — masked
rows contribute zero mass and the "B" normalizer is the *valid* count. With
hard=True and no gradient flowing through (the caller stop-gradients), the
Gumbel-softmax sample reduces to argmax(Q + gumbel_noise) — tau only rescales
pre-argmax logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_sinkhorn(
    sim: jnp.ndarray,
    valid: jnp.ndarray,
    rng: jax.Array,
    iterations: int = 3,
    epsilon: float = 0.05,
):
    """Assign valid rows of `sim` (M, K) to K sub-prototypes.

    Returns:
      onehot: (M, K) hard assignment (zero on invalid rows), Gumbel-sampled
        like F.gumbel_softmax(Q, tau=0.5, hard=True).
      index: (M,) int32 noise-free argmax assignment (0 on invalid rows).
    """
    m, k = sim.shape
    vf = valid.astype(jnp.float32)
    # exp in fp32; subtract nothing (reference doesn't), but guard overflow:
    # cosine sims are in [-1, 1] so sim/eps <= 20/0.05 = 400 ... use the
    # masked max for stability (invariant: Q is normalized right after).
    logits = sim.astype(jnp.float32) / epsilon
    logits = logits - jnp.max(jnp.where(valid[:, None], logits, -jnp.inf))
    q = jnp.exp(logits) * vf[:, None]  # (M, K)

    def _safe_div(a, b):
        return a / jnp.where(b > 0, b, 1.0)

    n_valid = jnp.maximum(vf.sum(), 1.0)
    q = _safe_div(q, q.sum())
    for _ in range(iterations):
        # rows: total weight per prototype sums to 1/K
        q = _safe_div(q, q.sum(axis=0, keepdims=True)) / k
        # cols: total weight per valid sample sums to 1/B
        q = _safe_div(q, q.sum(axis=1, keepdims=True)) / n_valid
        q = q * vf[:, None]
    q = q * n_valid

    index = jnp.argmax(q, axis=1).astype(jnp.int32)
    gumbel = jax.random.gumbel(rng, (m, k), jnp.float32)
    hard = jnp.argmax(q + gumbel, axis=1)
    onehot = jax.nn.one_hot(hard, k, dtype=jnp.float32) * vf[:, None]
    return onehot, jnp.where(valid, index, 0)
