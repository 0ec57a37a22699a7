"""Small tensor utilities (reference: utils/tensor_ops.py:3-31)."""

from __future__ import annotations

import jax.numpy as jnp


def minmax_normalize(x: jnp.ndarray, axis=(-2, -1)) -> jnp.ndarray:
    """Per-image min-max normalization to [0, 1]."""
    lo = x.min(axis=axis, keepdims=True)
    hi = x.max(axis=axis, keepdims=True)
    return (x - lo) / jnp.maximum(hi - lo, 1e-6)


def masked_mean_entropy(probs: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean per-pixel entropy over masked elements."""
    entropy = -jnp.sum(probs * jnp.log(probs + 1e-10), axis=-1)
    m = mask.astype(entropy.dtype)
    return (entropy * m).sum() / jnp.maximum(m.sum(), 1.0)
