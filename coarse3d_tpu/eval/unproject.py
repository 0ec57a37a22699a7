"""2D range-image -> 3D per-point unprojection.

Behavioral model: trainer.py:713-728 — per sample, gather the 2D argmax at
each point's cached (px, py); padded points are masked instead of the
reference's implicit "padded points read pixel (0, 0)" convention. The POSS
tag path (reference reads flattened pixels through the bool tag,
trainer.py:720-724) is normalized away: POSS loaders also emit per-point
(px, py), so one gather serves all datasets.
"""

from __future__ import annotations

import jax.numpy as jnp


def unproject_image(
    image: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
) -> jnp.ndarray:
    """Gather (B, H, W[, C]) image values at per-point pixels (B, P).

    One flat row-gather with the batch folded into the index — measured
    faster than batched take_along_axis on v5e (PERF.md "point-op wall").
    """
    b, h, w = image.shape[:3]
    flat = image.reshape(b * h * w, *image.shape[3:])
    base = (jnp.arange(b, dtype=jnp.int32) * (h * w)).reshape(
        (b,) + (1,) * (px.ndim - 1))
    idx = base + py.astype(jnp.int32) * w + px.astype(jnp.int32)
    return jnp.take(flat, idx.reshape(-1), axis=0, mode="clip").reshape(
        *px.shape, *image.shape[3:])
