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
    """Gather (B, H, W[, C]) image values at per-point pixels (B, P)."""
    b, h, w = image.shape[:3]
    flat = image.reshape(b, h * w, *image.shape[3:])
    idx = (py.astype(jnp.int32) * w + px.astype(jnp.int32))
    idx = jnp.clip(idx, 0, h * w - 1)
    return jnp.take_along_axis(
        flat, idx.reshape(b, -1, *([1] * (flat.ndim - 2))), axis=1
    ).reshape(*px.shape, *image.shape[3:])
