"""Bilinear resize with align_corners=True semantics, as two matmuls.

The reference leans on `F.interpolate(..., mode='bilinear',
align_corners=True)` for its multi-scale feature mix and embedding upsample
(salsanext_proto.py:466-492, trainer.py:636-638). `jax.image.resize` only
offers half-pixel (align_corners=False) sampling, so this implements the
align-corners grid exactly — and does it as separable (out, in) weight-matrix
contractions, which XLA maps straight onto the MXU instead of gather chains.
Weights depend only on static shapes and are baked at trace time.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _axis_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic bilinear interpolation matrix."""
    w = np.zeros((n_out, n_in), dtype=np.float32)
    if n_out == 1 or n_in == 1:
        w[:, 0] = 1.0
        return w
    scale = (n_in - 1) / (n_out - 1)
    pos = np.arange(n_out) * scale
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (pos - lo).astype(np.float32)
    w[np.arange(n_out), lo] += 1.0 - frac
    w[np.arange(n_out), hi] += frac
    return w


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize (B, H, W, C) -> (B, out_h, out_w, C), align_corners=True."""
    _, h, w, _ = x.shape
    if h == out_h and w == out_w:
        return x
    dtype = x.dtype
    wh = jnp.asarray(_axis_weights(h, out_h), dtype)
    ww = jnp.asarray(_axis_weights(w, out_w), dtype)
    # (B,H,W,C) -> (B,out_h,W,C) -> (B,out_h,out_w,C)
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    x = jnp.einsum("ow,bhwc->bhoc", ww, x)
    return x
