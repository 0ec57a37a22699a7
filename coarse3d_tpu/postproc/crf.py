"""Locally-connected Gaussian-XYZ CRF refinement of range-image softmax.

Behavioral model: /root/reference/pc_processor/postproc/crf.py:11-129
(RangeNet++ style, shipped unused and unexported — SURVEY §2 / defect list):
per iteration, message passing = windowed sum of class probabilities weighted
by exp(-||Δxyz||² / 2σ²) to the window center, a learnable 1x1 compatibility
conv initialized to xyz_coef * (1 - I), residual add, softmax renorm.

TPU design: the reference unfolds per class in a Python loop (crf.py:60-72);
here the windowed message pass is a single einsum over static shifted slices
— one fused contraction instead of C unfold/fold round trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _shifted_windows(x: jnp.ndarray, wh: int, ww: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, S, C) zero-padded window views."""
    ph, pw = wh // 2, ww // 2
    pads = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    views = [
        pads[:, dy:dy + h, dx:dx + w, :]
        for dy in range(wh) for dx in range(ww)
    ]
    return jnp.stack(views, axis=3)


def init_compat_kernel(n_classes: int, xyz_coef: float) -> jnp.ndarray:
    """(C, C) compatibility matrix init: xyz_coef * (1 - I) (crf.py:96-103)."""
    eye = jnp.eye(n_classes, dtype=jnp.float32)
    return xyz_coef * (1.0 - eye)


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "lcn_h", "lcn_w", "xyz_sigma"))
def crf_refine(
    xyz: jnp.ndarray,
    softmax: jnp.ndarray,
    mask: jnp.ndarray,
    compat_kernel: jnp.ndarray,
    *,
    iterations: int = 3,
    lcn_h: int = 3,
    lcn_w: int = 5,
    xyz_sigma: float = 0.7,
) -> jnp.ndarray:
    """Refine (B, H, W, C) softmax with locally-connected xyz message passing.

    Args:
      xyz: (B, H, W, 3) projected coordinates.
      softmax: (B, H, W, C) class probabilities.
      mask: (B, H, W) valid-pixel mask.
      compat_kernel: (C, C) compatibility matrix (see init_compat_kernel; a
        trainable parameter in the reference).
    """
    win_xyz = _shifted_windows(xyz, lcn_h, lcn_w)       # (B,H,W,S,3)
    dist2 = jnp.sum(
        (win_xyz - xyz[:, :, :, None, :]) ** 2, axis=-1)  # (B,H,W,S)
    gauss = jnp.exp(-dist2 / (2.0 * xyz_sigma**2))

    m = mask[..., None].astype(softmax.dtype)
    for _ in range(iterations):
        masked = softmax * m
        win_p = _shifted_windows(masked, lcn_h, lcn_w)   # (B,H,W,S,C)
        message = jnp.einsum("bhws,bhwsc->bhwc", gauss, win_p)
        reweight = message @ compat_kernel.T + softmax
        softmax = jax.nn.softmax(reweight, axis=-1)
    return softmax
