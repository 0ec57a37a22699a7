"""KNN range-image post-processing (per-point label cleanup).

Behavioral model: /root/reference/pc_processor/postproc/knn.py:36-142
(lidar-bonnetal style): for every 3D point, unfold the S x S range-image
neighborhood at its pixel, replace the center with the point's true range,
weight |Δrange| by an inverted Gaussian kernel, pick the knn smallest, vote
over their argmax labels (distances past `cutoff` vote for an invalid class),
and return argmax over classes 1..C-1 (never unlabeled / invalid) + 1.
Reference quirks preserved: zero-padded border pixels keep range 0 (only
*negative* ranges are pushed to +inf, :90), and padding contributes label 0.
The reference explicitly "only works for un-batched pointclouds" (:55) — this
is batched.

TPU design (measured on v5e): random gathers dominate, so the kernel does
exactly ONE gather per point:

  1. The class label (< 32) is bit-packed into the 5 low mantissa bits of
     the range image; the S^2 neighbor windows are materialized by static
     shifted slices (vector copies, no gather).
  2. One `take_along_axis` row-gather fetches each point's packed S^2
     window (contiguous 100B per point).
  3. Labels ride THROUGH lax.top_k inside the distance values (packed into
     the distance mantissa), eliminating the index-gather of labels.
  4. Votes are a (knn x C) equality-sum, not a materialized one-hot.

Mantissa packing distorts ranges/distances by <= 31 ulp (~2e-4 at 80 m) —
immaterial against the 1.0 m cutoff. History per 8x150k-point batch on
v5e: naive unfold+double-gather 590 ms -> packed single-gather + fused
vote ~50 -> flat-take gather ~44. The remaining cost is pinned to XLA's
gather-engine descriptor rate (PERF.md "the point-op wall").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LABEL_BITS = 5
LABEL_MASK = (1 << LABEL_BITS) - 1  # 31


@functools.lru_cache(maxsize=None)
def _inv_gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    """1 - normalized 2D Gaussian, flattened to (size*size,) (knn.py:11-33)."""
    coords = np.arange(size, dtype=np.float64)
    xg, yg = np.meshgrid(coords, coords, indexing="xy")
    mean = (size - 1) / 2.0
    var = float(sigma) ** 2
    g = np.exp(-((xg - mean) ** 2 + (yg - mean) ** 2) / (2 * var)) / (
        2 * np.pi * var)
    g = g / g.sum()
    return (1.0 - g).reshape(-1).astype(np.float32)


def _pack(values: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    bits = jax.lax.bitcast_convert_type(values, jnp.int32)
    return jax.lax.bitcast_convert_type(
        (bits & ~LABEL_MASK) | labels, jnp.float32)


def _unpack(packed: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    bits = jax.lax.bitcast_convert_type(packed, jnp.int32)
    return (
        jax.lax.bitcast_convert_type(bits & ~LABEL_MASK, jnp.float32),
        bits & LABEL_MASK,
    )


@functools.partial(
    jax.jit, static_argnames=("n_classes", "knn", "search", "sigma", "cutoff",
                              "use_pallas"))
def knn_postprocess(
    proj_range: jnp.ndarray,
    point_range: jnp.ndarray,
    proj_argmax: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    *,
    n_classes: int,
    knn: int = 5,
    search: int = 5,
    sigma: float = 1.0,
    cutoff: float = 1.0,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Clean per-point labels by range-aware KNN voting.

    Args:
      proj_range: (B, H, W) range image (-1 on empty pixels).
      point_range: (B, P) true per-point range.
      proj_argmax: (B, H, W) int32 2D predicted labels in [0, n_classes).
      px, py: (B, P) int32 per-point pixel coords.

    Returns (B, P) int32 voted labels in [1, n_classes-1].
    """
    assert search % 2 == 1, "search window must be odd"
    assert n_classes <= LABEL_MASK, "labels must fit in the mantissa pack"
    b, h, w = proj_range.shape
    pad = (search - 1) // 2
    s2 = search * search
    center = s2 // 2

    # empty pixels (-1) -> huge so they never win (reference uses +inf;
    # finite keeps the packed mantissa well-defined)
    rng_img = jnp.where(proj_range < 0, jnp.float32(3.0e38), proj_range)
    packed = _pack(rng_img, proj_argmax.astype(jnp.int32))
    # zero padding parity: borders contribute range 0, label 0 == packed 0.0
    padded = jnp.pad(
        packed, ((0, 0), (pad, pad), (pad, pad)), constant_values=0.0)

    # S^2 shifted views -> (B*H*W, S^2); static slices, no gather
    windows = jnp.stack(
        [
            padded[:, pad + dy:pad + dy + h, pad + dx:pad + dx + w]
            for dy in range(-pad, pad + 1)
            for dx in range(-pad, pad + 1)
        ],
        axis=-1,
    ).reshape(b * h * w, s2)

    # ONE flat row-gather (batch folded into the row index): measured 20%
    # faster than batched take_along_axis on v5e (35.6 vs 43.6 ms at
    # B=8 x 150k points — PERF.md "KNN wall" table)
    base = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None]
    idx = base + py.astype(jnp.int32) * w + px.astype(jnp.int32)
    neigh = jnp.take(windows, idx.reshape(-1), axis=0,
                     mode="clip").reshape(b, -1, s2)        # (B, P, S2)

    if use_pallas is None:
        # measured on v5e: the XLA path (fused elementwise + lax.top_k) beats
        # the hand-written kernel (65.6 vs 54.7 scans/s end-to-end) — the
        # kernel's (TILE, 25) layout wastes lanes and its unrolled
        # min-extraction re-reads the tile knn times. Kept as an alternative.
        use_pallas = False
    if use_pallas:
        # fused distance + top-k + vote Pallas kernel: one pass over the
        # gathered windows instead of materialized (B, P, S2) intermediates
        from coarse3d_tpu.ops.pallas.knn_vote import knn_vote_pallas

        return knn_vote_pallas(
            neigh, point_range, n_classes=n_classes, knn=knn, search=search,
            sigma=sigma, cutoff=cutoff)

    neigh_range, neigh_label = _unpack(neigh)
    # center replaced by the point's own range (distance 0, label kept)
    neigh_range = neigh_range.at[..., center].set(point_range)

    inv_gauss = jnp.asarray(_inv_gaussian_kernel(search, sigma))
    # +1 offset: zero distances (the center) would otherwise pack into
    # denormals whose label bits FTZ arithmetic flushes away
    dist = jnp.abs(neigh_range - point_range[..., None]) * inv_gauss + 1.0
    # labels ride through top_k inside the distance mantissa
    dist = _pack(dist, neigh_label)

    neg_top = jax.lax.top_k(-dist, knn)[0]                  # knn smallest
    knn_dist, knn_label = _unpack(-neg_top)
    knn_dist = knn_dist - 1.0
    if cutoff > 0:
        knn_label = jnp.where(knn_dist > cutoff, n_classes, knn_label)

    # vote over classes 1..C-1 (never unlabeled 0 / invalid C)
    votes = (knn_label[..., None] ==
             jnp.arange(1, n_classes, dtype=jnp.int32)).sum(axis=-2)
    return jnp.argmax(votes, axis=-1).astype(jnp.int32) + 1
