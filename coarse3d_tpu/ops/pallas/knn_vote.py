"""Pallas TPU kernel: fused KNN distance + top-k + vote.

The per-point stage of KNN post-processing (ops/knn.py) after the window
gather is a chain of (B, P, S²) elementwise ops, lax.top_k, a label gather
and a vote reduction — each materializing a (B, P, S²)-sized intermediate in
HBM (~15 ms per 8x150k batch). This kernel fuses the whole chain into one
pass over point tiles: the packed windows are read once, distances carry
their class labels in the 5 low mantissa bits, top-k is k rounds of
min-extraction (the extracted MIN VALUE carries its label — no index
bookkeeping), and votes accumulate in registers. HBM traffic drops to one
read of the windows + one (B, P) write.

Mosaic constraints shaping the design: trailing block dims must be
(x8, x128) or full-size — hence (1, TILE, S2) input blocks and a 3-D
(1, TILE, 1) output block; no cumsum — first-occurrence tie-break is a
masked min over column indices; distances get a +1 offset so a zero
distance (the center tap) never packs into a denormal whose label bits FTZ
arithmetic would flush.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LABEL_MASK = 31
TILE = 1024


def _kernel(neigh_ref, prange_ref, inv_gauss_ref, out_ref, *, center,
            n_classes, knn, cutoff):
    neigh = neigh_ref[0]                      # (TILE, S2) packed f32
    prange = prange_ref[0]                    # (TILE, 1) f32

    bits = jax.lax.bitcast_convert_type(neigh, jnp.int32)
    labels = bits & LABEL_MASK
    ranges = jax.lax.bitcast_convert_type(bits & ~LABEL_MASK, jnp.float32)

    # center column = the point's own range (distance 0, label preserved)
    s2 = neigh.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, ranges.shape, 1)
    ranges = jnp.where(col == center, prange, ranges)

    # +1 offset keeps zero distances out of denormal territory (FTZ would
    # flush the packed label bits); ordering is unaffected
    dist = jnp.abs(ranges - prange) * inv_gauss_ref[:] + 1.0
    dbits = jax.lax.bitcast_convert_type(dist, jnp.int32)
    work = jax.lax.bitcast_convert_type((dbits & ~LABEL_MASK) | labels,
                                        jnp.float32)

    votes = jnp.zeros((neigh.shape[0], n_classes - 1), jnp.float32)
    cls_ids = jax.lax.broadcasted_iota(jnp.int32, votes.shape, 1) + 1
    for _ in range(knn):
        m = jnp.min(work, axis=1, keepdims=True)          # (TILE, 1)
        mbits = jax.lax.bitcast_convert_type(m, jnp.int32)
        lbl = mbits & LABEL_MASK
        d = jax.lax.bitcast_convert_type(mbits & ~LABEL_MASK, jnp.float32)
        if cutoff > 0:
            lbl = jnp.where(d - 1.0 > cutoff, n_classes, lbl)
        votes = votes + (lbl == cls_ids).astype(jnp.float32)
        # knock out ONE occurrence of the minimum — the lowest column index
        is_min = work == m
        first_col = jnp.min(jnp.where(is_min, col, s2), axis=1,
                            keepdims=True)
        work = jnp.where(col == first_col, jnp.float32(3.0e38), work)

    out = (jnp.argmax(votes, axis=1) + 1).astype(jnp.int32)
    out_ref[0] = out[:, None]


def knn_vote_pallas(
    neigh_packed: jnp.ndarray,
    point_range: jnp.ndarray,
    *,
    n_classes: int,
    knn: int,
    search: int,
    sigma: float,
    cutoff: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused vote over pre-gathered packed windows.

    Args:
      neigh_packed: (B, P, S²) float32, label-packed neighbor ranges
        (ops/knn.py _pack convention; empty pixels already pushed to huge).
      point_range: (B, P) float32 true per-point range.

    Returns (B, P) int32 voted labels in [1, n_classes-1].
    """
    from coarse3d_tpu.ops.knn import _inv_gaussian_kernel

    b, p, s2 = neigh_packed.shape
    p_pad = -(-p // TILE) * TILE
    if p_pad != p:
        neigh_packed = jnp.pad(neigh_packed,
                               ((0, 0), (0, p_pad - p), (0, 0)))
        point_range = jnp.pad(point_range, ((0, 0), (0, p_pad - p)))

    inv_gauss = jnp.asarray(_inv_gaussian_kernel(search, sigma))[None, :]
    kernel = functools.partial(
        _kernel, center=s2 // 2, n_classes=n_classes, knn=knn, cutoff=cutoff)

    out = pl.pallas_call(
        kernel,
        grid=(b, p_pad // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, s2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, 1), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, p_pad, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(neigh_packed, point_range[..., None], inv_gauss)
    return out[:, :p, 0]
