"""Pallas TPU kernel: single-pass projection scatter-min (north-star #1).

The device range projection (ops/projection.py:range_project_batch) is three
XLA point-rate passes — scatter-min depth, equality-gather + scatter-min
winner id, winner-row gather — measured 29-36 ms at B=8 (PERF.md "the
point-op wall"). This kernel fuses the first two into ONE pass over the
point stream: per-pixel (min-depth, winner-id) accumulators live in VMEM and
each point performs one compare-and-conditional-store against them, i.e. the
lexicographic min over (depth, point_id) that the two XLA passes compute —
with no int64 packing (the objection that killed the packed single-XLA-pass
variant) and no equality-gather middle pass.

Reference behavior: preprocess/projection.py:43-115 (sort by depth
descending, last writer wins == nearest point wins; ties unspecified there,
lowest point index here — identical to the XLA path).

The honest caveat, recorded up front: per-point dynamic VMEM addressing has
no vector form on the VPU (PERF.md rejected-designs: per-point dynamic
slices lower scalar-sequentially), so this kernel's throughput ceiling is
the Mosaic scalar-core rate, not the gather-engine's ~10 ns/descriptor.
Whether that wins is an empirical question — this file exists to answer it
with a measurement (VERDICT r3 "Missing #2").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coarse3d_tpu.configs.config import SensorSpec
from coarse3d_tpu.ops.projection import _BIG, pixel_coords

LANES = 128


def _kernel(flat_ref, depth_ref, range_out, idx_out, *, n_points, hw):
    """One image: lexicographic (depth, id) scatter-min over the point
    stream. flat/depth blocks are (1, P); accumulators (1, HW/128, 128)."""
    range_out[...] = jnp.full(range_out.shape, _BIG, jnp.float32)
    idx_out[...] = jnp.full(idx_out.shape, n_points, jnp.int32)

    def body(i, _):
        pix = flat_ref[0, i]
        d = depth_ref[0, i]
        row = pix >> 7          # pix // 128
        col = pix & (LANES - 1)  # pix % 128

        @pl.when(pix < hw)
        def _():
            cur_d = range_out[0, row, col]
            cur_i = idx_out[0, row, col]
            better = (d < cur_d) | ((d == cur_d) & (i < cur_i))

            @pl.when(better)
            def _():
                range_out[0, row, col] = d
                idx_out[0, row, col] = i

        return 0

    jax.lax.fori_loop(0, n_points, body, 0)


@functools.partial(jax.jit, static_argnames=("hw", "interpret"))
def _scatter_min_pallas(flat: jax.Array, depth: jax.Array, hw: int,
                        interpret: bool = False):
    """(B, P) flat pixel ids + depths -> per-pixel (min depth, winner id).

    flat must carry >= hw on rows to drop (padding); hw must be a multiple
    of 128. Returns (B, hw) f32 min-depth (_BIG on empty pixels) and
    (B, hw) int32 winner point index (P on empty pixels).
    """
    b, p = flat.shape
    assert hw % LANES == 0, hw
    grid = (b,)
    kernel = functools.partial(_kernel, n_points=p, hw=hw)
    range_img, idx_img = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hw // LANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw // LANES, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hw // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, hw // LANES, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(flat, depth)
    return range_img.reshape(b, hw), idx_img.reshape(b, hw)


@functools.partial(
    jax.jit, static_argnames=("sensor", "mask_excludes_point0", "interpret"))
def range_project_batch_pallas(
    points: jax.Array,
    valid: jax.Array,
    sensor: SensorSpec,
    mask_excludes_point0: bool = False,
    interpret: bool = False,
) -> dict[str, jax.Array]:
    """Drop-in variant of projection.range_project_batch with the two
    scatter passes fused into the Pallas kernel (winner-row gather and the
    elementwise coordinate math stay in XLA — they are not scatter-bound).
    """
    b, p = points.shape[0], points.shape[1]
    h, w = sensor.proj_h, sensor.proj_w
    hw = h * w
    hw_pad = -(-hw // LANES) * LANES

    xyz = points[..., :3].astype(jnp.float32)
    depth = jnp.linalg.norm(xyz, axis=-1)
    if sensor.max_depth > 0:
        depth = jnp.minimum(depth, sensor.max_depth)
    px, py = pixel_coords(xyz, depth, sensor, xp=jnp)

    flat = jnp.where(valid, py * w + px, hw_pad).astype(jnp.int32)
    min_depth, win_local = _scatter_min_pallas(
        flat, depth.astype(jnp.float32), hw_pad, interpret=interpret)
    min_depth = min_depth[:, :hw]
    win_local = win_local[:, :hw]                       # (B, HW), P = empty

    hit = win_local < p
    proj_idx = jnp.where(hit, win_local, -1).reshape(b, h, w)
    proj_range = jnp.where(hit, min_depth, -1.0).reshape(b, h, w)
    base = (jnp.arange(b, dtype=jnp.int32) * p)[:, None]
    rows = jnp.take(points.reshape(b * p, -1),
                    (base + jnp.clip(win_local, 0, p - 1)).reshape(-1),
                    axis=0, mode="clip")
    proj_points = jnp.where(hit.reshape(-1)[:, None], rows, -1.0).reshape(
        b, h, w, points.shape[-1])

    if mask_excludes_point0:
        proj_mask = (proj_idx > 0).astype(jnp.int32)
    else:
        proj_mask = (proj_idx >= 0).astype(jnp.int32)

    return {
        "proj_points": proj_points,
        "proj_range": proj_range,
        "proj_idx": proj_idx,
        "proj_mask": proj_mask,
        "px": px,
        "py": py,
        "depth": depth,
    }
