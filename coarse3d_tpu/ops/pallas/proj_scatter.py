"""Pallas TPU kernel: single-pass projection scatter-min (north-star #1).

The device range projection (ops/projection.py:range_project_batch) is three
XLA point-rate passes — scatter-min depth, equality-gather + scatter-min
winner id, winner-row gather — measured 45.2 ms at B=8 / 150k pts (r4, real
chip). This kernel fuses the two scatter passes into ONE pass over the point
stream: per-pixel (min-depth, winner-id) accumulators live in VMEM and each
point performs one compare-and-masked-tile-store against them, i.e. the
lexicographic min over (depth, point_id) that the two XLA passes compute —
with no int64 packing (the objection that killed the packed single-XLA-pass
variant) and no equality-gather middle pass.

Reference behavior: preprocess/projection.py:43-115 (sort by depth
descending, last writer wins == nearest point wins; ties unspecified there,
lowest point index here — identical to the XLA path).

Mosaic constraints shaped the design; each earlier variant failed to lower
on the real chip (r4 probe ladder, PERF.md "north-star kernels"):
  - no scalar VMEM stores -> the per-point update is a masked (8, 128) tile
    read-modify-write with a one-hot (sublane, lane) mask;
  - dynamic VMEM lane loads must be 128-aligned -> the point stream cannot
    be consumed from VMEM blocks;
  - kernel-issued DMA into SMEM scratch crashes the AOT compile helper ->
    the stream is delivered as runtime-pipelined SMEM *input blocks*
    instead, reshaped (B, NC, 8, CHUNK/8) so the trailing block dims pass
    the (8, 128) divisibility rule (scalar dynamic reads are legal in SMEM);
  - dynamic sublane offsets must be provably 8-aligned -> the RMW tile base
    is (pix >> 10) * 8, which the divisibility analysis accepts.

The honest caveat, recorded up front: the per-point loop runs on the Mosaic
scalar core with a VPU tile RMW per point, so the throughput ceiling is
~instructions-per-point x issue rate, not the gather-engine's ~10
ns/descriptor. Measured B=8: 34.2 ms for the fused scatter pair vs ~43 ms
for the two XLA scatter passes (PERF.md has the full table and the
end-to-end projection comparison).
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
SUBLANES = 8
TILE = LANES * SUBLANES     # pixel granularity of one accumulator RMW
CHUNK = 8192                # points per grid step (SMEM block: 2x 32 KB)
_SUB = CHUNK // 1024        # SMEM block sublane dim (8 -> passes block rule)


def _kernel(flat_ref, depth_ref, range_out, idx_out, *, n_points, hw):
    """One (image, point-chunk) grid step. flat/depth blocks are
    (1, 1, 8, CHUNK/8) scalars in SMEM — point j of the chunk lives at
    [j // 1024, j % 1024]. Accumulators are (1, HW/128, 128) f32/i32 VMEM
    blocks, revisited across the chunk dimension (index map ignores it)."""
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        range_out[...] = jnp.full(range_out.shape, _BIG, jnp.float32)
        idx_out[...] = jnp.full(idx_out.shape, n_points, jnp.int32)

    sub = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
    base_id = ci * CHUNK

    def body(j, _):
        pix = flat_ref[0, 0, j >> 10, j & 1023]
        d = depth_ref[0, 0, j >> 10, j & 1023]
        i = base_id + j
        row8 = (pix >> 10) * SUBLANES     # 8-aligned tile base (provable)

        @pl.when(pix < hw)
        def _():
            # Mosaic has no scalar VMEM store: RMW the aligned (8, 128)
            # accumulator tile through a one-hot (sublane, lane) mask.
            cur_d = range_out[0, pl.ds(row8, SUBLANES), :]
            cur_i = idx_out[0, pl.ds(row8, SUBLANES), :]
            hit = (sub == ((pix >> 7) - row8)) & (lane == (pix & (LANES - 1)))
            better = hit & ((d < cur_d) | ((d == cur_d) & (i < cur_i)))
            range_out[0, pl.ds(row8, SUBLANES), :] = jnp.where(
                better, d, cur_d)
            idx_out[0, pl.ds(row8, SUBLANES), :] = jnp.where(
                better, i, cur_i)

        return 0

    # Mosaic's loop lowering supports only unroll=1 or full unroll
    # (r4 sweep: NotImplementedError at unroll=2)
    jax.lax.fori_loop(0, CHUNK, body, 0)


@functools.partial(jax.jit, static_argnames=("hw", "interpret"))
def _scatter_min_pallas(flat: jax.Array, depth: jax.Array, hw: int,
                        interpret: bool = False):
    """(B, P) flat pixel ids + depths -> per-pixel (min depth, winner id).

    flat must carry >= hw on points to drop (padding); hw must be a multiple
    of 1024 (the RMW tile). Returns (B, hw) f32 min-depth (_BIG on empty
    pixels) and (B, hw) int32 winner point index (>= P on empty pixels).
    """
    b, p = flat.shape
    assert hw % TILE == 0, hw
    p_pad = -(-p // CHUNK) * CHUNK
    if p_pad != p:
        # dropped-point sentinel: pix >= hw fails the in-range guard
        flat = jnp.pad(flat, ((0, 0), (0, p_pad - p)), constant_values=hw)
        depth = jnp.pad(depth, ((0, 0), (0, p_pad - p)),
                        constant_values=_BIG)
    nc = p_pad // CHUNK
    flat = flat.reshape(b, nc, _SUB, 1024)
    depth = depth.reshape(b, nc, _SUB, 1024)
    kernel = functools.partial(_kernel, n_points=p_pad, hw=hw)
    range_img, idx_img = pl.pallas_call(
        kernel,
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, 1, _SUB, 1024), lambda i, c: (i, c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, _SUB, 1024), lambda i, c: (i, c, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hw // LANES, LANES), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw // LANES, LANES), lambda i, c: (i, 0, 0),
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
    hw_pad = -(-hw // TILE) * TILE

    xyz = points[..., :3].astype(jnp.float32)
    depth = jnp.linalg.norm(xyz, axis=-1)
    if sensor.max_depth > 0:
        depth = jnp.minimum(depth, sensor.max_depth)
    px, py = pixel_coords(xyz, depth, sensor, xp=jnp)

    flat = jnp.where(valid, py * w + px, hw_pad).astype(jnp.int32)
    min_depth, win_local = _scatter_min_pallas(
        flat, depth.astype(jnp.float32), hw_pad, interpret=interpret)
    min_depth = min_depth[:, :hw]
    win_local = win_local[:, :hw]                       # (B, HW), >=P = empty

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
