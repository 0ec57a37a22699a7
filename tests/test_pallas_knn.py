"""Pallas fused KNN vote kernel vs the jnp reference path (interpret mode on
CPU; the real kernel runs in bench.py on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

import coarse3d_tpu.ops.pallas.knn_vote as kv
from coarse3d_tpu.ops.knn import knn_postprocess


def _setup(rng, b=2, p=3000, h=16, w=64, c=8):
    proj_range = rng.uniform(1, 80, (b, h, w)).astype(np.float32)
    proj_range[rng.random((b, h, w)) < 0.3] = -1.0
    proj_argmax = rng.integers(0, c, (b, h, w)).astype(np.int32)
    px = rng.integers(0, w, (b, p)).astype(np.int32)
    py = rng.integers(0, h, (b, p)).astype(np.int32)
    prange = rng.uniform(1, 80, (b, p)).astype(np.float32)
    return proj_range, prange, proj_argmax, px, py, c


def test_pallas_knn_matches_jnp(rng, monkeypatch):
    # force small tiles so the interpret-mode test pads and tiles
    monkeypatch.setattr(kv, "TILE", 512)
    proj_range, prange, proj_argmax, px, py, c = _setup(rng)

    want = np.asarray(knn_postprocess(
        jnp.asarray(proj_range), jnp.asarray(prange),
        jnp.asarray(proj_argmax), jnp.asarray(px), jnp.asarray(py),
        n_classes=c, use_pallas=False))

    # run the pallas path in interpret mode by calling the kernel directly
    # on the same pre-gathered windows the jnp path builds
    from coarse3d_tpu.ops import knn as knn_mod

    b, h, w = proj_range.shape
    pad = 2
    rng_img = np.where(proj_range < 0, np.float32(3.0e38), proj_range)
    packed = np.asarray(knn_mod._pack(
        jnp.asarray(rng_img), jnp.asarray(proj_argmax)))
    padded = np.pad(packed, ((0, 0), (pad, pad), (pad, pad)))
    views = [padded[:, dy:dy + h, dx:dx + w]
             for dy in range(5) for dx in range(5)]
    windows = np.stack(views, -1).reshape(b, h * w, 25)
    flat = (py.astype(np.int64) * w + px)
    neigh = np.take_along_axis(windows, flat[..., None], axis=1)

    got = np.asarray(kv.knn_vote_pallas(
        jnp.asarray(neigh), jnp.asarray(prange),
        n_classes=c, knn=5, search=5, sigma=1.0, cutoff=1.0,
        interpret=True))

    agree = (got == want).mean()
    assert agree > 0.999, agree


def test_pallas_knn_pad_region_harmless(rng, monkeypatch):
    monkeypatch.setattr(kv, "TILE", 512)
    # P = 700 forces padding to 1024; result shape must be exactly (B, 700)
    neigh = jnp.asarray(rng.uniform(1, 80, (1, 700, 25)), jnp.float32)
    prange = jnp.asarray(rng.uniform(1, 80, (1, 700)), jnp.float32)
    out = kv.knn_vote_pallas(
        neigh, prange, n_classes=8, knn=5, search=5, sigma=1.0, cutoff=1.0,
        interpret=True)
    assert out.shape == (1, 700)
    assert int(out.min()) >= 1 and int(out.max()) <= 7
