"""Golden tests for spherical range projection.

The host path is pinned against an independent per-point Python loop
implementing the reference semantics (projection.py:43-115); the device path
is then pinned against the host path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from coarse3d_tpu.configs.config import SensorSpec
from coarse3d_tpu.data.synthetic import pad_points, synthetic_scan
from coarse3d_tpu.ops import projection

SMALL = SensorSpec(proj_h=16, proj_w=64)


def _naive_reference(points, sensor):
    """Literal per-point transcription of the reference formulas."""
    depth = np.linalg.norm(points[:, :3], axis=1)
    fov_up = np.radians(sensor.fov_up)
    fov_down = np.radians(sensor.fov_down)
    fov_vert = abs(fov_up) + abs(fov_down)
    h, w = sensor.proj_h, sensor.proj_w

    proj_range = np.full((h, w), -1.0, np.float32)
    proj_idx = np.full((h, w), -1, np.int64)
    pxs, pys = [], []
    for i in range(len(points)):
        x, y, z = points[i, :3]
        yaw = -np.arctan2(y, x)
        pitch = np.arcsin(z / depth[i])
        px = int(np.clip(np.floor((yaw + np.pi) / (2 * np.pi) * w), 0, w - 1))
        py = int(np.clip(
            np.floor((1.0 - (pitch + abs(fov_down)) / fov_vert) * h), 0, h - 1))
        pxs.append(px)
        pys.append(py)
        # nearest point wins
        if proj_idx[py, px] == -1 or depth[i] < proj_range[py, px]:
            proj_range[py, px] = depth[i]
            proj_idx[py, px] = i
    return proj_range, proj_idx, np.array(pxs), np.array(pys), depth


def test_host_projection_matches_naive(rng):
    scan = synthetic_scan(rng, 4000, 20, SMALL)
    out = projection.range_project_np(scan["points"], SMALL)
    ref_range, ref_idx, ref_px, ref_py, ref_depth = _naive_reference(
        scan["points"], SMALL)

    np.testing.assert_array_equal(out["px"], ref_px)
    np.testing.assert_array_equal(out["py"], ref_py)
    np.testing.assert_allclose(out["depth"], ref_depth, rtol=1e-6)
    np.testing.assert_allclose(out["proj_range"], ref_range, rtol=1e-6)
    # Index maps agree wherever depths are distinct (ties are unordered in
    # the reference's quicksort).
    hit = ref_idx >= 0
    np.testing.assert_array_equal(out["proj_idx"] >= 0, hit)
    agree = out["proj_idx"][hit] == ref_idx[hit]
    assert agree.mean() > 0.999


def test_device_projection_matches_host(rng):
    scan = synthetic_scan(rng, 4000, 20, SMALL)
    host = projection.range_project_np(
        scan["points"], SMALL, mask_excludes_point0=False)

    padded, valid = pad_points(scan["points"], 5000, fill=-1.0)
    dev = projection.range_project(jnp.asarray(padded), jnp.asarray(valid), SMALL)

    np.testing.assert_array_equal(np.asarray(dev["px"])[:4000], host["px"])
    np.testing.assert_array_equal(np.asarray(dev["py"])[:4000], host["py"])
    np.testing.assert_allclose(
        np.asarray(dev["proj_range"]), host["proj_range"], rtol=1e-5, atol=1e-5)
    # Both paths break exact ties by lowest point index, but NumPy and XLA
    # may round ||xyz|| differently by 1 ulp, flipping winners between
    # near-tie points — so require near-total (not bitwise) agreement.
    idx_agree = (np.asarray(dev["proj_idx"]) == host["proj_idx"]).mean()
    assert idx_agree > 0.999, idx_agree


def test_padding_dropped(rng):
    scan = synthetic_scan(rng, 100, 20, SMALL)
    padded, valid = pad_points(scan["points"], 256, fill=0.0)
    dev = projection.range_project(jnp.asarray(padded), jnp.asarray(valid), SMALL)
    assert int(np.asarray(dev["proj_idx"]).max()) < 100
    # every hit pixel indexes a real point
    hits = np.asarray(dev["proj_idx"])
    assert ((hits == -1) | (hits < 100)).all()


def test_mask_bug_parity(rng):
    scan = synthetic_scan(rng, 500, 20, SMALL)
    out_bug = projection.range_project_np(
        scan["points"], SMALL, mask_excludes_point0=True)
    out_fix = projection.range_project_np(
        scan["points"], SMALL, mask_excludes_point0=False)
    # the buggy mask drops exactly the pixel owned by point 0 (if any)
    diff = out_fix["proj_mask"].sum() - out_bug["proj_mask"].sum()
    owns = (out_fix["proj_idx"] == 0).sum()
    assert diff == owns


def test_label_scatter_roundtrip(rng):
    scan = synthetic_scan(rng, 2000, 20, SMALL)
    host = projection.range_project_np(scan["points"], SMALL)
    img = projection.scatter_labels_np(host["proj_idx"], scan["labels"])
    hit = host["proj_idx"] >= 0
    np.testing.assert_array_equal(
        img[hit], scan["labels"][host["proj_idx"][hit]])
    assert (img[~hit] == 0).all()

    dev = projection.scatter_labels(
        jnp.asarray(host["proj_idx"]), jnp.asarray(scan["labels"]))
    np.testing.assert_array_equal(np.asarray(dev), img)


def test_max_depth_clamp(rng):
    sensor = SensorSpec(proj_h=16, proj_w=64, max_depth=10.0)
    scan = synthetic_scan(rng, 1000, 20, sensor)
    out = projection.range_project_np(scan["points"], sensor)
    assert out["depth"].max() <= 10.0


def test_features_shape_and_intensity_mask(rng):
    scan = synthetic_scan(rng, 2000, 20, SMALL)
    host = projection.range_project_np(scan["points"], SMALL)
    feats = projection.build_range_features(
        host["proj_points"], host["proj_range"], xp=np)
    assert feats.shape == (SMALL.proj_h, SMALL.proj_w, 5)
    empty = host["proj_idx"] < 0
    # empty pixels: range/xyz keep the -1 fill, intensity masked to 0
    assert (feats[empty][:, 0] == -1).all()
    assert (feats[empty][:, 4] == 0).all()


def test_normalize_features(rng):
    scan = synthetic_scan(rng, 2000, 20, SMALL)
    host = projection.range_project_np(scan["points"], SMALL)
    feats = projection.build_range_features(
        host["proj_points"], host["proj_range"], xp=np)
    mask = (host["proj_idx"] >= 0)
    normed = projection.normalize_features(
        jnp.asarray(feats), jnp.asarray(mask), SMALL)
    normed = np.asarray(normed)
    assert (normed[~mask] == 0).all()
    expect = (feats[mask] - np.array(SMALL.img_mean)) / np.array(SMALL.img_stds)
    np.testing.assert_allclose(normed[mask], expect, rtol=1e-5, atol=1e-5)


def test_range_project_batch_matches_vmapped(rng):
    """range_project_batch (flat-index formulation, the inference path) must
    equal jax.vmap(range_project) exactly on every output."""
    import functools

    import jax

    from coarse3d_tpu.configs import preset
    from coarse3d_tpu.data.synthetic import pad_points, synthetic_scan
    from coarse3d_tpu.ops.projection import range_project, range_project_batch

    cfg = preset("tiny")
    pts, msk = [], []
    for _ in range(3):
        scan = synthetic_scan(rng, 700, cfg.data.n_classes, cfg.sensor)
        p, v = pad_points(scan["points"], 1024, fill=0.0)
        pts.append(p)
        msk.append(v)
    points = jnp.asarray(np.stack(pts))
    valid = jnp.asarray(np.stack(msk))

    ref = jax.vmap(functools.partial(
        range_project, sensor=cfg.sensor))(points, valid)
    got = range_project_batch(points, valid, sensor=cfg.sensor)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(ref[k]), err_msg=k)
