"""Native (C++) preprocessing parity vs the NumPy reference implementations."""

import numpy as np
import pytest

from coarse3d_tpu import native
from coarse3d_tpu.configs.config import SensorSpec
from coarse3d_tpu.data.synthetic import synthetic_scan
from coarse3d_tpu.ops import projection
from coarse3d_tpu.tools.gen_weak_labels import voxelize

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no g++ / native build failed")

SMALL = SensorSpec(proj_h=16, proj_w=64)


def test_native_projection_matches_numpy(rng):
    scan = synthetic_scan(rng, 8000, 20, SMALL)
    want = projection.range_project_np(scan["points"], SMALL)
    got = native.range_project_native(scan["points"], SMALL)
    np.testing.assert_array_equal(got["px"], want["px"])
    np.testing.assert_array_equal(got["py"], want["py"])
    np.testing.assert_allclose(got["depth"], want["depth"], rtol=1e-6)
    np.testing.assert_allclose(got["proj_range"], want["proj_range"],
                               rtol=1e-5, atol=1e-5)
    # fp near-ties may flip winners (double vs float32 norm); wherever the
    # winner differs the two candidate depths must be nearly equal
    agree = got["proj_idx"] == want["proj_idx"]
    assert agree.mean() > 0.99, agree.mean()
    flipped = ~agree
    np.testing.assert_allclose(
        got["proj_range"][flipped], want["proj_range"][flipped], atol=1e-3)
    assert (got["proj_mask"] == want["proj_mask"]).mean() > 0.99


def test_native_label_scatter(rng):
    scan = synthetic_scan(rng, 3000, 20, SMALL)
    proj = native.range_project_native(scan["points"], SMALL)
    got = native.scatter_labels_native(proj["proj_idx"], scan["labels"])
    want = projection.scatter_labels_np(proj["proj_idx"], scan["labels"])
    np.testing.assert_array_equal(got, want)


def test_native_depth_override_prefers_weak(rng):
    scan = synthetic_scan(rng, 2000, 8, SMALL, weak_ratio=0.01)
    weak = scan["weak_labels"]
    override = np.linalg.norm(scan["points"][:, :3], axis=1)
    override[weak < 1] = 10000.0
    proj = native.range_project_native(scan["points"], SMALL,
                                       depth_override=override)
    img = native.scatter_labels_native(proj["proj_idx"], weak)
    # every weak point must win its own pixel
    weak_idx = np.flatnonzero(weak)
    covered = (img[proj["py"][weak_idx], proj["px"][weak_idx]] > 0)
    assert covered.all()
    # stored range is still the true depth, not the override
    assert proj["proj_range"].max() < 200


def test_native_voxelize_matches_numpy(rng):
    """Both paths use first-appearance voxel ids and must agree BYTE-FOR-
    BYTE, so fixed-seed weak-label generation is reproducible whether or
    not the native extension compiled."""
    xyz = rng.uniform(0, 30, (5000, 3)).astype(np.float32)
    p2v_native, first_native = native.voxelize_native(xyz, 0.06)
    _, p2v_np, first_np = voxelize(xyz, 0.06)
    np.testing.assert_array_equal(p2v_native, p2v_np)
    np.testing.assert_array_equal(first_native, first_np)
    # each voxel's first point is the lowest point index in the voxel
    for v in range(min(50, len(first_native))):
        members = np.flatnonzero(p2v_native == v)
        assert first_native[v] == members.min()


def test_native_speedup(rng):
    """The native path should beat NumPy on a realistic scan."""
    import time

    scan = synthetic_scan(rng, 120000, 20, SensorSpec())
    t0 = time.perf_counter()
    for _ in range(3):
        projection.range_project_np(scan["points"], SensorSpec())
    t_np = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        native.range_project_native(scan["points"], SensorSpec())
    t_native = time.perf_counter() - t0
    assert t_native < t_np, (t_native, t_np)
