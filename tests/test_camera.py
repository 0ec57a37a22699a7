"""Lidar->camera projection chains (reference's optional image-fusion path)."""

import numpy as np
import pytest

from coarse3d_tpu.data.camera import (
    kitti_lidar_to_camera,
    kitti_proj_matrix,
    nuscenes_lidar_to_camera,
    quaternion_rotation_matrix,
    read_kitti_calib,
    view_points,
)


def _write_calib(path):
    # simple pinhole (fx=fy=700, cx=600, cy=180) + a lidar->cam rigid
    p2 = np.array([[700.0, 0, 600, 0], [0, 700, 180, 0], [0, 0, 1, 0]])
    tr = np.array([[0, -1, 0, 0.1], [0, 0, -1, -0.05], [1, 0, 0, -0.3]])
    with open(path, "w") as f:
        for key, mat in [("P0", p2), ("P1", p2), ("P2", p2), ("P3", p2),
                         ("Tr", tr)]:
            f.write(f"{key}: " + " ".join(str(v) for v in mat.reshape(-1))
                    + "\n")
    return p2, tr


def test_kitti_calib_and_projection(tmp_path, rng):
    p2, tr = _write_calib(tmp_path / "calib.txt")
    calib = read_kitti_calib(str(tmp_path / "calib.txt"))
    np.testing.assert_allclose(calib["P2"], p2)
    np.testing.assert_allclose(calib["Tr"][:3], tr)
    proj = kitti_proj_matrix(calib)
    np.testing.assert_allclose(proj, p2 @ calib["Tr"])

    pts = rng.uniform(-20, 20, (500, 4)).astype(np.float32)
    pts[0, :3] = [10.0, 0.0, 0.0]   # dead ahead -> near principal point
    pts[1, 0] = -5.0                # behind the vehicle -> dropped
    # reference bound quirk: x compared against img_h, y against img_w
    # (dataset_semkitti.py:299-304) — call with the reference's arg order
    mapped, keep = kitti_lidar_to_camera(proj, pts, img_h=1241, img_w=376)
    assert keep.shape == (500,)
    assert mapped.shape == (int(keep.sum()), 2)
    assert not keep[1]
    assert keep[0]
    # hand-compute point 0 through the same matrices
    h = np.concatenate([pts[0, :3], [1.0]])
    cam = proj @ h
    uv = cam[:2] / cam[2]
    row = np.flatnonzero(keep).tolist().index(0)
    np.testing.assert_allclose(mapped[row], uv[::-1], rtol=1e-5)  # fliplr


def test_quaternion_matches_scipy(rng):
    from scipy.spatial.transform import Rotation

    for _ in range(5):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        ours = quaternion_rotation_matrix(q)          # (w, x, y, z)
        scipys = Rotation.from_quat(
            [q[1], q[2], q[3], q[0]]).as_matrix()     # (x, y, z, w)
        np.testing.assert_allclose(ours, scipys, atol=1e-12)


def test_view_points_normalizes():
    pts = np.array([[1.0, 2.0], [0.5, -1.0], [2.0, 4.0]])
    k = np.array([[100.0, 0, 50], [0, 100, 30], [0, 0, 1]])
    out = view_points(pts, k, normalize=True)
    np.testing.assert_allclose(out[2], 1.0)
    np.testing.assert_allclose(out[0, 0], 100 * 1.0 / 2.0 + 50)


def test_nuscenes_chain_roundtrip(rng):
    """Identity poses collapse the 5-step chain to pure intrinsics; random
    rigid transforms compose to the scipy-verified equivalent."""
    from scipy.spatial.transform import Rotation

    k = np.array([[800.0, 0, 450], [0, 800, 250], [0, 0, 1]])
    ident = {"rotation": (1.0, 0, 0, 0), "translation": (0.0, 0, 0)}
    cam_calib = dict(ident, camera_intrinsic=k)
    pts = rng.uniform(-1, 1, (400, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(3, 40, 400)  # nuScenes camera looks along +z

    mapped, mask = nuscenes_lidar_to_camera(
        pts, ident, ident, ident, cam_calib, img_h=900, img_w=500)
    assert mask.any()
    # identity chain == view_points directly
    direct = view_points(pts[:, :3].astype(np.float64).T, k)
    np.testing.assert_allclose(
        mapped, np.fliplr(direct.T[:, :2])[mask], rtol=1e-9)

    # random rigid chain: our composition == scipy composition
    def rand_rec():
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        return {"rotation": tuple(q), "translation": tuple(rng.normal(size=3))}

    lc, lp, cp, cc = rand_rec(), rand_rec(), rand_rec(), rand_rec()
    cc = dict(cc, camera_intrinsic=k)
    mapped2, mask2 = nuscenes_lidar_to_camera(
        pts, lc, lp, cp, cc, img_h=900, img_w=500, min_dist=0.0)

    def rot(rec):
        q = rec["rotation"]
        return Rotation.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()

    pc = pts[:, :3].astype(np.float64).T
    pc = rot(lc) @ pc + np.asarray(lc["translation"])[:, None]
    pc = rot(lp) @ pc + np.asarray(lp["translation"])[:, None]
    pc = rot(cp).T @ (pc - np.asarray(cp["translation"])[:, None])
    pc = rot(cc).T @ (pc - np.asarray(cc["translation"])[:, None])
    want = np.fliplr(view_points(pc, k).T[:, :2])
    np.testing.assert_allclose(mapped2, want[mask2], rtol=1e-7)
