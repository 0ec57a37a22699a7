"""nuScenes-path integration: manifest catalog -> pipeline -> train step."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from coarse3d_tpu.configs.config import (
    ContrastConfig,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    SensorSpec,
)
from coarse3d_tpu.data.datasets import NuscenesDataset
from coarse3d_tpu.data.pipeline import DataPipeline
from coarse3d_tpu.train.setup import build_alpha, build_state
from coarse3d_tpu.train.step import make_train_step


def _write_nusc_tree(tmp_path, rng, n_scans=4, n_pts=3000):
    recs = []
    for i in range(n_scans):
        pts = np.zeros((n_pts, 5), np.float32)
        pts[:, :3] = rng.uniform(-40, 40, (n_pts, 3))
        pts[:, 3] = rng.uniform(0, 255, n_pts)
        pts.tofile(tmp_path / f"scan{i}.bin")
        raw = rng.integers(0, 32, n_pts).astype(np.uint8)
        raw.tofile(tmp_path / f"seg{i}.bin")
        weak = np.where(rng.random(n_pts) < 0.02,
                        rng.integers(1, 17, n_pts), 0).astype(np.int32)
        np.save(tmp_path / f"weak{i}.npy", weak)
        recs.append({"lidar": f"scan{i}.bin", "lidarseg": f"seg{i}.bin",
                     "weak": f"weak{i}.npy", "token": f"t{i}"})
    with open(tmp_path / "manifest_train.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")


def test_nuscenes_manifest_to_train_step(tmp_path, rng):
    _write_nusc_tree(tmp_path, rng)
    cfg = ExperimentConfig(
        data=DataConfig(dataset="nuscenes", n_classes=17, max_points=4096,
                        cls_counts=tuple([0.0] + [10.0] * 16)),
        sensor=SensorSpec(proj_h=16, proj_w=64, fov_up=15.0, fov_down=-35.0),
        model=ModelConfig(compute_dtype="float32"),
        contrast=ContrastConfig(num_anchor=16, max_pixels_per_class=64,
                                sub_proto_size=4, proj_dim=32),
    )
    ds = NuscenesDataset(str(tmp_path / "manifest_train.jsonl"),
                         data_root=str(tmp_path))
    assert len(ds) == 4
    pipe = DataPipeline(ds, cfg, batch_size=2, train=True, num_workers=2,
                        process_index=0, process_count=1)
    batch = next(iter(pipe.epoch(0)))
    # min-depth filter dropped some points; all valid labels in range
    assert batch["point_valid"].sum() < 4 * 3000
    assert batch["train_label"].max() < 17

    state = build_state(cfg, jax.random.key(0), steps_per_epoch=2,
                        batch_size=2)
    step = jax.jit(make_train_step(cfg, build_alpha(cfg), with_contrast=True))
    _, metrics = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                      0.25)
    assert np.isfinite(float(metrics["losses"]["total"]))


def test_nuscenes_min_depth_reference_parity(tmp_path, rng):
    """The kept-point set must match the reference expression exactly:
    np.linalg.norm(points[:, :3], 2, axis=1) > 1.0 (dataset_nuscenes.py
    :321-323) — full xyz norm, STRICT inequality. Points stressing both
    failure modes of the old filter are planted: high-|z| points with small
    xy radius, and points exactly on the 1.0 m boundary."""
    n = 500
    pts = np.zeros((n, 5), np.float32)
    pts[:, :3] = rng.uniform(-3, 3, (n, 3))
    # exactly-on-boundary xyz norm (strict > must drop these)
    pts[0, :3] = [1.0, 0.0, 0.0]
    pts[1, :3] = [0.6, 0.0, 0.8]
    # near-field high-z: xy radius 0.1 (< 1) but xyz norm 2.0 (keep)
    pts[2, :3] = [0.1, 0.0, np.sqrt(4.0 - 0.01)]
    pts.tofile(tmp_path / "scan0.bin")
    np.zeros(n, np.uint8).tofile(tmp_path / "seg0.bin")
    np.save(tmp_path / "weak0.npy", np.zeros(n, np.int32))
    with open(tmp_path / "manifest_train.jsonl", "w") as f:
        f.write(json.dumps({"lidar": "scan0.bin", "lidarseg": "seg0.bin",
                            "weak": "weak0.npy", "token": "t0"}) + "\n")
    ds = NuscenesDataset(str(tmp_path / "manifest_train.jsonl"),
                         data_root=str(tmp_path))
    got = ds.load(0)["points"]
    ref_mask = np.linalg.norm(pts[:, :3], 2, axis=1) > 1.0
    np.testing.assert_array_equal(got, pts[ref_mask][:, :4])
    assert not ref_mask[0] and not ref_mask[1] and ref_mask[2]
