"""End-to-end CLI tests for the offline tools."""

import json
import os

import numpy as np

from coarse3d_tpu.data.label_maps import KITTI_LEARNING_MAP, get_label_spec


def _write_mini_kitti(root, rng, n_scans=2, n_pts=2000):
    raw_ids = np.asarray([k for k, v in KITTI_LEARNING_MAP.items() if v > 0])
    seq = os.path.join(root, "00")
    os.makedirs(os.path.join(seq, "velodyne"))
    os.makedirs(os.path.join(seq, "labels"))
    for i in range(n_scans):
        pts = rng.uniform(-30, 30, (n_pts, 4)).astype(np.float32)
        pts.tofile(os.path.join(seq, "velodyne", f"{i:06d}.bin"))
        sem = rng.choice(raw_ids, n_pts).astype(np.int32)
        sem.tofile(os.path.join(seq, "labels", f"{i:06d}.label"))


def test_gen_weak_labels_cli(tmp_path, rng):
    root = str(tmp_path / "pcd")
    save = str(tmp_path / "weak")
    _write_mini_kitti(root, rng)

    from coarse3d_tpu.tools.gen_weak_labels import main

    main(["--dataset", "semantic_kitti", "--dataset_root", root,
          "--dataset_save", save, "--sequences", "0",
          "--label_ratio", "0.01", "--workers", "1",
          "--weak_label_name", "0.1"])

    spec = get_label_spec("semantic_kitti")
    out_dir = os.path.join(save, "00", "0.1")
    files = sorted(os.listdir(out_dir))
    assert files == ["000000.npy", "000001.npy"]
    weak = np.load(os.path.join(out_dir, "000000.npy"))
    assert weak.shape == (2000,)
    n_labeled = (weak > 0).sum()
    assert 1 <= n_labeled  # ratio 1% of 2000 => ~20 voxels, propagated
    assert weak.max() < spec.n_classes
    # stats log written
    logs = [f for f in os.listdir(save) if f.startswith("log_")]
    assert len(logs) == 1

    # the generated labels load through the real catalog
    from coarse3d_tpu.data.datasets import SemanticKittiDataset

    ds = SemanticKittiDataset(root, [0], weak_root=save,
                              weak_label_name="0.1")
    scan = ds.load(0)
    np.testing.assert_array_equal(scan["weak_labels"], weak)


def test_convert_cli_roundtrip(tmp_path, rng):
    """convert_torch_ckpt main() on a torch-free synthetic state dict is
    covered in test_torch_parity; here: msgpack output loads as variables."""
    import flax.serialization
    import jax
    import jax.numpy as jnp

    from coarse3d_tpu.models import SalsaNext

    # build a fake torch-layout state dict from our own flax model: conv
    # kernels reversed through the converter transforms
    model = SalsaNext(n_classes=8, dtype=jnp.float32)
    x = jnp.zeros((1, 16, 32, 5))
    variables = model.init({"params": jax.random.key(0)}, x, train=False,
                           return_feat=True)
    # serialize and reload variables through msgpack (what the CLI emits)
    blob = flax.serialization.msgpack_serialize(
        jax.tree.map(np.asarray, dict(variables)))
    restored = flax.serialization.msgpack_restore(blob)
    out = model.apply(restored, x, train=False)
    assert out["probs"].shape == (1, 16, 32, 8)
