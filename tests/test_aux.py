"""Tests for auxiliary subsystems: CRF, border mask, visualizer, schedules,
tensor ops, top-k accuracy, nuScenes manifest builder, classification head."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from coarse3d_tpu.metrics.acc_eval import ClassifierAverageMeter, topk_accuracy
from coarse3d_tpu.postproc import border_mask, crf_refine
from coarse3d_tpu.postproc.crf import init_compat_kernel
from coarse3d_tpu.train.schedule import (
    clipped_schedule,
    poly_schedule,
    warmup_cosine_schedule,
    warmup_exp_schedule,
    warmup_multistep_schedule,
)
from coarse3d_tpu.utils.tensor_ops import masked_mean_entropy, minmax_normalize
from coarse3d_tpu.visualizer import colorize_labels, composite_panel, save_ply


# ---------------------------------------------------------------------------
# CRF
# ---------------------------------------------------------------------------

def test_crf_shapes_and_renorm(rng):
    b, h, w, c = 1, 8, 16, 5
    xyz = jnp.asarray(rng.normal(size=(b, h, w, 3)), jnp.float32)
    probs = jax.nn.softmax(jnp.asarray(rng.normal(size=(b, h, w, c))), -1)
    mask = jnp.ones((b, h, w), bool)
    kern = init_compat_kernel(c, 0.1)
    out = crf_refine(xyz, probs, mask, kern, iterations=2)
    assert out.shape == probs.shape
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)


def test_crf_smooths_neighbors():
    """A flipped pixel inside a spatially-uniform region gets pulled toward
    its neighbors' class."""
    b, h, w, c = 1, 8, 8, 3
    xyz = jnp.zeros((b, h, w, 3))  # all points co-located -> strong coupling
    probs = np.full((b, h, w, c), 0.05, np.float32)
    probs[..., 1] = 0.9
    probs[0, 4, 4] = [0.9, 0.05, 0.05]  # outlier pixel says class 0
    probs /= probs.sum(-1, keepdims=True)
    kern = init_compat_kernel(c, -0.5)  # negative coupling = attractive
    out = np.asarray(crf_refine(
        jnp.asarray(xyz), jnp.asarray(probs), jnp.ones((b, h, w), bool),
        kern, iterations=3))
    assert out[0, 4, 4].argmax() == 1


# ---------------------------------------------------------------------------
# border mask
# ---------------------------------------------------------------------------

def test_border_mask_finds_boundaries():
    labels = np.zeros((1, 8, 8), np.int32)
    labels[0, :, 4:] = 2
    labels[0, :, :4] = 1
    mask = np.asarray(border_mask(jnp.asarray(labels), n_classes=3))
    # boundary between cols 3 and 4
    assert mask[0, :, 3].all() and mask[0, :, 4].all()
    assert not mask[0, :, 1].any() and not mask[0, :, 6].any()


def test_border_mask_grows_with_size():
    labels = np.zeros((1, 16, 16), np.int32)
    labels[0, :, 8:] = 1
    m1 = np.asarray(border_mask(jnp.asarray(labels), 2, border_size=1))
    m3 = np.asarray(border_mask(jnp.asarray(labels), 2, border_size=3))
    assert m3.sum() > m1.sum()


# ---------------------------------------------------------------------------
# visualizer
# ---------------------------------------------------------------------------

def test_save_ply_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    colors = rng.random((100, 3)).astype(np.float32)
    path = str(tmp_path / "cloud.ply")
    save_ply(path, xyz, colors)
    raw = open(path, "rb").read()
    header, blob = raw.split(b"end_header\n", 1)
    assert b"element vertex 100" in header
    rec = np.frombuffer(blob, dtype=[("xyz", np.float32, 3),
                                     ("rgb", np.uint8, 3)])
    np.testing.assert_allclose(rec["xyz"], xyz, rtol=1e-6)

    path2 = str(tmp_path / "ascii.ply")
    save_ply(path2, xyz[:5], binary=False)
    lines = open(path2).read().strip().split("\n")
    assert len(lines) == 5 + lines.index("end_header") + 1


def test_composite_panel(rng):
    from coarse3d_tpu.data.label_maps import get_label_spec

    spec = get_label_spec("semantic_kitti")
    h, w = 16, 32
    argmax = rng.integers(0, 20, (h, w))
    full = rng.integers(0, 20, (h, w))
    weak = np.where(rng.random((h, w)) < 0.01, full, 0)
    panel = composite_panel(argmax, full, weak, spec)
    assert panel.shape == (4 * h, w, 3)
    assert panel.min() >= 0 and panel.max() <= 1
    colors = colorize_labels(argmax, spec)
    np.testing.assert_allclose(panel[h:2 * h], colors)


# ---------------------------------------------------------------------------
# schedules / utils / metrics
# ---------------------------------------------------------------------------

def test_schedules():
    s = warmup_cosine_schedule(0.01, 10, 110)
    assert float(s(0)) < 1e-8
    assert abs(float(s(10)) - 0.01) < 1e-6
    assert float(s(110)) < 1e-4

    e = warmup_exp_schedule(0.01, 5, 0.99)
    assert abs(float(e(5)) - 0.01) < 1e-6
    assert float(e(50)) < 0.01

    m = warmup_multistep_schedule(0.01, 5, (20, 40), gamma=0.1)
    assert abs(float(m(10)) - 0.01) < 1e-7
    assert abs(float(m(30)) - 0.001) < 1e-7
    assert abs(float(m(50)) - 0.0001) < 1e-8

    pl = poly_schedule(0.01, 100)
    assert abs(float(pl(0)) - 0.01) < 1e-7
    assert abs(float(pl(100))) < 1e-8

    c = clipped_schedule(pl, 0.002)
    assert abs(float(c(100)) - 0.002) < 1e-6


def test_tensor_ops(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8)), jnp.float32)
    n = minmax_normalize(x)
    assert abs(float(n.max()) - 1.0) < 1e-6
    assert abs(float(n.min())) < 1e-6

    probs = jnp.full((4, 4, 5), 0.2)
    mask = jnp.ones((4, 4), bool)
    ent = masked_mean_entropy(probs, mask)
    np.testing.assert_allclose(float(ent), np.log(5), rtol=1e-5)


def test_topk_accuracy(rng):
    logits = jnp.asarray(rng.normal(size=(50, 10)), jnp.float32)
    target = jnp.argmax(logits, -1)
    top1, top5 = topk_accuracy(logits, target, (1, 5))
    assert float(top1) == 1.0 and float(top5) == 1.0
    wrong = (target + 1) % 10
    top1w = topk_accuracy(logits, wrong, (1,))[0]
    assert float(top1w) == 0.0

    meter = ClassifierAverageMeter()
    meter.update({"acc": 1.0}, n=2)
    meter.update({"acc": 0.0}, n=2)
    assert meter.averages()["acc"] == 0.5


# ---------------------------------------------------------------------------
# nuScenes manifest builder
# ---------------------------------------------------------------------------

def test_manifest_builder(tmp_path):
    version = "v1.0-mini"
    tdir = tmp_path / version
    tdir.mkdir()
    scenes = [{"token": f"sc{i}", "name": f"scene-{i:04d}"} for i in range(3)]
    samples = [{"token": f"sm{i}", "scene_token": f"sc{i % 3}"}
               for i in range(6)]
    sample_data = []
    for i in range(6):
        sample_data.append({
            "token": f"sd{i}", "sample_token": f"sm{i}",
            "is_key_frame": True,
            "filename": f"samples/LIDAR_TOP/frame{i}.pcd.bin"})
        sample_data.append({  # sweeps must be skipped
            "token": f"sw{i}", "sample_token": f"sm{i}",
            "is_key_frame": False,
            "filename": f"sweeps/LIDAR_TOP/sweep{i}.pcd.bin"})
    lidarseg = [{"sample_data_token": f"sd{i}",
                 "filename": f"lidarseg/{version}/sd{i}_lidarseg.bin"}
                for i in range(6)]
    for name, data in [("scene", scenes), ("sample", samples),
                       ("sample_data", sample_data), ("lidarseg", lidarseg)]:
        (tdir / f"{name}.json").write_text(json.dumps(data))
    val_file = tmp_path / "val.txt"
    val_file.write_text("scene-0002\n")

    from coarse3d_tpu.tools.build_nuscenes_manifest import main

    out = tmp_path / "out"
    main(["--dataroot", str(tmp_path), "--version", version,
          "--out_dir", str(out), "--val_scenes", str(val_file),
          "--weak_name", "weak_0.1"])
    train = [json.loads(line) for line in
             open(out / "manifest_train.jsonl")]
    val = [json.loads(line) for line in open(out / "manifest_val.jsonl")]
    assert len(train) == 4 and len(val) == 2
    assert all("LIDAR_TOP" in r["lidar"] for r in train + val)
    assert train[0]["weak"].startswith("weak_0.1/")
    assert train[0]["weak"].endswith(".npy")


def test_salsanext_classification_mode(rng):
    from coarse3d_tpu.models import SalsaNext

    model = SalsaNext(n_classes=8, classification=True, dtype=jnp.float32)
    x = jnp.zeros((2, 16, 32, 5))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["class_logits"].shape == (2, 1000)
