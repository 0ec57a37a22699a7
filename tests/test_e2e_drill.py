"""Synthetic end-to-end parity drill (VERDICT round-1 item #7).

Closes the last untested seam — converter -> evaluate CLI -> KNN ->
confusion — by running BOTH frameworks over the same on-disk synthetic
KITTI-format scans with the same (converted) weights:

  reference side: torch SalsaNextProto composed exactly as
    trainer.py:706-747 evaluates it (RangeProjection, eval-mask-gated
    normalization, softmax argmax, per-point unprojection, postproc KNN,
    IOUEval confusion), all with the reference's own read-only modules;
  our side: tools/convert_torch_ckpt.convert_state_dict -> msgpack ->
    tools/evaluate.main(--config ... --knn) over the real KITTI catalog.

The per-point predictions must agree except at floating-point pixel-
assignment ties (numpy vs XLA norm differ by ~1 ulp — see
tests/README.md), so the assertion is an agreement ratio + mIoU delta.

Runs at reduced width (64x512) to keep the CPU jit of the full SalsaNext
affordable; the seam under test is shape-independent.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference not mounted")

H, W, C = 64, 512, 20
N_SCANS, N_PTS = 3, 30000


@pytest.fixture(scope="module")
def torch_ref():
    from tests._ref_stub import install_reference

    install_reference()
    import torch

    torch.manual_seed(0)
    return torch


def _write_kitti_val_tree(root, scans, specs):
    """Write scans as sequences/08/{velodyne,labels} in raw KITTI format."""
    seq = os.path.join(root, "08")
    os.makedirs(os.path.join(seq, "velodyne"))
    os.makedirs(os.path.join(seq, "labels"))
    for i, scan in enumerate(scans):
        scan["points"].astype(np.float32).tofile(
            os.path.join(seq, "velodyne", f"{i:06d}.bin"))
        raw = specs.unmap_labels(scan["labels"]).astype(np.uint32)
        raw.tofile(os.path.join(seq, "labels", f"{i:06d}.label"))


def _reference_eval(torch, scans, ref_model, sensor, use_knn):
    """Evaluate with the reference's own modules, per trainer.py:706-747."""
    import torch.nn.functional as F

    from pc_processor.dataset.preprocess.projection import RangeProjection
    from pc_processor.metrics.iou_eval import IOUEval
    from pc_processor.postproc.knn import KNN

    projection = RangeProjection(
        fov_up=sensor.fov_up, fov_down=sensor.fov_down, proj_w=W, proj_h=H)
    knn = KNN({"knn": 5, "search": 5, "sigma": 1.0, "cutoff": 1.0}, C)
    evaluator = IOUEval(n_classes=C, ignore=[0])
    mean = torch.tensor(sensor.img_mean).view(5, 1, 1)
    std = torch.tensor(sensor.img_stds).view(5, 1, 1)

    all_preds = []
    for scan in scans:
        pcd, labels = scan["points"], scan["labels"]
        proj_pcd, proj_range, proj_idx, _ = projection.doProjection(pcd)
        eval_label = np.zeros((H, W), np.float32)
        eval_label[proj_idx > -1] = labels[proj_idx[proj_idx > -1]]

        proj_range_t = torch.from_numpy(proj_range)
        intensity = torch.from_numpy(proj_pcd[..., 3])
        intensity = intensity.ne(-1).float() * intensity
        feat = torch.cat([
            proj_range_t.unsqueeze(0),
            torch.from_numpy(proj_pcd[..., :3]).permute(2, 0, 1),
            intensity.unsqueeze(0)], 0)
        eval_mask = torch.from_numpy(eval_label).gt(0)
        feat = (feat - mean) / std * eval_mask.unsqueeze(0)

        with torch.no_grad():
            # compose the reference's public submodules in the documented
            # order (the shipped forward has the debug-block defect,
            # SURVEY 5.1 #1) — same recipe as test_torch_parity.py
            x = feat.unsqueeze(0)
            m = ref_model
            c = m.downCntx3(m.downCntx2(m.downCntx(x)))
            d0c, d0b = m.resBlock1(c)
            d1c, d1b = m.resBlock2(d0c)
            d2c, d2b = m.resBlock3(d1c)
            d3c, d3b = m.resBlock4(d2c)
            d5c = m.resBlock5(d3c)
            u4 = m.upBlock1(d5c, d3b)
            u3 = m.upBlock2(u4, d2b)
            u2 = m.upBlock3(u3, d1b)
            u1 = m.upBlock4(u2, d0b)
            pred_2d = F.softmax(m.cls_head(u1), dim=1)
            argmax_2d = pred_2d[0].argmax(dim=0)

            px = torch.from_numpy(
                projection.cached_data["uproj_x_idx"]).long()
            py = torch.from_numpy(
                projection.cached_data["uproj_y_idx"]).long()
            if use_knn:
                unproj_range = torch.from_numpy(
                    projection.cached_data["uproj_depth"])
                unproj = knn(proj_range_t, unproj_range, argmax_2d, px, py)
            else:
                unproj = argmax_2d[py, px]
        evaluator.addBatch(unproj, torch.from_numpy(labels).long())
        all_preds.append(unproj.numpy())
    mean_iou, _ = evaluator.getIoU()
    return float(mean_iou), all_preds


def test_converter_evaluate_knn_confusion_seam(torch_ref, tmp_path, rng):
    torch = torch_ref
    import flax.serialization
    import jax

    from coarse3d_tpu.configs import preset
    from coarse3d_tpu.data.label_maps import get_label_spec
    from coarse3d_tpu.data.synthetic import synthetic_scan
    from coarse3d_tpu.tools.convert_torch_ckpt import convert_state_dict
    from coarse3d_tpu.tools.evaluate import main as evaluate_main
    from pc_processor.models.salsanext_proto import SalsaNextProto

    cfg0 = preset("kitti")
    sensor = cfg0.sensor
    spec = get_label_spec("semantic_kitti")

    scans = [synthetic_scan(rng, N_PTS, C, sensor) for _ in range(N_SCANS)]
    root = str(tmp_path / "pcd")
    _write_kitti_val_tree(root, scans, spec)

    # one randomly-initialized reference model drives both sides
    ref = SalsaNextProto(nclasses=C)
    ref.eval()
    for mod in ref.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)

    converted = convert_state_dict(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()},
        "salsanext")
    assert "missing" not in converted
    weights = str(tmp_path / "converted.msgpack")
    with open(weights, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(
            jax.tree.map(np.asarray, converted)))

    config_yaml = str(tmp_path / "drill.yaml")
    with open(config_yaml, "w") as f:
        yaml = {
            "preset": "semantic_kitti",
            "data": {"pcd_root": root, "max_points": 32768},
            "sensor": {"proj_w": W},
            "model": {"compute_dtype": "float32"},
        }
        f.write(json.dumps(yaml))  # json is valid yaml

    ref_miou, ref_preds = _reference_eval(torch, scans, ref, sensor,
                                          use_knn=True)

    ours = evaluate_main([
        "--config", config_yaml, "--weights", weights, "--knn",
        "--batch_size", "1", "--num_workers", "1",
        "--save_preds", str(tmp_path / "preds")])

    # per-point prediction agreement (modulo ~1-ulp pixel-assignment ties)
    agree, total = 0, 0
    for i, scan in enumerate(scans):
        from coarse3d_tpu.eval.submission import read_submission

        # submission tree (sequences/08/predictions/FFFFFF.label, uint32
        # raw ids), read back as train ids
        pred = read_submission(str(tmp_path / "preds"), "semantic_kitti",
                               "08", f"{i:06d}", label_spec=spec)
        assert pred.shape == ref_preds[i].shape
        agree += (pred == ref_preds[i]).sum()
        total += pred.size
    agreement = agree / total
    assert agreement > 0.995, f"per-point agreement {agreement:.4f}"
    assert abs(ours["mIoU_3D"] - ref_miou) < 0.01, (ours["mIoU_3D"], ref_miou)
