"""Trainer + checkpoint integration tests on tiny synthetic data."""

import dataclasses

import jax
import numpy as np
import pytest

from coarse3d_tpu.data.pipeline import DataPipeline
from coarse3d_tpu.data.synthetic import SyntheticDataset
from coarse3d_tpu.train.checkpoint import CheckpointManager, load_pretrained_params
from coarse3d_tpu.train.setup import build_state
from coarse3d_tpu.train.trainer import Trainer
from coarse3d_tpu.utils import Recorder
from tests.test_train_step import tiny_config


def _mini_trainer(tmp_path, n_epochs=2, contrast_warmup=99,
                  val_use_knn=False, ddp_parity=False):
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, n_epochs=n_epochs, val_frequency=1,
            val_use_knn=val_use_knn),
        contrast=dataclasses.replace(
            cfg.contrast, contrast_warmup=contrast_warmup,
            ddp_parity_protos=ddp_parity),
        save_path=str(tmp_path / "run"),
    )
    ds = SyntheticDataset(8, 2000, cfg.data.n_classes, cfg.sensor,
                          weak_ratio=0.01)
    val = SyntheticDataset(2, 2000, cfg.data.n_classes, cfg.sensor,
                           weak_ratio=0.01, seed=9)
    train_pipe = DataPipeline(ds, cfg, batch_size=4, train=True,
                              num_workers=2, process_index=0, process_count=1)
    val_pipe = DataPipeline(val, cfg, batch_size=2, train=False,
                            num_workers=2, process_index=0, process_count=1)
    rec = Recorder(cfg.save_path, settings=cfg, use_tensorboard=False)
    from coarse3d_tpu.parallel import make_mesh

    # 2-device mesh: batch sizes (4 train / 2 val) must divide the mesh
    return Trainer(cfg, train_pipe, val_pipe, recorder=rec,
                   mesh=make_mesh(2)), cfg


def test_fit_two_epochs_and_resume(tmp_path):
    trainer, cfg = _mini_trainer(tmp_path)
    trainer.fit()
    assert int(trainer.state.step) == 2 * trainer.steps_per_epoch
    # metrics were written
    metrics = (tmp_path / "run" / "log" / "metrics.jsonl").read_text()
    assert "Validation_mean_IOU_3D" in metrics
    # checkpoints exist; a fresh trainer resumes past both epochs
    trainer.ckpt.close()
    trainer2, _ = _mini_trainer(tmp_path)
    trainer2.maybe_resume()
    assert trainer2.start_epoch == 2
    assert int(trainer2.state.step) == 2 * trainer.steps_per_epoch
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(trainer2.state.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(trainer.state.params)[0]),
        rtol=1e-6)
    trainer2.ckpt.close()


def test_contrast_epoch_gating(tmp_path):
    trainer, cfg = _mini_trainer(tmp_path, n_epochs=1, contrast_warmup=0)
    protos_before = np.asarray(trainer.state.prototypes)
    trainer.run_epoch(0, "Train")
    assert np.abs(
        np.asarray(trainer.state.prototypes) - protos_before).sum() > 0
    trainer.ckpt.close()


def test_val_use_knn_routes_into_eval_step(tmp_path, monkeypatch):
    """VERDICT weak #4: with train.val_use_knn the training-time validation
    (which drives best-3DIOU selection) must run the KNN-cleaned point
    predictions, matching the published metric."""
    import coarse3d_tpu.ops.knn as knn_mod

    calls = []
    real = knn_mod.knn_postprocess
    monkeypatch.setattr(
        knn_mod, "knn_postprocess",
        lambda *a, **k: calls.append(1) or real(*a, **k))

    trainer, cfg = _mini_trainer(tmp_path, n_epochs=1, val_use_knn=True)
    assert cfg.train.val_use_knn
    results = trainer.run_epoch(0, "Validation")
    assert np.isfinite(results["3DIOU"])
    assert calls, "knn_postprocess was never traced into the eval step"
    trainer.ckpt.close()

    # and OFF by default (reference-parity selection)
    calls.clear()
    trainer2, cfg2 = _mini_trainer(tmp_path, n_epochs=1)
    assert not cfg2.train.val_use_knn
    trainer2.run_epoch(0, "Validation")
    assert not calls
    trainer2.ckpt.close()


def test_ddp_parity_protos_through_trainer(tmp_path):
    """contrast.ddp_parity_protos must work through the Trainer/train CLI
    path: the warmup step is built WITHOUT a mesh, and the guard used to
    reject it at Trainer construction before a single step ran."""
    trainer, cfg = _mini_trainer(tmp_path, n_epochs=1, contrast_warmup=0,
                                 ddp_parity=True)
    protos_before = np.asarray(trainer.state.prototypes)
    trainer.run_epoch(0, "Train")  # contrast epoch -> shard_map proto path
    assert np.abs(
        np.asarray(trainer.state.prototypes) - protos_before).sum() > 0
    trainer.ckpt.close()


def test_best_checkpoint_tracking(tmp_path):
    trainer, cfg = _mini_trainer(tmp_path, n_epochs=1)
    improved = trainer.ckpt.save_best(trainer.state, 0, {"3DIOU": 0.5})
    assert improved == ["3DIOU"]
    assert trainer.ckpt.save_best(trainer.state, 1, {"3DIOU": 0.4}) == []
    assert trainer.ckpt.save_best(trainer.state, 2, {"3DIOU": 0.6}) == ["3DIOU"]

    # best snapshots restore exactly (the BASELINE numbers are
    # best-checkpoint numbers; evaluate --ckpt best_3DIOU uses this path)
    fresh = build_state(cfg, jax.random.key(9), steps_per_epoch=2,
                        batch_size=1)
    restored = trainer.ckpt.restore_best(fresh, key="3DIOU")
    want = jax.tree_util.tree_leaves(trainer.state.params)
    got = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    import pytest

    with pytest.raises(FileNotFoundError, match="best_nope"):
        trainer.ckpt.restore_best(fresh, key="nope")
    trainer.ckpt.close()


def test_load_pretrained_filtered(tmp_path):
    cfg = tiny_config()
    state = build_state(cfg, jax.random.key(0), steps_per_epoch=2,
                        batch_size=1)
    donor = build_state(cfg, jax.random.key(1), steps_per_epoch=2,
                        batch_size=1)
    new_state, copied = load_pretrained_params(state, donor.params)
    assert copied > 50
    a = jax.tree_util.tree_leaves(new_state.params)[0]
    b = jax.tree_util.tree_leaves(donor.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # prefix filtering copies a strict subset
    _, copied_enc = load_pretrained_params(
        state, donor.params, only_prefixes=("ResContextBlock",))
    assert 0 < copied_enc < copied


def test_selection_warmup_staggers_ratio(tmp_path):
    """contrast.selection_warmup holds the select ratio at 0 until its epoch
    (ratio 0 == weak-only anchors, test_selection_ratio_zero_keeps_only_gt),
    so the staggered arm trains the prototype EMA on clean anchors first."""
    trainer, cfg = _mini_trainer(tmp_path, n_epochs=4, contrast_warmup=1)
    trainer.cfg = dataclasses.replace(
        cfg, contrast=dataclasses.replace(cfg.contrast, selection_warmup=3))
    seen = {}
    real_step = trainer._step_contrast

    def spy(state, batch, ratio):
        seen[trainer._epoch_under_test] = float(ratio)
        return real_step(state, batch, ratio)

    trainer._step_contrast = spy
    for epoch in range(4):
        trainer._epoch_under_test = epoch
        trainer.run_epoch(epoch, "Train")
    assert seen[1] == 0.0 and seen[2] == 0.0  # staggered: selection off
    assert seen[3] > 0.0  # selection_warmup reached: schedule takes over
    trainer.ckpt.close()
    trainer.recorder.close()


def test_contrast_ablation_merge(tmp_path):
    """--merge combines per-seed reports (the per-seed-subprocess workflow
    that bounds the axon transfer leak) and recomputes the summary."""
    import json

    from coarse3d_tpu.tools.contrast_ablation import main

    def fake(seed, best_full, best_noc):
        return {"config": {}, "runs": [
            {"arm": "full", "seed": seed, "series": [best_full],
             "best": best_full, "last5": best_full},
            {"arm": "nocontrast", "seed": seed, "series": [best_noc],
             "best": best_noc, "last5": best_noc},
            {"arm": "staggered", "seed": seed, "series": [best_full + 0.1],
             "best": best_full + 0.1, "last5": best_full + 0.1}],
            "summary": {}}

    p1, p2 = tmp_path / "s1.json", tmp_path / "s2.json"
    p1.write_text(json.dumps(fake(1, 0.5, 0.3)))
    p2.write_text(json.dumps(fake(2, 0.4, 0.2)))
    out = tmp_path / "merged.json"
    rep = main(["--merge", str(p1), str(p2), "--out", str(out)])
    assert len(rep["runs"]) == 6
    assert rep["summary"]["full"]["n"] == 2
    np.testing.assert_allclose(rep["summary"]["full"]["best_mean"], 0.45)
    np.testing.assert_allclose(rep["summary"]["nocontrast"]["best_mean"], 0.25)
    # runs come back seed-major, arm order matching the grid definition
    assert [(r["arm"], r["seed"]) for r in rep["runs"]] == [
        ("full", 1), ("nocontrast", 1), ("staggered", 1),
        ("full", 2), ("nocontrast", 2), ("staggered", 2)]
    assert json.loads(out.read_text())["summary"] == rep["summary"]
    # seed-matched paired deltas vs the warmup-only baseline (arms at one
    # seed share data + init, so this cancels breakthrough-timing variance)
    pd = rep["paired"]["full-nocontrast"]
    assert pd["n"] == 2 and pd["seeds"] == [1, 2]
    np.testing.assert_allclose(pd["best_delta"], [0.2, 0.2])
    np.testing.assert_allclose(pd["best_delta_mean"], 0.2)
    np.testing.assert_allclose(pd["best_delta_std"], 0.0, atol=1e-12)
    # exact sign-flip permutation p: deltas [0.2, 0.2] -> sign assignments
    # (++, +-, -+, --) give |mean| (0.2, 0, 0, 0.2); 2 of 4 >= observed
    np.testing.assert_allclose(pd["best_perm_p"], 0.5)
    np.testing.assert_allclose(pd["last5_perm_p"], 0.5)
    # staggered pairs against BOTH baselines: nocontrast (does the arm beat
    # no contrast at all) and full (does staggering beat the shipped
    # composition — the r4 interaction hypothesis)
    np.testing.assert_allclose(
        rep["paired"]["staggered-nocontrast"]["best_delta"], [0.3, 0.3])
    np.testing.assert_allclose(
        rep["paired"]["staggered-full"]["best_delta"], [0.1, 0.1])

    # duplicate (arm, seed) pairs across reports are a hard error
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="duplicate run"):
        main(["--merge", str(p1), str(p1), "--out", str(out)])


@pytest.mark.slow
def test_contrast_ablation_tool_smoke(tmp_path):
    """tools/contrast_ablation.py: two arms, one seed, tiny shapes — report
    carries per-run series and per-arm mean/std summaries (the PERF.md
    ablation-grid driver)."""
    from coarse3d_tpu.tools.contrast_ablation import main

    rep = main([
        "--arms", "full", "nocontrast", "--seeds", "7", "--epochs", "2",
        "--scans", "8", "--points", "2000", "--classes", "5",
        "--weak", "0.01", "--segments", "4", "--modes", "1",
        "--imbalance", "8",
        "--work", str(tmp_path), "--out", str(tmp_path / "rep.json"),
        # per-chip batch 1: the tool uses train.py's batch semantics
        # (batch x local devices), and this env has 8 virtual devices
        "--set", "train.batch_size_train=1",
        "--set", "train.batch_size_val=1",
        "--set", "sensor.proj_h=16", "--set", "sensor.proj_w=64",
        "--set", "data.max_points=4096",
        "--set", "model.compute_dtype=float32",
        "--set", "contrast.contrast_warmup=1",
        "--set", "contrast.num_anchor=16",
        "--set", "contrast.max_pixels_per_class=64",
        "--set", "contrast.sub_proto_size=4",
        "--set", "contrast.proj_dim=16",
        "--set", "train.lovasz_budget=512"])
    assert set(rep["summary"]) == {"full", "nocontrast"}
    assert len(rep["runs"]) == 2
    assert all(len(r["series"]) == 2 for r in rep["runs"])
    assert all(0.0 <= v <= 1.0 for r in rep["runs"] for v in r["series"])
    # per-class evidence (rare-class resolution on the imbalanced task)
    assert all(len(r["last5_class_iou"]) == 5 for r in rep["runs"])
    assert "last5_class_delta" in rep["paired"]["full-nocontrast"]
    assert len(
        rep["paired"]["full-nocontrast"]["last5_class_delta"]["mean"]) == 5
    import json

    on_disk = json.loads((tmp_path / "rep.json").read_text())
    assert on_disk["summary"] == rep["summary"]
    # the final checkpoint is restorable (CRF-delta measurement path)
    assert (tmp_path / "full_s7" / "checkpoint").exists()
