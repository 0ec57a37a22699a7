"""End-to-end train/eval step tests on a tiny synthetic config."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coarse3d_tpu.configs.config import (
    ContrastConfig,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    SensorSpec,
    TrainConfig,
)
from coarse3d_tpu.data.synthetic import synthetic_batch
from coarse3d_tpu.metrics import iou_from_confusion
from coarse3d_tpu.train.setup import build_alpha, build_state
from coarse3d_tpu.train.step import (
    make_eval_step,
    make_train_step,
    select_ratio_schedule,
)


def tiny_config(**kw) -> ExperimentConfig:
    return ExperimentConfig(
        data=DataConfig(dataset="synthetic", n_classes=8, max_points=4096,
                        cls_counts=tuple([0.0] + [100.0] * 7)),
        sensor=SensorSpec(proj_h=16, proj_w=64),
        model=ModelConfig(compute_dtype="float32"),
        contrast=ContrastConfig(
            num_anchor=32, max_pixels_per_class=128, sub_proto_size=4,
            proj_dim=32, **kw.pop("contrast", {})),
        train=TrainConfig(**kw.pop("train", {})),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        rng, cfg, batch_size=2, n_points=3000, weak_ratio=0.01).items()}
    state = build_state(cfg, jax.random.key(0), steps_per_epoch=10,
                        batch_size=2)
    alpha = build_alpha(cfg)
    return cfg, batch, state, alpha


def test_warmup_step_runs_and_learns(setup):
    cfg, batch, state, alpha = setup
    step = jax.jit(make_train_step(cfg, alpha, with_contrast=False))
    s = state
    losses = []
    for _ in range(5):
        s, metrics = step(s, batch)
        losses.append(float(metrics["losses"]["total"]))
    assert int(s.step) == 5
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # fits a fixed batch
    # prototypes untouched without contrast
    np.testing.assert_array_equal(
        np.asarray(s.prototypes), np.asarray(state.prototypes))


def test_contrast_step_runs(setup):
    cfg, batch, state, alpha = setup
    step = jax.jit(make_train_step(cfg, alpha, with_contrast=True))
    ratio = select_ratio_schedule(cfg.train.n_epochs)(10)
    s, metrics = step(state, batch, ratio)
    assert np.isfinite(float(metrics["losses"]["total"]))
    assert np.isfinite(float(metrics["losses"]["contrast"]))
    # prototype memory moved and stayed unit-norm
    assert float(jnp.abs(s.prototypes - state.prototypes).sum()) > 0
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(s.prototypes), axis=-1), 1.0, rtol=1e-5)
    # memory-health diagnostics ride along with the contrast specialization
    diag = {k: float(v) for k, v in metrics["diag"].items()}
    assert set(diag) == {"proto_inter_sim", "proto_intra_sim", "proto_drift"}
    assert all(np.isfinite(v) for v in diag.values())
    assert diag["proto_drift"] > 0  # EMA moved the memory
    # random-init D=32 prototypes are near-orthogonal across classes
    assert abs(diag["proto_inter_sim"]) < 0.5


def test_contrast_step_diag_frozen_prototypes(setup):
    cfg, batch, state, alpha = setup
    cfg = dataclasses.replace(
        cfg, contrast=dataclasses.replace(cfg.contrast, use_prototype=False))
    step = jax.jit(make_train_step(cfg, alpha, with_contrast=True))
    s, metrics = step(state, batch, 0.2)
    # frozen memory: diagnostics still reported, drift exactly zero
    np.testing.assert_array_equal(
        np.asarray(s.prototypes), np.asarray(state.prototypes))
    assert float(metrics["diag"]["proto_drift"]) == 0.0
    assert np.isfinite(float(metrics["diag"]["proto_inter_sim"]))


def test_eval_step_and_metrics(setup):
    cfg, batch, state, _ = setup
    eval_step = jax.jit(make_eval_step(cfg))
    out = eval_step(state, batch)
    assert out["argmax_2d"].shape == batch["eval_label"].shape
    mean_iou, per_cls = iou_from_confusion(out["confusion"])
    assert 0.0 <= float(mean_iou) <= 1.0


def test_training_improves_3d_iou(setup):
    cfg, batch, state, alpha = setup
    step = jax.jit(make_train_step(cfg, alpha, with_contrast=False))
    eval_step = jax.jit(make_eval_step(cfg))
    iou0 = float(iou_from_confusion(eval_step(state, batch)["confusion"])[0])
    s = state
    for _ in range(30):
        s, _ = step(s, batch)
    iou1 = float(iou_from_confusion(eval_step(s, batch)["confusion"])[0])
    assert iou1 > iou0


def test_select_ratio_schedule():
    ratio = select_ratio_schedule(100)
    # trainer.py:656-661 formula
    assert abs(ratio(0) - 0.5 * np.log(1.01) / np.log(2)) < 1e-9
    assert abs(ratio(99) - 0.5) < 1e-9
    assert ratio(50) < 0.5


def test_eval_step_with_knn(setup):
    cfg, batch, state, _ = setup
    import jax

    from coarse3d_tpu.train.step import make_eval_step

    eval_knn = jax.jit(make_eval_step(cfg, use_knn=True))
    out = eval_knn(state, batch)
    from coarse3d_tpu.metrics import iou_from_confusion

    miou = float(iou_from_confusion(out["confusion"])[0])
    assert 0.0 <= miou <= 1.0
    # confusion total == valid point count
    assert int(np.asarray(out["confusion"]).sum()) == int(
        np.asarray(batch["point_valid"]).sum())


def test_eval_step_with_crf(setup):
    """Opt-in CRF refinement (the reference ships postproc/crf.py but never
    exports or calls it): same confusion budget, valid labels, and it must
    actually change some 2D argmax pixels vs the plain path."""
    cfg, batch, state, _ = setup
    import jax

    from coarse3d_tpu.metrics import iou_from_confusion
    from coarse3d_tpu.train.step import make_eval_step

    plain = jax.jit(make_eval_step(cfg))(state, batch)
    crf = jax.jit(make_eval_step(cfg, use_crf=True))(state, batch)
    miou = float(iou_from_confusion(crf["confusion"])[0])
    assert 0.0 <= miou <= 1.0
    assert int(np.asarray(crf["confusion"]).sum()) == int(
        np.asarray(batch["point_valid"]).sum())
    assert (np.asarray(crf["argmax_2d"]) !=
            np.asarray(plain["argmax_2d"])).any()


def test_lovasz_overflow_metric_in_step():
    """With a deliberately tiny lovasz_budget the train step must surface
    the truncation sentinel (losses/lovasz.py:lovasz_budget_overflow) in
    its metrics; with a sufficient budget the sentinel reads 0."""
    cfg = tiny_config(train={"lovasz_budget": 8})
    rng = np.random.default_rng(1)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        rng, cfg, batch_size=2, n_points=3000, weak_ratio=0.05).items()}
    state = build_state(cfg, jax.random.key(0), steps_per_epoch=10,
                        batch_size=2)
    step = jax.jit(make_train_step(cfg, build_alpha(cfg),
                                   with_contrast=False))
    _, metrics = step(state, batch)
    n_valid = int((batch["train_label"] > 0).sum())
    assert n_valid > 8  # the batch actually overflows the tiny budget
    assert int(metrics["losses"]["lovasz_overflow"]) == n_valid - 8

    cfg_ok = tiny_config(train={"lovasz_budget": 16384})
    state_ok = build_state(cfg_ok, jax.random.key(0), steps_per_epoch=10,
                           batch_size=2)
    step_ok = jax.jit(make_train_step(cfg_ok, build_alpha(cfg_ok),
                                      with_contrast=False))
    _, m_ok = step_ok(state_ok, batch)
    assert int(m_ok["losses"]["lovasz_overflow"]) == 0
