"""SemanticPOSS-path integration: tag-driven samples through the padded
SalsaNext train/eval steps (the reference pads POSS inputs +8 in H and W,
salsanext_proto.py:426-431)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from coarse3d_tpu.configs.config import (
    ContrastConfig,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    SensorSpec,
    TrainConfig,
)
from coarse3d_tpu.data.pipeline import BATCH_KEYS, DataPipeline
from coarse3d_tpu.train.setup import build_alpha, build_model
from coarse3d_tpu.train.state import create_train_state
from coarse3d_tpu.train.step import make_eval_step, make_train_step


class TagDataset:
    """POSS-like synthetic catalog: dense tag grids + sparse weak labels."""

    name = "semantic_poss"

    def __init__(self, n_scans, sensor, n_classes, seed=0):
        self.n_scans = n_scans
        self.sensor = sensor
        self.n_classes = n_classes
        self.seed = seed

    def __len__(self):
        return self.n_scans

    def path_info(self, index):
        return "00", f"{index:06d}"

    def load(self, index):
        rng = np.random.default_rng((self.seed, index))
        hw = self.sensor.proj_h * self.sensor.proj_w
        n = int(hw * 0.7)
        tags = np.zeros(hw, bool)
        tags[np.sort(rng.choice(hw, n, replace=False))] = True
        points = rng.uniform(-40, 40, (n, 4)).astype(np.float32)
        labels = rng.integers(1, self.n_classes, n).astype(np.int32)
        weak = np.where(rng.random(n) < 0.02, labels, 0).astype(np.int32)
        return {"points": points, "labels": labels, "weak_labels": weak,
                "tags": tags}


def _poss_cfg():
    # 8x24 sensor -> +8 pad -> 16x32, both divisible by 16
    return ExperimentConfig(
        data=DataConfig(dataset="semantic_poss", n_classes=8,
                        max_points=8 * 24,
                        cls_counts=tuple([0.0] + [10.0] * 7)),
        sensor=SensorSpec(name="tiny-poss", proj_h=8, proj_w=24,
                          fov_up=15.0, fov_down=-25.0, max_depth=200.0),
        model=ModelConfig(compute_dtype="float32"),
        contrast=ContrastConfig(num_anchor=16, max_pixels_per_class=64,
                                sub_proto_size=4, proj_dim=32),
        train=TrainConfig(),
    )


def test_poss_tag_pipeline_through_train_step():
    cfg = _poss_cfg()
    ds = TagDataset(4, cfg.sensor, cfg.data.n_classes)
    pipe = DataPipeline(ds, cfg, batch_size=2, train=True, num_workers=2,
                        process_index=0, process_count=1)
    batch = next(iter(pipe.epoch(0)))
    assert set(batch) == set(BATCH_KEYS) | {"scan_index"}
    assert batch["features"].shape == (2, 8, 24, 5)

    model = build_model(cfg)
    assert model.pad_hw == 8  # POSS padding wired by the factory
    import optax

    tx = optax.adamw(1e-3)
    state = create_train_state(
        model, tx, jax.random.key(0), (2, 8, 24, 5),
        n_classes=cfg.data.n_classes,
        sub_proto_size=cfg.contrast.sub_proto_size,
        proj_dim=cfg.contrast.proj_dim)

    step = jax.jit(make_train_step(cfg, build_alpha(cfg), with_contrast=True))
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    new_state, metrics = step(state, jbatch, 0.3)
    assert np.isfinite(float(metrics["losses"]["total"]))

    eval_step = jax.jit(make_eval_step(cfg, use_knn=True))
    out = eval_step(new_state, jbatch)
    # depth clamp (POSS clamps at 200 m) and tag unprojection both exercised
    assert int(np.asarray(out["confusion"]).sum()) == int(
        np.asarray(jbatch["point_valid"]).sum())
