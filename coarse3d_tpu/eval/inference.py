"""Fused device inference: projection -> forward -> KNN -> 3D labels.

This is the benchmark path (BASELINE.json: "SemanticKITTI scans/sec/chip
(proj + fwd + KNN)"). The reference splits this across DataLoader workers
(NumPy projection), the GPU forward, and an optional torch KNN module that
the shipped trainer never calls (SURVEY §5.1 defect #10); here the whole
per-scan pipeline is one jitted XLA program — no host round-trips between
stages.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from coarse3d_tpu.configs.config import ExperimentConfig
from coarse3d_tpu.eval.unproject import unproject_image
from coarse3d_tpu.ops.knn import knn_postprocess
from coarse3d_tpu.ops.projection import (
    build_range_features,
    normalize_features,
    range_project_batch,
)


def make_inference_fn(model, variables, cfg: ExperimentConfig,
                      use_knn: bool = True,
                      use_pallas_proj: bool = False):
    """Returns jitted (points (B, P, 4), valid (B, P)) -> labels (B, P).

    use_pallas_proj: replace the two XLA scatter passes of the projection
    with the fused Pallas kernel (ops/pallas/proj_scatter.py). Default OFF:
    the kernel beats the isolated 3-pass XLA projection by 16-25% (B=8/16,
    identical winner semantics, r4 measurements) but measures ~4% SLOWER in
    this composed program (223.6 vs 214.4 ms at B=16) — the pallas_call
    boundary blocks XLA's cross-stage fusion by more than the kernel saves.
    Kept opt-in for standalone-projection workloads; see PERF.md
    "North-star Pallas kernels (r4)".
    """
    sensor = cfg.sensor
    knn_cfg = cfg.knn
    n_classes = cfg.data.n_classes
    if use_pallas_proj:
        from coarse3d_tpu.ops.pallas.proj_scatter import (
            range_project_batch_pallas,
        )

        project = range_project_batch_pallas
    else:
        project = range_project_batch

    @jax.jit
    def infer(points: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        proj = project(points, valid, sensor=sensor)
        feats = build_range_features(
            proj["proj_points"], proj["proj_range"], xp=jnp)
        mask = proj["proj_idx"] >= 0
        x = normalize_features(feats, mask, sensor, xp=jnp)
        # argmax over LOGITS: softmax is monotonic so the argmax is
        # identical, and XLA dead-code-eliminates the (B, H, W, C) f32
        # softmax entirely from the inference program
        logits = model.apply(variables, x, train=False)["logits"]
        argmax_2d = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if use_knn:
            return knn_postprocess(
                proj["proj_range"], proj["depth"], argmax_2d,
                proj["px"], proj["py"],
                n_classes=n_classes, knn=knn_cfg.knn, search=knn_cfg.search,
                sigma=knn_cfg.sigma, cutoff=knn_cfg.cutoff)
        return unproject_image(argmax_2d, proj["px"], proj["py"])

    return infer
