"""Headline benchmark: SemanticKITTI scans/sec/chip (proj + fwd + KNN).

Runs the fused device inference pipeline (spherical projection, SalsaNext
bf16 forward, KNN range post-processing) on synthetic KITTI-shaped scans
(~120k points, 64x2048 image) on whatever jax.devices()[0] is — the real TPU
chip under the driver.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the documented stand-in is 24 scans/sec — SalsaNext's reported real-time
rate on its evaluation GPU, which the COARSE3D pipeline (same backbone +
the same KNN) cannot exceed per GPU. vs_baseline = scans_per_sec / 24.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SCANS_PER_SEC = 24.0
BATCH = 16
N_POINTS = 120000
WARMUP = 3
ITERS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from coarse3d_tpu.configs import preset
    from coarse3d_tpu.data.synthetic import pad_points, synthetic_scan
    from coarse3d_tpu.eval.inference import make_inference_fn
    from coarse3d_tpu.train.setup import build_model

    cfg = preset("kitti")
    model = build_model(cfg)

    rng = np.random.default_rng(0)
    pts, msk = [], []
    for _ in range(BATCH):
        scan = synthetic_scan(rng, N_POINTS, cfg.data.n_classes, cfg.sensor)
        p, v = pad_points(scan["points"], cfg.data.max_points, fill=0.0)
        pts.append(p)
        msk.append(v)
    points = jnp.asarray(np.stack(pts))
    valid = jnp.asarray(np.stack(msk))

    variables = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((BATCH, cfg.sensor.proj_h, cfg.sensor.proj_w,
                   cfg.model.in_channels), jnp.float32),
        train=False)
    infer = make_inference_fn(model, variables, cfg, use_knn=True)

    for _ in range(WARMUP):
        infer(points, valid).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = infer(points, valid)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    scans_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "SemanticKITTI scans/sec/chip (proj+fwd+KNN)",
        "value": round(scans_per_sec, 2),
        "unit": "scans/sec",
        "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
