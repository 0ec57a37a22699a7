"""Headline benchmark: SemanticKITTI scans/sec/chip (proj + fwd + KNN).

Runs the fused device inference pipeline (spherical projection, SalsaNext
bf16 forward, KNN range post-processing) on synthetic KITTI-shaped scans
(~120k points, 64x2048 image) on whatever jax.devices()[0] is — the real TPU
chip under the driver.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the documented stand-in is 24 scans/sec — SalsaNext's reported real-time
rate on its evaluation GPU, which the COARSE3D pipeline (same backbone +
the same KNN) cannot exceed per GPU. vs_baseline = scans_per_sec / 24.

`--train` benchmarks the TRAINING step instead (full contrast recipe at the
reference's B=4/chip): the stand-in there is 8 scans/sec/GPU, from the same
24 Hz argument — fwd+bwd+update costs ~= 3x the forward FLOPs (activations
re-read + two matmul-sized passes per conv), so the reference's per-GPU
training rate cannot exceed ~24/3 (its own DT/PT logs are the only
training-speed artifact it ships and it publishes none —
trainer.py:779-788). vs_baseline = train_scans_per_sec / 8. PERF.md
"Training step" has the measured table; --stem s2d / --batch change the
config (non-parity throughput options).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SCANS_PER_SEC = 24.0
BASELINE_TRAIN_SCANS_PER_SEC = 8.0
BATCH = 16
N_POINTS = 120000
WARMUP = 3
ITERS = 20


def main_train(stem: str = "parity", batch: int = 4,
               out: str | None = None) -> None:
    """Training-step throughput: one jitted full-contrast step, donated
    state, B=`batch`/chip (reference recipe: 4/GPU, run.sh)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from coarse3d_tpu.configs import preset
    from coarse3d_tpu.data.synthetic import synthetic_batch
    from coarse3d_tpu.train.setup import build_alpha, build_state
    from coarse3d_tpu.train.step import make_train_step

    cfg = preset("kitti")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, stem=stem))
    rng = np.random.default_rng(0)
    host = synthetic_batch(rng, cfg, batch, n_points=N_POINTS,
                           weak_ratio=0.001)
    batch_dev = {k: jnp.asarray(v) for k, v in host.items()}
    state = build_state(cfg, jax.random.key(0), steps_per_epoch=100,
                        batch_size=batch)
    step = jax.jit(make_train_step(cfg, build_alpha(cfg),
                                   with_contrast=True),
                   donate_argnums=(0,))
    for _ in range(WARMUP):
        state, metrics = step(state, batch_dev, 0.3)
        float(metrics["losses"]["total"])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, batch_dev, 0.3)
    float(metrics["losses"]["total"])  # scalar sync (tunnel-safe timing)
    dt = time.perf_counter() - t0

    scans_per_sec = batch * ITERS / dt
    suffix = "" if stem == "parity" and batch == 4 else f" ({stem}, B={batch})"
    row = json.dumps({
        "metric": "SemanticKITTI TRAIN scans/sec/chip "
                  f"(full contrast step){suffix}",
        "value": round(scans_per_sec, 2),
        "unit": "scans/sec",
        "vs_baseline": round(
            scans_per_sec / BASELINE_TRAIN_SCANS_PER_SEC, 3),
    })
    print(row)
    if out:
        with open(out, "a") as f:
            f.write(row + "\n")


def main(out: str | None = None, distribution: str = "uniform",
         stem: str = "parity") -> None:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from coarse3d_tpu.configs import preset
    from coarse3d_tpu.data.synthetic import pad_points, synthetic_scan
    from coarse3d_tpu.eval.inference import make_inference_fn
    from coarse3d_tpu.train.setup import build_model

    cfg = preset("kitti")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, stem=stem))
    model = build_model(cfg)

    rng = np.random.default_rng(0)
    pts, msk, loser_rates = [], [], []
    for _ in range(BATCH):
        scan = synthetic_scan(rng, N_POINTS, cfg.data.n_classes, cfg.sensor,
                              angular=distribution)
        p, v = pad_points(scan["points"], cfg.data.max_points, fill=0.0)
        pts.append(p)
        msk.append(v)
        if distribution != "uniform":
            # occupancy structure of this distribution: fraction of points
            # whose pixel is won by a nearer point (the quantity the
            # point-rate ops could be sensitive to — PERF.md bench caveat)
            from coarse3d_tpu.ops.projection import range_project_np

            proj = range_project_np(scan["points"], cfg.sensor)
            winner = proj["proj_idx"][proj["py"], proj["px"]]
            loser_rates.append(
                float(np.mean(winner != np.arange(N_POINTS))))
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
        pred = infer(points, valid)
    pred.block_until_ready()
    dt = time.perf_counter() - t0

    scans_per_sec = BATCH * ITERS / dt
    fields = {
        "metric": "SemanticKITTI scans/sec/chip (proj+fwd+KNN)",
        "value": round(scans_per_sec, 2),
        "unit": "scans/sec",
        "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC, 3),
    }
    if stem != "parity":
        fields["metric"] += f" ({stem} stem)"
    if distribution != "uniform":
        fields["metric"] += f" ({distribution} occupancy)"
        fields["pixel_loser_rate"] = round(float(np.mean(loser_rates)), 4)
    row = json.dumps(fields)
    print(row)
    if out:
        with open(out, "a") as f:
            f.write(row + "\n")


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train", action="store_true",
                   help="benchmark the training step instead of inference")
    p.add_argument("--stem", default="parity",
                   choices=("parity", "s2d", "s2d_w"))
    p.add_argument("--batch", type=int, default=4,
                   help="per-chip train batch (reference recipe: 4)")
    p.add_argument("--out", default=None, metavar="PATH",
                   help="append the JSON result row to this file "
                        "(externally-captured artifact, e.g. "
                        "BENCH_TRAIN_r04.json)")
    p.add_argument("--distribution", default="uniform",
                   choices=("uniform", "grid", "clustered"),
                   help="pixel-occupancy structure of the synthetic scans "
                        "(sensitivity check for the headline's uniform-"
                        "angle assumption; grid ~= real scanner beams, "
                        "clustered = worst-case scatter conflicts)")
    args = p.parse_args()
    if args.train:
        main_train(stem=args.stem, batch=args.batch, out=args.out)
    else:
        main(out=args.out, distribution=args.distribution, stem=args.stem)
