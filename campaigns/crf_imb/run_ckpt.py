"""CRF trained-kernel generality on an imbalanced-campaign checkpoint.

VERDICT r4 next #4: the r4 evidence for the trained CRF kernel (+3.9/+10.5
pt, PERF.md "Trained CRF compatibility kernel") is two checkpoints of the
same BALANCED hard task. This driver re-fits the kernel per
imbalanced-campaign checkpoint (tools/train_crf.py) and re-scores the
held-out catalog raw / KNN / CRF / KNN+CRF — does the gain persist under
class imbalance and concentrate in the rare classes?

Runs on CPU (the TPU is occupied by the campaign; force via
jax.config.update — the JAX_PLATFORMS env var alone is ignored under the
axon sitecustomize, CLAUDE.md). One checkpoint per invocation:

  nice -n 19 python campaigns/crf_imb/run_ckpt.py --arm full --seed 2
"""

from __future__ import annotations

import argparse
import json
import os

N_CLASSES = 8
# the imbalanced campaign's task protocol (campaigns/imbalanced/driver.sh)
TASK = dict(points=120000, segments=16, modes=1, noise=0.15,
            imbalance=16.0, weak=0.0002)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arm", required=True)
    p.add_argument("--seed", type=int, required=True)
    p.add_argument("--work", default="/tmp/ca45imb",
                   help="campaign work root holding the run dirs")
    p.add_argument("--out_dir", default="/root/repo/campaigns/crf_imb")
    p.add_argument("--crf_epochs", type=int, default=10)
    p.add_argument("--class_balance", action="store_true",
                   help="fit the kernel with inverse-frequency class "
                        "weights (train_crf --class_balance); artifacts "
                        "get a _cb suffix")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from coarse3d_tpu.tools.evaluate import main as eval_main
    from coarse3d_tpu.tools.train_crf import main as crf_main

    run_dir = os.path.join(args.work, f"{args.arm}_s{args.seed}")
    assert os.path.isdir(os.path.join(run_dir, "checkpoint")), run_dir
    os.makedirs(args.out_dir, exist_ok=True)
    tag = f"{args.arm}_s{args.seed}" + ("_cb" if args.class_balance else "")
    out = os.path.join(args.out_dir, f"{tag}.json")

    cls_counts = "[0" + ",100" * (N_CLASSES - 1) + "]"
    overrides = [f"data.n_classes={N_CLASSES}",
                 f"data.cls_counts={cls_counts}"]
    set_flags = []
    for ov in overrides:
        set_flags += ["--set", ov]

    # 1) fit the compatibility kernel on the run's own 64-scan TRAIN
    #    catalog (weak labels are the only legitimate supervision)
    kernel = os.path.join(args.out_dir, f"{tag}_kernel.npz")
    crf_common = [
        "--run_dir", run_dir, "--ckpt", "latest",
        "--synthetic_task", "hard",
        "--synthetic_points", str(TASK["points"]),
        "--synthetic_segments", str(TASK["segments"]),
        "--synthetic_modes", str(TASK["modes"]),
        "--synthetic_noise", str(TASK["noise"]),
        "--synthetic_imbalance", str(TASK["imbalance"]),
        "--num_workers", "1",
    ] + set_flags
    fit = crf_main(crf_common + [
        "--synthetic", "64", "--synthetic_seed", str(args.seed),
        "--weak", str(TASK["weak"]),
        "--epochs", str(args.crf_epochs), "--out", kernel]
        + (["--class_balance"] if args.class_balance else []))

    # 2) score the held-out catalog (seed+1000, 16 scans — the campaign's
    #    val split) under the four post-processing configurations
    eval_common = [
        "--run_dir", run_dir, "--ckpt", "latest",
        "--synthetic", "16", "--synthetic_seed", str(args.seed + 1000),
        "--synthetic_task", "hard",
        "--synthetic_points", str(TASK["points"]),
        "--synthetic_segments", str(TASK["segments"]),
        "--synthetic_modes", str(TASK["modes"]),
        "--synthetic_noise", str(TASK["noise"]),
        "--synthetic_imbalance", str(TASK["imbalance"]),
        "--num_workers", "1",
    ] + set_flags
    results = {}
    for name, extra in [
            ("raw", []),
            ("knn", ["--knn"]),
            ("crf_trained", ["--crf", "--crf_kernel", kernel]),
            ("knn_crf_trained", ["--knn", "--crf", "--crf_kernel", kernel])]:
        s = eval_main(eval_common + extra)
        results[name] = {k: s[k] for k in
                         ("mIoU_3D", "mAcc_3D", "class_iou") if k in s}
        print(f"[crf_imb {args.arm} s{args.seed}] {name}: "
              f"mIoU {s['mIoU_3D']:.4f}", flush=True)

    report = {"arm": args.arm, "seed": args.seed, "run_dir": run_dir,
              "class_balance": args.class_balance,
              "task": TASK, "crf_fit_history": fit["history"],
              "results": results,
              "delta_vs_raw": {
                  k: round(v["mIoU_3D"] - results["raw"]["mIoU_3D"], 4)
                  for k, v in results.items()}}
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=2)
    os.replace(tmp, out)
    print(json.dumps(report["delta_vs_raw"]))


if __name__ == "__main__":
    main()
