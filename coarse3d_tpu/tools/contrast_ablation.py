"""Multi-seed contrast-machinery ablation grid on the hard synthetic task.

The accuracy-axis evidence for the weak-supervision machinery (VERDICT r2
next #1): on a task whose classes the range convs canNOT separate from
geometry (data/synthetic.py:synthetic_hard_scan — texture-frequency classes,
identical depth/elevation marginals), run the REAL recipe and ablate each
contrast component:

  full        — the shipped default (contrast + entropy selection +
                prototype EMA; reference mechanism trainer.py:654-690 +
                contrast_pixel_loss.py:8-195)
  nocontrast  — loss_w_contrast=0 (warmup losses only)
  noentropy   — entropy_selection=false (anchors from weak labels only)
  noproto     — use_prototype=false (frozen random prototypes — the
                reference's SHIPPED default, its defect #2)
  minimal     — both ablations composed: frozen random prototypes AND
                weak-only anchors (contrast as a fixed-target InfoNCE on
                the true weak labels). Added after the r3 45-epoch grid
                showed noproto and noentropy EACH learning faster than
                full on every seed; tests whether the effects compose.

All arms/seeds run in ONE process so jit programs and the tunnel are paid
once; identical-config different-seed runs reuse the persistent compile
cache. Emits a JSON report (per-run series, per-arm mean+-std of best and
last-5-epoch-mean val mIoU) for the PERF.md table.

EMA-timescale caveat (PERF.md r3 phase 1): the reference's
proto_momentum=0.999 is an EMA time-constant of 1000 steps, tuned for its
~230k-step KITTI schedule. On a short synthetic schedule (16 steps/epoch)
the memory never leaves random init and `full` silently degenerates into
`noproto`. For prototype-EMA arms pass
`--set contrast.proto_momentum=<m>` with m ~= 1 - 1/(0.5*steps_per_epoch)
so the time-constant stays a sub-epoch fraction of training.

  python -m coarse3d_tpu.tools.contrast_ablation --out /tmp/ablation.json \
      --seeds 1 2 3 --epochs 24 --scans 64 --points 120000 --weak 0.001
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

ARMS = {
    "full": [],
    "nocontrast": ["contrast.loss_w_contrast=0"],
    "noentropy": ["contrast.entropy_selection=false"],
    "noproto": ["contrast.use_prototype=false"],
    "minimal": ["contrast.use_prototype=false",
                "contrast.entropy_selection=false"],
    # the TPU-native space-to-depth stem with the FULL contrast mechanism:
    # pairs s2d against `full` on the same seeds/data so the 88.5 scans/s
    # config's accuracy question (PERF.md "space-to-depth stem") is settled
    # by the same grid instead of a separate synthetic-easy protocol
    "s2d": ["model.stem=s2d"],
    # width-only 1x2 space-to-depth (full H, half W): the untested middle
    # ground after the 2x2 stem measured -12.3 pt on this texture-carried
    # task (PERF.md "r4 ablation phase 2") — keeps the row resolution the
    # stripes live in while still halving HBM activation traffic.
    "s2d_w": ["model.stem=s2d_w"],
    # staggered composition (tests the r4 balanced-grid interaction
    # hypothesis): prototype EMA forms on clean weak-only anchors for 20
    # epochs after contrast_warmup, THEN entropy selection joins — if the
    # full-stack null comes from prototypes absorbing selection noise while
    # the memory forms, this arm should recover both single-ablation gains.
    # The epoch value assumes the 45-epoch grid protocol (contrast from 5).
    "staggered": ["contrast.selection_warmup=25"],
}


def run_one(arm: str, seed: int, args) -> dict:
    import gc

    import jax
    import numpy as np

    from coarse3d_tpu.configs import apply_overrides, preset  # noqa: E501
    from coarse3d_tpu.data.pipeline import DataPipeline
    from coarse3d_tpu.data.synthetic import SyntheticHardDataset
    from coarse3d_tpu.train.trainer import Trainer
    from coarse3d_tpu.utils import Recorder

    cfg = preset("semantic_kitti")
    n = args.classes
    cfg = apply_overrides(cfg, [
        f"data.n_classes={n}",
        "data.cls_counts=[0" + ",100" * (n - 1) + "]",
        f"train.seed={seed}",
        f"train.n_epochs={args.epochs}",
    ] + ARMS[arm] + args.set)

    ds_kw = dict(weak_ratio=args.weak, n_segments=args.segments,
                 modes_per_class=args.modes, noise=args.noise,
                 weak_label_noise=args.label_noise,
                 imbalance=args.imbalance)
    # the task (scene layout + weak subset) is seed-matched across arms:
    # data seed = run seed, so arm comparisons at one seed share the data
    train_ds = SyntheticHardDataset(args.scans, args.points, n, cfg.sensor,
                                    seed=seed, **ds_kw)
    val_ds = SyntheticHardDataset(max(args.scans // 4, 4), args.points, n,
                                  cfg.sensor, seed=seed + 1000, **ds_kw)

    save = os.path.join(args.work, f"{arm}_s{seed}")
    cfg = dataclasses.replace(cfg, save_path=save)
    recorder = Recorder(save, settings=cfg, use_tensorboard=False)
    # same batch semantics as tools/train.py: batch_size_train is PER
    # CHIP, the host batch is x local devices — so the ablation runs the
    # same effective batch (BN / contrast statistics) as the recipe it
    # claims to ablate, on any host size
    from coarse3d_tpu.parallel import make_mesh

    n_dev = jax.local_device_count()
    train_pipe = DataPipeline(train_ds, cfg,
                              cfg.train.batch_size_train * n_dev,
                              train=True, seed=seed,
                              num_workers=args.num_workers)
    val_pipe = DataPipeline(val_ds, cfg, cfg.train.batch_size_val * n_dev,
                            train=False, seed=seed,
                            num_workers=args.num_workers)
    print(f"[{arm} s{seed}] global batch "
          f"{cfg.train.batch_size_train * n_dev} over {n_dev} device(s)",
          flush=True)
    mesh = make_mesh(n_dev, devices=jax.local_devices())
    trainer = Trainer(cfg, train_pipe, val_pipe, recorder=recorder,
                      mesh=mesh)
    series = []
    class_series = []
    for epoch in range(cfg.train.n_epochs):
        trainer.run_epoch(epoch, "Train")
        res = trainer.run_epoch(epoch, "Validation")
        series.append(round(float(res["3DIOU"]), 4))
        class_series.append(res["class_IOU"])
        print(f"[{arm} s{seed}] epoch {epoch + 1}/{cfg.train.n_epochs} "
              f"val mIoU {series[-1]:.4f}", flush=True)
    # final checkpoint: lets evaluate --run_dir re-score the trained model
    # (e.g. the CRF delta measurement, PARITY.md CRF entry)
    trainer.ckpt.save_rolling(trainer.state, cfg.train.n_epochs - 1)
    trainer.ckpt.close()
    recorder.close()
    # multi-run hygiene: drop this run's jit executables and host-side
    # buffers before the next run builds its own (without this, a 12-run
    # grid accumulates ~8 GB/run of dead executables/buffers)
    del trainer
    for d in (train_ds, val_ds):
        if d._cache is not None:
            d._cache.clear()
    gc.collect()
    jax.clear_caches()
    # rare-class evidence for the imbalanced task: per-class IoU means over
    # the last 5 epochs (the steady-state the paired deltas compare)
    last5_class = [round(float(v), 4)
                   for v in np.mean(np.asarray(class_series[-5:]), axis=0)]
    return {"arm": arm, "seed": seed, "series": series,
            "best": max(series), "last5": float(np.mean(series[-5:])),
            "last5_class_iou": last5_class}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--merge", nargs="+", metavar="REPORT.json",
                   help="merge per-seed/per-arm reports (runs concatenated, "
                        "summary recomputed) into --out instead of training; "
                        "the per-seed-subprocess workflow that bounds the "
                        "axon transfer leak (CLAUDE.md) produces these")
    p.add_argument("--merge_exempt", nargs="+", default=[], metavar="KEY",
                   help="config keys additionally exempted from the --merge "
                        "config-match check. Only for parts PROVABLY "
                        "comparable despite the differing key — e.g. 'set' "
                        "when the only override is contrast.proto_momentum "
                        "and every merged arm in the momentum-less parts is "
                        "momentum-independent (nocontrast/noproto/minimal "
                        "never run the EMA update, train/step.py:126). The "
                        "exemption is recorded in the merged report's "
                        "config for the reader to audit.")
    p.add_argument("--arms", nargs="+", default=list(ARMS),
                   choices=list(ARMS))
    p.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    p.add_argument("--epochs", type=int, default=24)
    p.add_argument("--scans", type=int, default=64)
    p.add_argument("--points", type=int, default=120000)
    p.add_argument("--classes", type=int, default=8)
    p.add_argument("--weak", type=float, default=0.001)
    p.add_argument("--segments", type=int, default=6)
    p.add_argument("--modes", type=int, default=2)
    p.add_argument("--noise", type=float, default=0.15)
    p.add_argument("--label_noise", type=float, default=0.0)
    p.add_argument("--imbalance", type=float, default=0.0,
                   help="geometric class point-share skew (max/min ratio); "
                        "uniform weak sampling then starves rare classes of "
                        "CE signal — the real-data transfer channel the "
                        "balanced task lacks (data/synthetic.py). 0 = "
                        "balanced 1D-Voronoi sectors (the r3/r4 grids).")
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--work", default="/tmp/contrast_ablation")
    p.add_argument("--out", default="/tmp/contrast_ablation/report.json")
    p.add_argument("--set", action="append", default=[],
                   metavar="SECTION.KEY=VALUE")
    args = p.parse_args(argv)

    if args.merge:
        # per-part grid configs must agree on everything that defines the
        # task/recipe; invocation bookkeeping keys are exempt. A mismatch
        # would silently merge non-comparable runs into one summary.
        exempt = {"merge", "merge_exempt", "arms", "seeds", "out", "work",
                  "num_workers"} | set(args.merge_exempt)
        runs, seen, part_cfgs, ref_cfg = [], set(), {}, None
        for path in args.merge:
            with open(path) as f:
                part = json.load(f)
            cfg = {k: v for k, v in part.get("config", {}).items()
                   if k not in exempt}
            part_cfgs[path] = part.get("config", {})
            if ref_cfg is None:
                ref_cfg = cfg
            elif cfg != ref_cfg:
                diff = {k: (ref_cfg.get(k), cfg.get(k))
                        for k in set(ref_cfg) | set(cfg)
                        if ref_cfg.get(k) != cfg.get(k)}
                raise SystemExit(
                    f"--merge: grid config of {path} differs from "
                    f"{args.merge[0]}: {diff}")
            for r in part["runs"]:
                key = (r["arm"], r["seed"])
                if key in seen:
                    raise SystemExit(
                        f"--merge: duplicate run {key} in {path}")
                seen.add(key)
                runs.append(r)
        arm_order = list(ARMS)
        runs.sort(key=lambda r: (
            r["seed"],
            arm_order.index(r["arm"]) if r["arm"] in arm_order
            else len(arm_order), r["arm"]))
        # the merged report's config is the VALIDATED part config (first
        # part's grid args) + the merge bookkeeping — recording the merge
        # invocation's mostly-default args here would misstate the task and
        # corrupt config-match checks on any future re-merge
        merged_cfg = dict(part_cfgs[args.merge[0]])
        merged_cfg["merge"] = args.merge
        merged_cfg["merge_exempt"] = args.merge_exempt
        merged_cfg["out"] = args.out
        report = _write(args, runs, source_configs=part_cfgs,
                        config=merged_cfg)
        print(json.dumps(report["summary"], indent=2))
        return report

    runs = []
    for seed in args.seeds:
        for arm in args.arms:
            runs.append(run_one(arm, seed, args))
            _write(args, runs)
    report = _write(args, runs)
    print(json.dumps(report["summary"], indent=2))
    return report


def _sign_flip_perm_p(deltas, max_exact=20):
    """Exact two-sided sign-flip permutation p-value of the mean delta.

    Enumerates all 2^n sign assignments (n <= max_exact; the grids run <= 8
    seeds) and returns the fraction whose |mean| >= the observed |mean|.
    n=1 degenerates to p=1.0, as it should.
    """
    import itertools

    import numpy as np

    d = np.asarray(deltas, dtype=np.float64)
    n = len(d)
    if n == 0 or n > max_exact:
        return None
    obs = abs(d.mean())
    signs = np.array(list(itertools.product((1.0, -1.0), repeat=n)))
    perm = np.abs(signs @ d) / n
    # 1e-12 tolerance: the observed assignment itself must always count
    return float(np.mean(perm >= obs - 1e-12))


# The hard task is bimodal: a run either stalls on the ~0.05-0.15 plateau
# or escapes to >0.5 (PERF.md "the optimization cliff"). Escape timing, not
# steady-state quality, dominates several paired deltas (r5 imbalanced
# full_s3: contrast delayed escape epoch 24 -> 41 and the run was still
# climbing at cutoff), so the report records it explicitly.
ESCAPE_MIOU = 0.15


def _escape_epoch(series):
    """First epoch whose val mIoU clears the plateau; None = never escaped."""
    return next((i for i, v in enumerate(series) if v > ESCAPE_MIOU), None)


def _write(args, runs, source_configs=None, config=None):
    import numpy as np

    summary = {}
    for r in runs:
        r["escape_epoch"] = _escape_epoch(r["series"])
    arms_present = [a for a in ARMS if any(r["arm"] == a for r in runs)]
    for arm in arms_present:
        rows = [r for r in runs if r["arm"] == arm]
        esc = [r["escape_epoch"] for r in rows]
        summary[arm] = {
            "escape_epochs": esc,
            "escape_median": (float(np.median([e for e in esc
                                               if e is not None]))
                              if any(e is not None for e in esc) else None),
            "n": len(rows),
            "best_mean": float(np.mean([r["best"] for r in rows])),
            "best_std": float(np.std([r["best"] for r in rows])),
            # the hard task's optimization cliff makes per-seed outcomes
            # bimodal (escape to ~0.65 vs stall ~0.15, PERF.md); medians
            # resist the outlier seeds that dominate mean+-std
            "best_median": float(np.median([r["best"] for r in rows])),
            "last5_mean": float(np.mean([r["last5"] for r in rows])),
            "last5_std": float(np.std([r["last5"] for r in rows])),
            "last5_median": float(np.median([r["last5"] for r in rows])),
        }
    # Paired per-seed deltas vs the warmup-only baseline: arms at one seed
    # share the scene layout, weak subset, AND model init (both keyed on the
    # run seed), so the seed-matched delta cancels the breakthrough-timing
    # variance that dominates the raw per-arm std (PERF.md r3 phase 1).
    paired = {}
    # every arm pairs against the warmup-only baseline; s2d and staggered
    # also pair against `full` — their promotion questions are relative to
    # the shipped composition ("does s2d cost accuracy vs parity stem";
    # "does staggering the selection beat activating both at once")
    vs_full = [a for a in ("s2d", "s2d_w", "staggered") if a in arms_present]
    baselines = ["nocontrast"] + (["full"] if vs_full else [])
    for base_arm in baselines:
        base = {r["seed"]: r for r in runs if r["arm"] == base_arm}
        arms_vs = (arms_present if base_arm == "nocontrast" else vs_full)
        for arm in arms_vs:
            if arm == base_arm:
                continue
            pairs = [(r, base[r["seed"]]) for r in runs
                     if r["arm"] == arm and r["seed"] in base]
            if not pairs:
                continue
            d_best = [r["best"] - b["best"] for r, b in pairs]
            d_last5 = [r["last5"] - b["last5"] for r, b in pairs]
            # per-class paired deltas (rare-class resolution on the
            # imbalanced task); older reports lack last5_class_iou
            d_class = None
            if all("last5_class_iou" in r and "last5_class_iou" in b
                   and len(r["last5_class_iou"]) == len(b["last5_class_iou"])
                   for r, b in pairs):
                dc = np.asarray([
                    np.subtract(r["last5_class_iou"], b["last5_class_iou"])
                    for r, b in pairs])
                d_class = {
                    "mean": [round(float(v), 4) for v in dc.mean(axis=0)],
                    "median": [round(float(v), 4)
                               for v in np.median(dc, axis=0)],
                }
            # escape-timing deltas (epochs; positive = the arm escaped
            # LATER than the baseline); None when either run never escaped
            d_esc = [r["escape_epoch"] - b["escape_epoch"]
                     if r["escape_epoch"] is not None
                     and b["escape_epoch"] is not None else None
                     for r, b in pairs]
            paired[f"{arm}-{base_arm}"] = {
                "n": len(pairs),
                "seeds": [r["seed"] for r, _ in pairs],
                "escape_delta": d_esc,
                "best_delta": [round(d, 4) for d in d_best],
                "best_delta_mean": float(np.mean(d_best)),
                "best_delta_std": float(np.std(d_best)),
                "best_delta_median": float(np.median(d_best)),
                # sign-test counts (|delta| <= 1 pt is a tie): nonparametric
                # evidence direction when the cliff makes deltas heavy-tailed
                "best_wins": int(sum(d > 0.01 for d in d_best)),
                "best_losses": int(sum(d < -0.01 for d in d_best)),
                # exact two-sided sign-flip permutation p of the mean paired
                # delta: under H0 (arm == baseline) each seed's delta is
                # sign-symmetric, so all 2^n sign assignments are equally
                # likely — the correct small-n test when the cliff makes
                # deltas heavy-tailed and t-test normality fails
                "best_perm_p": _sign_flip_perm_p(d_best),
                "last5_delta_mean": float(np.mean(d_last5)),
                "last5_delta_std": float(np.std(d_last5)),
                "last5_delta_median": float(np.median(d_last5)),
                "last5_perm_p": _sign_flip_perm_p(d_last5),
            }
            if d_class is not None:
                paired[f"{arm}-{base_arm}"]["last5_class_delta"] = d_class
    report = {"config": config or {k: v for k, v in vars(args).items()},
              "runs": runs, "summary": summary, "paired": paired}
    if source_configs:
        report["source_configs"] = source_configs
    out_dir = os.path.dirname(args.out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    # atomic publish: a crash (OOM kill, VM restart) mid-dump must not leave
    # a truncated-but-non-empty artifact that a resumable driver's existence
    # check would skip forever and a later --merge would crash on
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=2)
    os.replace(tmp, args.out)
    return report


if __name__ == "__main__":
    main()
