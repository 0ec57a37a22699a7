"""Single-scan / directory inference CLI: raw .bin scans -> .label files.

The reference has no standalone inference entry point — predictions only
fall out of its Validation mode, which requires a full dataset tree with
ground-truth labels (trainer.py:706-747). This runs the fused device
pipeline (projection -> forward -> optional KNN; eval/inference.py, the
bench.py path) over bare scan files and writes SemanticKITTI
benchmark-format raw-id .label files, no labels or dataset layout needed.

  python -m coarse3d_tpu.tools.infer --weights converted.msgpack \
      --preset semantic_kitti --scans 000000.bin 000001.bin --out preds/
  python -m coarse3d_tpu.tools.infer --run_dir runs/v1.0 \
      --scan_dir $KITTI/sequences/08/velodyne --out preds/
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config")
    p.add_argument("--preset", default="semantic_kitti")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--weights", help="converted .msgpack checkpoint")
    src.add_argument("--run_dir", help="training run dir (Orbax checkpoint)")
    p.add_argument("--ckpt", default="latest",
                   help="which --run_dir checkpoint to restore: 'latest' "
                        "(rolling) or a best-metric key like 'best_3DIOU'")
    p.add_argument("--scans", nargs="+", default=[], help=".bin scan files")
    p.add_argument("--scan_dir", help="directory of .bin scans")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--no_knn", action="store_true",
                   help="skip the KNN range cleanup")
    p.add_argument("--train_ids", action="store_true",
                   help="write train ids (0..C-1) instead of raw dataset "
                        "ids via the inverse learning map")
    p.add_argument("--submission", action="store_true",
                   help="write the benchmark submission tree under --out "
                        "(sequences/NN/predictions/FFFFFF.label for "
                        "KITTI/POSS — NN taken from the scan's "
                        "sequences/NN/velodyne/ path; "
                        "lidarseg/<split>/<token>_lidarseg.bin for nuScenes "
                        "— token = scan file stem) instead of flat files")
    p.add_argument("--split", default="val",
                   help="nuScenes submission split name (with --submission)")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SECTION.KEY=VALUE")
    args = p.parse_args(argv)

    if args.weights and args.ckpt != "latest":
        # mirrors evaluate.py: --ckpt only selects within --run_dir
        raise SystemExit("--ckpt requires --run_dir, not --weights")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from coarse3d_tpu.configs import apply_overrides, load_config, preset
    from coarse3d_tpu.data.label_maps import get_label_spec
    from coarse3d_tpu.data.readers import read_kitti_scan, read_nuscenes_scan
    from coarse3d_tpu.data.synthetic import pad_points
    from coarse3d_tpu.eval.inference import make_inference_fn
    from coarse3d_tpu.train.setup import build_model

    cfg = load_config(args.config) if args.config else preset(args.preset)
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)

    paths = list(args.scans)
    if args.scan_dir:
        paths += sorted(
            os.path.join(args.scan_dir, f)
            for f in os.listdir(args.scan_dir) if f.endswith(".bin"))
    if not paths:
        raise SystemExit("no scans given (--scans / --scan_dir)")

    model = build_model(cfg)
    if args.weights:
        import flax.serialization

        with open(args.weights, "rb") as f:
            conv = flax.serialization.msgpack_restore(f.read())
        variables = {"params": conv["params"],
                     "batch_stats": conv["batch_stats"]}
    else:
        from coarse3d_tpu.train.checkpoint import restore_from_run_dir
        from coarse3d_tpu.train.setup import build_state

        # only the restore template needs a built state
        state = build_state(cfg, jax.random.key(0), steps_per_epoch=1,
                            batch_size=1)
        state = restore_from_run_dir(state, args.run_dir, args.ckpt)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}

    infer = make_inference_fn(model, variables, cfg,
                              use_knn=not args.no_knn)
    read_scan = (read_nuscenes_scan if cfg.data.dataset == "nuscenes"
                 else read_kitti_scan)
    try:
        spec = None if args.train_ids else get_label_spec(cfg.data.dataset)
    except KeyError:
        import sys

        print(f"WARNING: dataset {cfg.data.dataset!r} has no raw-id label "
              "map; writing train ids (as if --train_ids were passed)",
              file=sys.stderr)
        spec = None

    # output names: scan basename, disambiguated by the parent directory
    # when basenames collide (e.g. frame 000001.bin from two sequences)
    def stem(path):
        return os.path.splitext(os.path.basename(path))[0]

    writer = None
    if args.submission:
        from coarse3d_tpu.eval.submission import SubmissionWriter

        if args.train_ids and cfg.data.dataset in ("semantic_kitti",
                                                   "semantic_poss"):
            raise SystemExit("--submission writes raw ids; drop --train_ids")

        def seq_of(path):
            # .../sequences/NN/velodyne/FFFFFF.bin -> NN; nuScenes tokens
            # are the file stem (path_info convention: ("nusc", token))
            if cfg.data.dataset == "nuscenes":
                return "nusc"
            parts = os.path.abspath(path).split(os.sep)
            if len(parts) >= 3 and parts[-2] == "velodyne":
                return parts[-3]
            raise SystemExit(
                f"--submission needs scans under sequences/NN/velodyne/, "
                f"got {path}")

        writer = SubmissionWriter(args.out, cfg.data.dataset,
                                  label_spec=spec, split=args.split)
        out_names = {p: (seq_of(p), stem(p)) for p in paths}
    else:
        names = [stem(p) for p in paths]
        if len(set(names)) < len(names):
            names = [
                f"{os.path.basename(os.path.dirname(os.path.abspath(p)))}"
                f"_{stem(p)}" for p in paths]
            if len(set(names)) < len(names):
                raise SystemExit(
                    "output filenames collide even with parent-directory "
                    "prefixes; pass scans from distinct directories or "
                    "rename")
        out_names = {p: n + ".label" for p, n in zip(paths, names)}

    os.makedirs(args.out, exist_ok=True)
    bs = args.batch_size
    for start in range(0, len(paths), bs):
        chunk = paths[start:start + bs]
        pts, msk, counts = [], [], []
        for path in chunk:
            scan = read_scan(path)
            counts.append(scan.shape[0])
            pp, vv = pad_points(scan, cfg.data.max_points, fill=0.0)
            pts.append(pp)
            msk.append(vv)
        # fixed batch shape: repeat the last scan into any tail slots so
        # every chunk reuses the one compiled program
        while len(pts) < bs:
            pts.append(pts[-1])
            msk.append(msk[-1])
        labels = np.asarray(infer(jnp.asarray(np.stack(pts)),
                                  jnp.asarray(np.stack(msk))))
        for j, path in enumerate(chunk):
            pred = labels[j, :counts[j]].astype(np.int32)
            if writer is not None:
                seq_id, frame_id = out_names[path]
                writer.write(seq_id, frame_id, pred)  # unmaps internally
            else:
                if spec is not None:
                    pred = spec.unmap_labels(pred).astype(np.int32)
                pred.tofile(os.path.join(args.out, out_names[path]))
        print(f"{min(start + bs, len(paths))}/{len(paths)} scans")
    if writer is not None:
        writer.finalize()
    print(f"wrote {len(paths)} prediction files -> {args.out}")


if __name__ == "__main__":
    main()
