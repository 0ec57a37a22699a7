"""Post-hoc training of the CRF compatibility kernel on a frozen checkpoint.

The reference ships the locally-connected xyz CRF with a LEARNABLE (C, C)
compatibility conv (postproc/crf.py:96-103) but never wires or trains it;
with the untrained init the refinement measurably hurts (PARITY.md CRF
entry, −1.6 mIoU on the hard task). This tool settles whether the module is
salvageable (VERDICT r3 next #7): freeze a trained segmentation checkpoint,
and fit ONLY the compatibility matrix by cross-entropy of the CRF-refined
probabilities against the weak training labels — the only supervision the
weak-label setting legitimately has.

  python -m coarse3d_tpu.tools.train_crf --run_dir RUN --ckpt best_3DIOU \
      --synthetic 64 --synthetic_task hard ... --out RUN/crf_kernel.npz
  python -m coarse3d_tpu.tools.evaluate --run_dir RUN --ckpt best_3DIOU \
      --crf --crf_kernel RUN/crf_kernel.npz ...
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", required=True)
    p.add_argument("--ckpt", default="best_3DIOU")
    p.add_argument("--preset", default="semantic_kitti")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--batch_size", type=int)
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--synthetic_task", choices=("bands", "hard"),
                   default="hard")
    p.add_argument("--synthetic_points", type=int, default=0)
    p.add_argument("--synthetic_seed", type=int, default=0)
    p.add_argument("--synthetic_segments", type=int, default=None)
    p.add_argument("--synthetic_modes", type=int, default=None)
    p.add_argument("--synthetic_noise", type=float, default=None)
    p.add_argument("--synthetic_imbalance", type=float, default=None)
    p.add_argument("--weak", type=float, default=0.0001,
                   help="synthetic weak-label ratio (match the training run)")
    p.add_argument("--class_balance", action="store_true",
                   help="weight the weak-CE fit inversely to per-batch weak-"
                        "label class frequency. Under class imbalance the "
                        "unweighted fit is dominated by common-class labels "
                        "and the learned kernel smooths rare classes away "
                        "(campaigns/crf_imb: class-6 IoU 0.29 -> 0.00, "
                        "-5.8 mIoU); balancing makes every present class "
                        "contribute equally to the kernel objective")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SECTION.KEY=VALUE")
    p.add_argument("--out", required=True, help="output .npz kernel path")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from coarse3d_tpu.configs import apply_overrides, preset
    from coarse3d_tpu.data.pipeline import DataPipeline
    from coarse3d_tpu.parallel import make_mesh, replicate_to_mesh, shard_batch
    from coarse3d_tpu.postproc.crf import crf_refine, init_compat_kernel
    from coarse3d_tpu.train.checkpoint import restore_from_run_dir
    from coarse3d_tpu.train.setup import build_state
    from coarse3d_tpu.train.step import _prepare_inputs

    cfg = preset(args.preset)
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)

    if args.synthetic:
        from coarse3d_tpu.data.synthetic import (SyntheticDataset,
                                                 SyntheticHardDataset,
                                                 hard_task_kwargs)

        ds_kw = {}
        if args.synthetic_task == "hard":
            ds_cls = SyntheticHardDataset
            ds_kw.update(hard_task_kwargs(args))
        else:
            ds_cls = SyntheticDataset
        n_pts = args.synthetic_points or min(20000, cfg.data.max_points // 2)
        ds = ds_cls(args.synthetic, n_pts, cfg.data.n_classes, cfg.sensor,
                    weak_ratio=args.weak, seed=args.synthetic_seed, **ds_kw)
    else:
        from coarse3d_tpu.data.datasets import build_dataset

        ds = build_dataset(cfg, "train")

    bs = args.batch_size or cfg.train.batch_size_train * \
        jax.local_device_count()
    import math

    mesh = make_mesh(math.gcd(bs, jax.local_device_count()),
                     devices=jax.local_devices())
    # train=False: no augmentation — the 64-odd kernel params don't need it
    # and clean projections keep the xyz messages consistent across epochs
    pipe = DataPipeline(ds, cfg, bs, train=False,
                        num_workers=args.num_workers)

    state = build_state(cfg, jax.random.key(0), steps_per_epoch=1,
                        batch_size=bs)
    state = restore_from_run_dir(state, args.run_dir, args.ckpt)
    state = replicate_to_mesh(state, mesh)

    kernel = init_compat_kernel(cfg.data.n_classes, xyz_coef=0.1)
    opt = optax.adam(args.lr)
    opt_state = opt.init(kernel)

    def loss_fn(k, batch):
        features, train_label, _, wss_mask, eval_mask = _prepare_inputs(
            batch, cfg)
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            features, train=False, return_feat=False)
        probs = jax.nn.softmax(out["logits"].astype(jnp.float32), axis=-1)
        refined = crf_refine(
            batch["features"][..., 1:4].astype(jnp.float32), probs,
            eval_mask, k)
        logp = jnp.log(refined + 1e-10)
        picked = jnp.take_along_axis(
            logp, train_label[..., None], axis=-1)[..., 0]
        m = wss_mask.astype(jnp.float32)
        if args.class_balance:
            # inverse-frequency pixel weights from this batch's weak labels:
            # every class PRESENT in the batch contributes equally to the
            # kernel objective, so a 16x point-share skew cannot teach the
            # kernel to smooth rare classes away (--class_balance help)
            n_cls = cfg.data.n_classes
            onehot = jax.nn.one_hot(train_label, n_cls,
                                    dtype=jnp.float32) * m[..., None]
            counts = onehot.sum(axis=(0, 1, 2))
            present = counts > 0
            w_cls = jnp.where(present, 1.0 / jnp.maximum(counts, 1.0), 0.0)
            w_cls = w_cls / jnp.maximum(present.sum(), 1)
            m = m * w_cls[train_label]
            return -(picked * m).sum() / jnp.maximum(m.sum(), 1e-12)
        return -(picked * m).sum() / jnp.maximum(m.sum(), 1.0)

    @jax.jit
    def step(k, o, batch):
        loss, grads = jax.value_and_grad(loss_fn)(k, batch)
        updates, o = opt.update(grads, o)
        return optax.apply_updates(k, updates), o, loss

    history = []
    for epoch in range(args.epochs):
        losses = []
        for host_batch in pipe.epoch(epoch):
            batch = shard_batch(host_batch, mesh)
            kernel, opt_state, loss = step(kernel, opt_state, batch)
            losses.append(loss)
        mean = float(jnp.mean(jnp.stack(losses)))
        history.append(round(mean, 5))
        print(f"epoch {epoch + 1}/{args.epochs} weak-CE {mean:.5f}",
              flush=True)

    out_dir = os.path.dirname(args.out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    np.savez(args.out, kernel=np.asarray(kernel),
             history=np.asarray(history, np.float32))
    print(json.dumps({"out": args.out, "history": history}))
    return {"kernel": np.asarray(kernel), "history": history}


if __name__ == "__main__":
    main()
