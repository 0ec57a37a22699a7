"""Export coarse3d_tpu weights back to a reference-loadable torch .pth.

The reverse of tools/convert_torch_ckpt.py: weights trained in this
framework (an Orbax run dir from tools/train.py, or a .msgpack) are mapped
onto the reference's module names/layouts so they drop into
`SalsaNextProto` / `RangeNetProto` / `SqueezeSegV3Proto` via
`load_state_dict` (the reference restores checkpoints through
`checkpoint["model_state"]`, trainer.py:108-133). Round-trip numerics are
pinned by tests/test_torch_parity.py::test_export_roundtrip*.

  python -m coarse3d_tpu.tools.export_torch_ckpt --run_dir runs/v1.0 \
      --preset semantic_kitti --out model.pth
  python -m coarse3d_tpu.tools.export_torch_ckpt --msgpack converted.msgpack \
      --net salsanext --n_classes 20 --out model.pth
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--run_dir", help="training run dir (Orbax checkpoint)")
    src.add_argument("--msgpack", help="flax .msgpack variables")
    p.add_argument("--preset", default="semantic_kitti",
                   help="config preset (for --run_dir state restore)")
    p.add_argument("--net", default=None,
                   choices=["salsanext", "rangenet", "squeezesegv3"],
                   help="overrides the preset's net_type for --msgpack")
    p.add_argument("--layers", type=int, default=21)
    p.add_argument("--n_classes", type=int)
    p.add_argument("--out", required=True, help=".pth output")
    args = p.parse_args(argv)

    import numpy as np
    import torch

    from coarse3d_tpu.configs import preset
    from coarse3d_tpu.tools.convert_torch_ckpt import export_state_dict

    cfg = preset(args.preset)
    net = args.net or cfg.model.net_type

    if args.msgpack:
        import flax.serialization

        with open(args.msgpack, "rb") as f:
            variables = flax.serialization.msgpack_restore(f.read())
        if "cls_head_s2d" in variables.get("params", {}):
            raise SystemExit(
                "these weights use the s2d stem (cls_head_s2d present); "
                "only the parity stem maps onto the reference architecture")
        epoch = None
    else:
        import dataclasses

        import jax

        from coarse3d_tpu.train.checkpoint import CheckpointManager
        from coarse3d_tpu.train.setup import build_state

        if args.n_classes:
            cfg = dataclasses.replace(
                cfg, data=dataclasses.replace(cfg.data,
                                              n_classes=args.n_classes))
        if cfg.model.stem != "parity":
            raise SystemExit("only the parity stem maps onto the reference "
                             "architecture (got stem="
                             f"{cfg.model.stem!r})")
        state = build_state(cfg, jax.random.key(0), steps_per_epoch=1,
                            batch_size=1)
        ckpt = CheckpointManager(args.run_dir)
        state, epoch = ckpt.restore(state)
        ckpt.close()
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats,
                     "prototypes": state.prototypes}

    sd, missing = export_state_dict(variables, net, args.layers)
    if missing:
        print(f"WARNING: {len(missing)} flax paths absent: {missing[:5]}...")
    torch_sd = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}
    torch.save({"model_state": torch_sd, "epoch": epoch}, args.out)
    print(f"exported {len(sd)} tensors -> {args.out} "
          f"(reference load: model.load_state_dict("
          f"torch.load(...)['model_state'], strict=False))")


if __name__ == "__main__":
    main()
