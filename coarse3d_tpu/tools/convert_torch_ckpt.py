"""Convert released PyTorch COARSE3D checkpoints to coarse3d_tpu variables.

Behavioral model: the reference loads .pth state dicts with shape/name
filtering (trainer.py:69-133); released checkpoints
(best_{3DAcc,3DIOU}_model.pth) drive BASELINE config #1. This tool maps every
reference parameter name to the corresponding Flax module path and converts
layouts:

  conv          (O, I, kh, kw)  -> kernel (kh, kw, I, O)
  conv_transpose(I, O, kh, kw)  -> kernel (kh, kw, I, O)
  batchnorm     weight/bias     -> params scale/bias
                running_mean/var-> batch_stats mean/var
  prototypes    (C, K, D)       -> TrainState.prototypes unchanged

feat_norm / mask_norm LayerNorm affines are dropped: they never receive
gradients in the shipped trainer (contrast_logits unused), so they stay at
identity init — our parameter-free LayerNorm is numerically identical.

CLI:
  python -m coarse3d_tpu.tools.convert_torch_ckpt \
      --pth best_3DIOU_model.pth --net salsanext --n_classes 20 \
      --out converted.msgpack
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np


@dataclasses.dataclass(frozen=True)
class Entry:
    kind: str            # conv | convT | bn
    torch_prefix: str    # e.g. "downCntx.conv1"
    flax_path: tuple[str, ...]  # module path, e.g. ("ResContextBlock_0", "Conv_0")


def _conv(t, f):
    return [Entry("conv", t, tuple(f.split("/")))]


def _convT(t, f):
    return [Entry("convT", t, tuple(f.split("/")))]


def _bn(t, f):
    return [Entry("bn", t, tuple(f.split("/")))]


def _cab(torch_conv, torch_bn, flax_scope):
    """One reference conv+bn pair -> flax ConvActBN scope."""
    return (_conv(torch_conv, f"{flax_scope}/Conv_0")
            + _bn(torch_bn, f"{flax_scope}/BatchNorm_0"))


def _projector(prefix="projector"):
    return (_conv(f"{prefix}.proj.0", f"{prefix}/Conv_0")
            + _bn(f"{prefix}.proj.1", f"{prefix}/BatchNorm_0")
            + _conv(f"{prefix}.proj.3", f"{prefix}/Conv_1"))


def salsanext_entries() -> list[Entry]:
    e: list[Entry] = []
    for i, name in enumerate(["downCntx", "downCntx2", "downCntx3"]):
        scope = f"ResContextBlock_{i}"
        e += _conv(f"{name}.conv1", f"{scope}/Conv_0")
        e += _cab(f"{name}.conv2", f"{name}.bn1", f"{scope}/ConvActBN_0")
        e += _cab(f"{name}.conv3", f"{name}.bn2", f"{scope}/ConvActBN_1")
    for i in range(5):
        name, scope = f"resBlock{i + 1}", f"ResBlock_{i}"
        e += _conv(f"{name}.conv1", f"{scope}/Conv_0")
        for j in range(4):
            e += _cab(f"{name}.conv{j + 2}", f"{name}.bn{j + 1}",
                      f"{scope}/ConvActBN_{j}")
    for i in range(4):
        name, scope = f"upBlock{i + 1}", f"UpBlock_{i}"
        for j in range(4):
            e += _cab(f"{name}.conv{j + 1}", f"{name}.bn{j + 1}",
                      f"{scope}/ConvActBN_{j}")
    e += _conv("cls_head", "cls_head")
    e += _projector()
    return e


def _basic_block(torch_prefix, flax_scope):
    return (_cab(f"{torch_prefix}.conv1", f"{torch_prefix}.bn1",
                 f"{flax_scope}/ConvBN_0")
            + _cab(f"{torch_prefix}.conv2", f"{torch_prefix}.bn2",
                   f"{flax_scope}/ConvBN_1"))


# residual block counts per darknet depth
_BLOCKS = {21: (1, 1, 2, 2, 1), 53: (1, 2, 8, 8, 4)}


def rangenet_entries(layers: int = 21) -> list[Entry]:
    blocks = _BLOCKS[layers]
    e: list[Entry] = []
    e += _cab("backbone.conv1", "backbone.bn1", "ConvBN_0")
    bb = 0
    for s in range(5):
        e += _cab(f"backbone.enc{s + 1}.conv", f"backbone.enc{s + 1}.bn",
                  f"ConvBN_{s + 1}")
        for i in range(blocks[s]):
            e += _basic_block(f"backbone.enc{s + 1}.residual_{i}",
                              f"BasicBlock_{bb}")
            bb += 1
    for d in range(5):
        dec = f"decoder.dec{5 - d}"
        e += _convT(f"{dec}.upconv", f"UpConvBN_{d}/ConvTranspose_0")
        e += _bn(f"{dec}.bn", f"UpConvBN_{d}/BatchNorm_0")
        e += _basic_block(f"{dec}.residual", f"BasicBlock_{bb}")
        bb += 1
    e += _conv("head.1", "cls_head")
    e += _projector()
    return e


def _sac_block(torch_prefix, flax_scope):
    return (
        _conv(f"{torch_prefix}.attention_x.0", f"{flax_scope}/attention_conv")
        + _bn(f"{torch_prefix}.attention_x.1", f"{flax_scope}/attention_bn")
        + _conv(f"{torch_prefix}.position_mlp_2.0", f"{flax_scope}/Conv_0")
        + _bn(f"{torch_prefix}.position_mlp_2.1", f"{flax_scope}/BatchNorm_0")
        + _conv(f"{torch_prefix}.position_mlp_2.3", f"{flax_scope}/Conv_1")
        + _bn(f"{torch_prefix}.position_mlp_2.4", f"{flax_scope}/BatchNorm_1")
    )


def squeezesegv3_entries(layers: int = 21) -> list[Entry]:
    blocks = _BLOCKS[layers]
    e: list[Entry] = []
    e += _cab("backbone.conv1", "backbone.bn1", "ConvBN_0")
    sac = 0
    conv_bn = 1
    downsampled = (True, True, True, False, False)
    for s in range(5):
        for i in range(blocks[s]):
            e += _sac_block(f"backbone.enc{s + 1}.residual_{i}",
                            f"SACBlock_{sac}")
            sac += 1
        if downsampled[s]:
            e += _cab(f"backbone.enc{s + 1}.conv", f"backbone.enc{s + 1}.bn",
                      f"ConvBN_{conv_bn}")
            conv_bn += 1
    bb = 0
    up = 0
    for d, stride2 in zip(range(5), (False, False, True, True, True)):
        dec = f"decoder.dec{5 - d}"
        if stride2:
            e += _convT(f"{dec}.upconv", f"UpConvBN_{up}/ConvTranspose_0")
            e += _bn(f"{dec}.bn", f"UpConvBN_{up}/BatchNorm_0")
            up += 1
        else:
            e += _cab(f"{dec}.conv", f"{dec}.bn", f"ConvBN_{conv_bn}")
            conv_bn += 1
        e += _basic_block(f"{dec}.residual", f"BasicBlock_{bb}")
        bb += 1
    e += _conv("head5.1", "head5")
    e += _projector()
    return e


_ENTRIES = {
    "salsanext": lambda layers: salsanext_entries(),
    "rangenet": rangenet_entries,
    "squeezesegv3": squeezesegv3_entries,
}


def convert_state_dict(state_dict, net_type: str, layers: int = 21):
    """torch state_dict (name -> np array) -> {"params", "batch_stats",
    "prototypes"} nested dicts in coarse3d_tpu layout."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    # the reference sometimes nests under "model" / "model_state"
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    missing = []
    for entry in _ENTRIES[net_type](layers):
        t, path = entry.torch_prefix, entry.flax_path
        if entry.kind in ("conv", "convT"):
            w = sd.get(f"{t}.weight")
            if w is None:
                missing.append(t)
                continue
            if entry.kind == "conv":
                kernel = w.transpose(2, 3, 1, 0)   # (O,I,kh,kw)->(kh,kw,I,O)
            else:
                # (I,O,kh,kw)->(kh,kw,I,O), spatially flipped: torch's
                # transposed conv convolves (flips) where flax correlates
                kernel = w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()
            put(params, path + ("kernel",), kernel)
            if f"{t}.bias" in sd:
                put(params, path + ("bias",), sd[f"{t}.bias"])
        elif entry.kind == "bn":
            if f"{t}.weight" not in sd:
                missing.append(t)
                continue
            put(params, path + ("scale",), sd[f"{t}.weight"])
            put(params, path + ("bias",), sd[f"{t}.bias"])
            put(batch_stats, path + ("mean",), sd[f"{t}.running_mean"])
            put(batch_stats, path + ("var",), sd[f"{t}.running_var"])

    out = {"params": params, "batch_stats": batch_stats}
    if "prototypes" in sd:
        out["prototypes"] = sd["prototypes"]
    if missing:
        out["missing"] = missing
    return out


def export_state_dict(variables, net_type: str, layers: int = 21):
    """Inverse of convert_state_dict: coarse3d_tpu variables -> a torch
    state_dict (name -> np array), so weights trained here can be loaded
    back into the reference's own modules (MIGRATION.md round trip).

    Args:
      variables: {"params": ..., "batch_stats": ...[, "prototypes": ...]}
        (parity stem; the s2d stem has no reference counterpart).

    Returns (state_dict, missing_flax_paths).
    """
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def get(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return np.asarray(node)

    sd: dict[str, np.ndarray] = {}
    missing: list[str] = []
    for entry in _ENTRIES[net_type](layers):
        t, path = entry.torch_prefix, entry.flax_path
        try:
            if entry.kind in ("conv", "convT"):
                kernel = get(params, path + ("kernel",))
                if entry.kind == "conv":
                    # (kh,kw,I,O) -> (O,I,kh,kw)
                    sd[f"{t}.weight"] = kernel.transpose(3, 2, 0, 1).copy()
                else:
                    # unflip, then (kh,kw,I,O) -> (I,O,kh,kw)
                    sd[f"{t}.weight"] = (
                        kernel[::-1, ::-1].transpose(2, 3, 0, 1).copy())
                node = params
                for p in path:
                    node = node[p]
                if "bias" in node:
                    sd[f"{t}.bias"] = np.asarray(node["bias"])
            else:
                sd[f"{t}.weight"] = get(params, path + ("scale",))
                sd[f"{t}.bias"] = get(params, path + ("bias",))
                sd[f"{t}.running_mean"] = get(batch_stats, path + ("mean",))
                sd[f"{t}.running_var"] = get(batch_stats, path + ("var",))
        except KeyError:
            missing.append("/".join(path))
    if "prototypes" in variables:
        sd["prototypes"] = np.asarray(variables["prototypes"])
    return sd, missing


def load_torch_state_dict(path: str):
    """Load a .pth and unwrap the reference's model/model_state nesting."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict):
        for key in ("model", "model_state", "state_dict"):
            if key in data:
                data = data[key]
                break
    return {k.removeprefix("module."): v.numpy()
            for k, v in data.items() if hasattr(v, "numpy")}


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pth", required=True)
    p.add_argument("--net", default="salsanext",
                   choices=["salsanext", "rangenet", "squeezesegv3"])
    p.add_argument("--layers", type=int, default=21)
    p.add_argument("--out", required=True, help=".msgpack output")
    args = p.parse_args(argv)

    import flax.serialization

    sd = load_torch_state_dict(args.pth)
    converted = convert_state_dict(sd, args.net, args.layers)
    missing = converted.pop("missing", [])
    if missing:
        print(f"WARNING: {len(missing)} reference layers absent: "
              f"{missing[:5]}...")
    out_dir = os.path.dirname(args.out)
    if out_dir:
        # callers like baseline_matrix point --out into <work>/converted/
        os.makedirs(out_dir, exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(converted))
    n = len(sd)
    print(f"converted {n} torch tensors -> {args.out}")


if __name__ == "__main__":
    main()
