"""Numerical parity: converted reference torch weights must reproduce the
reference forward in our Flax models (validates conv/BN/PixelShuffle/
ConvTranspose/unfold layout conversions end-to-end).

The reference package is imported read-only (CPU, stubs for its missing
deps); nothing is copied. Skipped if /root/reference is absent.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference not mounted")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from coarse3d_tpu.tools.convert_torch_ckpt import convert_state_dict  # noqa: E402

B, H, W, C = 1, 16, 64, 8


@pytest.fixture(scope="module")
def torch_ref():
    from tests._ref_stub import install_reference

    install_reference()
    import torch

    torch.manual_seed(0)
    return torch


def _randomize_bn_stats(torch, model):
    """Running stats at init are (0, 1); randomize so the parity test
    actually exercises the batch_stats conversion."""
    for mod in model.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 2.0)


def _state_dict_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _apply_flax(model_cls, converted, x_nhwc, **kw):
    model = model_cls(n_classes=C, dtype=jnp.float32, **kw)
    variables = {"params": converted["params"],
                 "batch_stats": converted["batch_stats"]}
    return model.apply(variables, jnp.asarray(x_nhwc), train=False,
                       return_feat=True)


def test_rangenet_forward_parity(torch_ref, rng):
    torch = torch_ref
    from pc_processor.models.rangenet_proto import RangeNetProto

    ref = RangeNetProto(layers=21, nclasses=C)
    ref.eval()
    _randomize_bn_stats(torch, ref)

    x = rng.normal(size=(B, 5, H, W)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), return_feat=True)
    want = out_ref["pred_2d"].numpy().transpose(0, 2, 3, 1)
    want_feat = out_ref["feat_2d"].numpy().transpose(0, 2, 3, 1)

    converted = convert_state_dict(_state_dict_np(ref), "rangenet", 21)
    assert "missing" not in converted, converted.get("missing")

    from coarse3d_tpu.models.rangenet import RangeNet

    out = _apply_flax(RangeNet, converted, x.transpose(0, 2, 3, 1), layers=21)
    np.testing.assert_allclose(np.asarray(out["probs"]), want,
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["embedding"]), want_feat,
                               atol=2e-3, rtol=1e-2)


def test_squeezesegv3_forward_parity(torch_ref, rng):
    torch = torch_ref
    from pc_processor.models.squeezesegv3_Proto import SqueezeSegV3Proto

    ref = SqueezeSegV3Proto(nclasses=C, layers=21)
    ref.eval()
    _randomize_bn_stats(torch, ref)

    x = rng.normal(size=(B, 5, H, W)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), return_feat=True)
    want = out_ref["pred_2d"].numpy().transpose(0, 2, 3, 1)
    want_feat = out_ref["feat_2d"].numpy().transpose(0, 2, 3, 1)

    converted = convert_state_dict(_state_dict_np(ref), "squeezesegv3", 21)
    assert "missing" not in converted, converted.get("missing")

    from coarse3d_tpu.models.squeezesegv3 import SqueezeSegV3

    out = _apply_flax(SqueezeSegV3, converted, x.transpose(0, 2, 3, 1),
                      layers=21)
    np.testing.assert_allclose(np.asarray(out["probs"]), want,
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["embedding"]), want_feat,
                               atol=2e-3, rtol=1e-2)


def test_salsanext_forward_parity(torch_ref, rng):
    """The shipped SalsaNextProto.forward overwrites its inputs with
    torch.randn(...).cuda() (SURVEY §5.1 defect #1), so the intended forward
    is reproduced here by composing the reference's own public submodules in
    the documented order (salsanext_proto.py:434-492)."""
    torch = torch_ref
    import torch.nn.functional as F

    from pc_processor.models.salsanext_proto import SalsaNextProto

    ref = SalsaNextProto(nclasses=C)
    ref.eval()
    _randomize_bn_stats(torch, ref)

    x_np = rng.normal(size=(B, 5, H, W)).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(x_np)
        c = ref.downCntx3(ref.downCntx2(ref.downCntx(x)))
        d0c, d0b = ref.resBlock1(c)
        d1c, d1b = ref.resBlock2(d0c)
        d2c, d2b = ref.resBlock3(d1c)
        d3c, d3b = ref.resBlock4(d2c)
        d5c = ref.resBlock5(d3c)
        u4 = ref.upBlock1(d5c, d3b)
        u3 = ref.upBlock2(u4, d2b)
        u2 = ref.upBlock3(u3, d1b)
        u1 = ref.upBlock4(u2, d0b)
        logits = ref.cls_head(u1)
        want = F.softmax(logits, dim=1).numpy().transpose(0, 2, 3, 1)

        h2, w2 = H // 2, W // 2
        feats = [F.interpolate(t, size=(h2, w2), mode="bilinear",
                               align_corners=True)
                 for t in (d0b, d1b, d2b, d3b)]
        emb = ref.projector(torch.cat(feats, 1))
        emb = F.normalize(emb, p=2, dim=1)
        emb = F.interpolate(emb, (H, W), mode="bilinear", align_corners=True)
        want_feat = emb.numpy().transpose(0, 2, 3, 1)

    converted = convert_state_dict(_state_dict_np(ref), "salsanext")
    assert "missing" not in converted, converted.get("missing")

    from coarse3d_tpu.models import SalsaNext

    out = _apply_flax(SalsaNext, converted, x_np.transpose(0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out["probs"]), want,
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["embedding"]), want_feat,
                               atol=2e-3, rtol=1e-2)


def test_prototypes_pass_through(torch_ref):
    from pc_processor.models.salsanext_proto import SalsaNextProto

    ref = SalsaNextProto(nclasses=C)
    converted = convert_state_dict(_state_dict_np(ref), "salsanext")
    assert converted["prototypes"].shape == (C, 20, 256)


# ---------------------------------------------------------------------------
# reverse direction: export our weights into the reference (MIGRATION round
# trip, tools/export_torch_ckpt.py)
# ---------------------------------------------------------------------------

def test_export_roundtrip_exact(rng):
    """export_state_dict must be the exact inverse of convert_state_dict on
    every parameter and batch statistic (no torch needed)."""
    import jax
    import jax.numpy as jnp

    from coarse3d_tpu.models import SalsaNext
    from coarse3d_tpu.tools.convert_torch_ckpt import (
        convert_state_dict,
        export_state_dict,
    )

    model = SalsaNext(n_classes=C, dtype=jnp.float32)
    variables = model.init(
        {"params": jax.random.key(7)},
        jnp.asarray(rng.normal(size=(1, H, W, 5)), jnp.float32), train=False,
        return_feat=True)
    variables = jax.tree.map(np.asarray, dict(variables))

    sd, missing = export_state_dict(variables, "salsanext")
    assert not missing, missing
    back = convert_state_dict(sd, "salsanext")
    assert "missing" not in back, back.get("missing")

    flat_a = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back["params"])[0]
    assert len(flat_a) == len(flat_b)
    for (ka, va), (kb, vb) in zip(flat_a, flat_b):
        assert ka == kb
        np.testing.assert_array_equal(va, vb, err_msg=str(ka))
    for (ka, va), (kb, vb) in zip(
            jax.tree_util.tree_flatten_with_path(variables["batch_stats"])[0],
            jax.tree_util.tree_flatten_with_path(back["batch_stats"])[0]):
        assert ka == kb
        np.testing.assert_array_equal(va, vb, err_msg=str(ka))


def test_export_into_reference_forward(torch_ref, rng):
    """Our randomly-initialized SalsaNext exported to a torch state_dict and
    loaded into the reference's own SalsaNextProto must reproduce our
    forward (composing the reference submodules as in
    test_salsanext_forward_parity — defect #1's debug block)."""
    torch = torch_ref
    import jax
    import jax.numpy as jnp
    import torch.nn.functional as F

    from pc_processor.models.salsanext_proto import SalsaNextProto

    from coarse3d_tpu.models import SalsaNext
    from coarse3d_tpu.tools.convert_torch_ckpt import export_state_dict

    model = SalsaNext(n_classes=C, dtype=jnp.float32)
    x_np = rng.normal(size=(B, 5, H, W)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.key(3)},
        jnp.asarray(x_np.transpose(0, 2, 3, 1)), train=False,
        return_feat=True)
    ours = model.apply(variables, jnp.asarray(x_np.transpose(0, 2, 3, 1)),
                       train=False)

    sd, missing = export_state_dict(
        jax.tree.map(np.asarray, dict(variables)), "salsanext")
    assert not missing, missing

    ref = SalsaNextProto(nclasses=C)
    result = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=False)
    # nothing unexpected; only reference-extra params may be missing
    assert not result.unexpected_keys, result.unexpected_keys
    allowed = ("feat_norm", "mask_norm", "prototypes", "fc", "proj")
    for k in result.missing_keys:
        assert k.startswith(allowed), k
    ref.eval()

    with torch.no_grad():
        x = torch.from_numpy(x_np)
        c = ref.downCntx3(ref.downCntx2(ref.downCntx(x)))
        d0c, d0b = ref.resBlock1(c)
        d1c, d1b = ref.resBlock2(d0c)
        d2c, d2b = ref.resBlock3(d1c)
        d3c, d3b = ref.resBlock4(d2c)
        d5c = ref.resBlock5(d3c)
        u4 = ref.upBlock1(d5c, d3b)
        u3 = ref.upBlock2(u4, d2b)
        u2 = ref.upBlock3(u3, d1b)
        u1 = ref.upBlock4(u2, d0b)
        want = F.softmax(ref.cls_head(u1), dim=1).numpy().transpose(
            0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(ours["probs"]), want,
                               atol=2e-4, rtol=1e-3)


def test_pretrain_checkpoint_conversion(torch_ref, tmp_path):
    """The published recipe warm-starts from an ImageNet-style pretrain
    checkpoint: encoder weights + classifier fc head, NO cls_head/projector
    (reference trainer.py:74-106 filters by name/shape against
    encoder_module.yaml; option.py:93-95). Synthesize that format, convert
    with the real CLI, load via --pretrained --only_encoder, and assert
    exactly the encoder tensors copied and a training step runs."""
    torch = torch_ref
    import flax.serialization
    import flax.traverse_util as tu
    import yaml

    from pc_processor.models.salsanext_proto import SalsaNextProto
    from coarse3d_tpu.tools.convert_torch_ckpt import main as convert_main

    ref = SalsaNextProto(nclasses=C)
    _randomize_bn_stats(torch, ref)
    full_sd = ref.state_dict()

    # the encoder key list the reference filters against
    with open("/root/reference/pc_processor/models/encoder_module.yaml") as f:
        encoder_keys = set(yaml.safe_load(f).values())
    pretrain_sd = {k: v for k, v in full_sd.items()
                   if k in encoder_keys and "num_batches" not in k}
    assert pretrain_sd, "encoder key list did not match any model keys"
    # classification pretrain checkpoints carry an fc head instead of the
    # segmentation cls_head; it must be ignored by the converter
    pretrain_sd["fc.weight"] = torch.zeros(1000, 256)
    pretrain_sd["fc.bias"] = torch.zeros(1000)
    pth = tmp_path / "pretrain.pth"
    torch.save({"model_state": pretrain_sd}, pth)

    # nested non-existent dir: the CLI must create it (the baseline_matrix
    # runbook points --out into <work>/converted/)
    out = tmp_path / "converted" / "pretrain.msgpack"
    convert_main(["--pth", str(pth), "--net", "salsanext",
                  "--out", str(out)])
    conv = flax.serialization.msgpack_restore(out.read_bytes())

    # converted tree holds exactly the encoder scopes
    flat = tu.flatten_dict(conv["params"], sep="/")
    from coarse3d_tpu.models.salsanext import ENCODER_PREFIXES
    assert flat and all(k.startswith(ENCODER_PREFIXES) for k in flat), (
        sorted(flat)[:5])

    # drive the real warm-start seam: tiny synthetic run, encoder-only load
    from coarse3d_tpu.tools.train import main as train_main

    save = tmp_path / "run"
    train_main(["--preset", "tiny", "--synthetic", "4",
                "--synthetic_points", "1500", "--epochs", "1",
                "--batch_size", "2", "--num_workers", "1",
                "--save_path", str(save),
                "--pretrained", str(out), "--only_encoder"])
    log = (save / "log" / "console.log").read_text()
    assert f"loaded {len(flat)} pretrained tensors" in log, (
        [ln for ln in log.splitlines() if "pretrained" in ln])
    assert "(encoder only)" in log
    assert "Validation done" in log and "nan" not in log.lower()

    # the loaded encoder kernel matches torch's layout-converted weights
    import orbax.checkpoint  # noqa: F401  (ensure checkpoint deps present)
    want = (full_sd["downCntx.conv1.weight"].numpy()
            .transpose(2, 3, 1, 0))
    got = flat["ResContextBlock_0/Conv_0/kernel"]
    np.testing.assert_allclose(got, want, atol=0)
