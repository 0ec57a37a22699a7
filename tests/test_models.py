"""SalsaNext shape/behavior tests (reference smoke-block analog,
salsanext_proto.py __main__ checks output shapes on random input)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coarse3d_tpu.models import SalsaNext
from coarse3d_tpu.models.blocks import pixel_shuffle
from coarse3d_tpu.ops.resize import resize_bilinear

B, H, W, C = 2, 32, 64, 10


@pytest.fixture(scope="module")
def model_and_vars():
    model = SalsaNext(n_classes=C, dtype=jnp.float32)
    x = jnp.zeros((B, H, W, 5))
    variables = model.init(
        {"params": jax.random.key(0)}, x, train=False, return_feat=True)
    return model, variables


def test_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, H, W, 5)),
                    jnp.float32)
    out = model.apply(variables, x, train=False, return_feat=True)
    assert out["logits"].shape == (B, H, W, C)
    assert out["probs"].shape == (B, H, W, C)
    assert out["embedding"].shape == (B, H, W, 256)
    np.testing.assert_allclose(
        np.asarray(out["probs"].sum(-1)), 1.0, atol=1e-5)


def test_train_mode_updates_batch_stats(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.default_rng(1).normal(size=(B, H, W, 5)),
                    jnp.float32)
    out, mutated = model.apply(
        variables, x, train=True, return_feat=False,
        rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"])
    assert "batch_stats" in mutated
    # running stats moved away from init
    leaf = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    assert float(jnp.abs(leaf).sum()) > 0


def test_eval_deterministic(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.default_rng(2).normal(size=(B, H, W, 5)),
                    jnp.float32)
    o1 = model.apply(variables, x, train=False)
    o2 = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(o1["logits"]),
                                  np.asarray(o2["logits"]))


def test_poss_padding():
    # POSS: 40x1800 -> +8 pad internally, output depadded
    model = SalsaNext(n_classes=14, pad_hw=8, dtype=jnp.float32)
    x = jnp.zeros((1, 40, 120, 5))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["logits"].shape == (1, 40, 120, 14)


def test_pixel_shuffle_matches_torch_semantics():
    # out[b, h*r+i, w*r+j, c] == in[b, h, w, c*r*r + i*r + j]
    r, b, h, w, c = 2, 1, 2, 3, 2
    x = np.arange(b * h * w * c * r * r).reshape(b, h, w, c * r * r)
    y = np.asarray(pixel_shuffle(jnp.asarray(x), r))
    for i in range(r):
        for j in range(r):
            for cc in range(c):
                np.testing.assert_array_equal(
                    y[:, i::r, j::r, cc], x[..., cc * r * r + i * r + j])


def test_resize_bilinear_align_corners():
    # corners map exactly; midpoint interpolates linearly
    x = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 1, 4, 1))
    y = np.asarray(resize_bilinear(x, 1, 7))[0, 0, :, 0]
    np.testing.assert_allclose(y, np.linspace(0, 3, 7), rtol=1e-6)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 5, 9, 3)), jnp.float32)
    up = np.asarray(resize_bilinear(img, 9, 17))
    np.testing.assert_allclose(up[0, 0, 0], np.asarray(img)[0, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(up[0, -1, -1], np.asarray(img)[0, -1, -1],
                               rtol=1e-6)


def test_param_count_plausible(model_and_vars):
    _, variables = model_and_vars
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    # SalsaNext is ~6.7M params + ~0.7M projector at base 32
    assert 5e6 < n < 9e6, n


def test_dead_code_blocks_shapes():
    """Literal-completeness blocks (reference dead code rebuilt with shape
    tests, VERDICT missing #5): ProjectionV2-V4 (projector.py:31-84),
    CSAttention (layers/modules.py:30-56)."""
    from coarse3d_tpu.models.blocks import (
        CSAttention,
        ProjectionHeadV2,
        ProjectionHeadV3,
        ProjectionHeadV4,
    )

    x = jnp.ones((2, 8, 16, 12), jnp.float32)
    for cls in (ProjectionHeadV2, ProjectionHeadV3):
        m = cls(proj_dim=5)
        out, _ = m.init_with_output(jax.random.key(0), x)
        assert out.shape == (2, 8, 16, 5)
        assert out.dtype == jnp.float32
    # V4 reproduces the reference's scalar global-norm quirk exactly
    out4, _ = ProjectionHeadV4(proj_dim=5).init_with_output(
        jax.random.key(0), x)
    assert out4.shape == ()
    att = CSAttention(out_channels=6, stride=2, dtype=jnp.float32)
    out_a, _ = att.init_with_output(jax.random.key(0), x)
    assert out_a.shape == (2, 4, 8, 6)
    # sigmoid gate bounds the output by the |value branch|
    assert np.isfinite(np.asarray(out_a)).all()


def test_s2d_stem_variant():
    """Opt-in space-to-depth stem (ModelConfig.stem='s2d'): same output
    contract as the parity model at ~1/4 the spatial compute. Not
    reference-weight-compatible by design (PERF.md)."""
    import dataclasses

    from coarse3d_tpu.configs import preset
    from coarse3d_tpu.train.setup import build_model

    cfg = preset("tiny")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, stem="s2d",
                                       compute_dtype="float32"),
        sensor=dataclasses.replace(cfg.sensor, proj_h=32, proj_w=64))
    model = build_model(cfg)
    assert model.s2d_factors == (2, 2)
    # incompatible geometries fail fast at build time with a clear error
    bad = dataclasses.replace(
        cfg, sensor=dataclasses.replace(cfg.sensor, proj_h=16))
    with pytest.raises(ValueError, match="s2d"):
        build_model(bad)
    x = jnp.ones((2, 32, 64, 5), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False,
                           return_feat=True)
    out = model.apply(variables, x, train=False, return_feat=True)
    assert out["probs"].shape == (2, 32, 64, cfg.data.n_classes)
    assert out["embedding"].shape == (2, 32, 64, cfg.contrast.proj_dim)
    np.testing.assert_allclose(
        np.asarray(out["probs"]).sum(-1), 1.0, rtol=1e-5)
    # full-res internal stages are gone: no activation at (32, 64) between
    # stem and head — first conv runs on the (16, 32, 20) stacked grid
    params = variables["params"]
    first_kernel = params["ResContextBlock_0"]["Conv_0"]["kernel"]
    assert first_kernel.shape[2] == 20  # 5ch x 2x2


def test_s2d_w_stem_variant():
    """Width-only 1x2 space-to-depth (ModelConfig.stem='s2d_w'): full row
    resolution, half width — the middle ground after the 2x2 stem measured
    -12.3 pt on texture-carried tasks (PERF.md). Same output contract as
    the parity model."""
    import dataclasses

    from coarse3d_tpu.configs import preset
    from coarse3d_tpu.train.setup import build_model

    cfg = preset("tiny")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, stem="s2d_w",
                                       compute_dtype="float32"),
        sensor=dataclasses.replace(cfg.sensor, proj_h=16, proj_w=64))
    model = build_model(cfg)
    assert model.s2d_factors == (1, 2)
    # H must divide 16 (unchanged) but W must divide 32 — and an unknown
    # stem string fails fast
    bad = dataclasses.replace(
        cfg, sensor=dataclasses.replace(cfg.sensor, proj_w=48))
    with pytest.raises(ValueError, match="s2d_w"):
        build_model(bad)
    with pytest.raises(ValueError, match="unknown model.stem"):
        build_model(dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, stem="bogus")))
    x = jnp.ones((2, 16, 64, 5), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False,
                           return_feat=True)
    out = model.apply(variables, x, train=False, return_feat=True)
    assert out["probs"].shape == (2, 16, 64, cfg.data.n_classes)
    assert out["embedding"].shape == (2, 16, 64, cfg.contrast.proj_dim)
    np.testing.assert_allclose(
        np.asarray(out["probs"]).sum(-1), 1.0, rtol=1e-5)
    # first conv sees the (16, 32, 10) width-stacked grid: 5ch x 1x2
    params = variables["params"]
    first_kernel = params["ResContextBlock_0"]["Conv_0"]["kernel"]
    assert first_kernel.shape[2] == 10
    # the head predicts 1x2 logits per coarse pixel before pixel-shuffle
    head_kernel = params["cls_head_s2d"]["kernel"]
    assert head_kernel.shape[3] == 2 * cfg.data.n_classes
