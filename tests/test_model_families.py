"""RangeNet + SqueezeSegV3 shape/behavior tests (the reference's __main__
smoke blocks check output shapes on random 40x1800 input,
rangenet_proto.py:679-710, squeezesegv3_Proto.py:835-867)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coarse3d_tpu.models.rangenet import RangeNet
from coarse3d_tpu.models.squeezesegv3 import SqueezeSegV3, unfold3x3

B, H, W, C = 1, 16, 64, 8


def _run(model, shape=(B, H, W, 5), feat=True):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False,
                           return_feat=feat)
    out = model.apply(variables, x, train=False, return_feat=feat)
    return variables, out


def test_rangenet_shapes():
    model = RangeNet(n_classes=C, layers=21, dtype=jnp.float32)
    variables, out = _run(model)
    assert out["logits"].shape == (B, H, W, C)
    assert out["embedding"].shape == (B, H, W, 256)
    np.testing.assert_allclose(np.asarray(out["probs"].sum(-1)), 1.0,
                               atol=1e-5)
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    # darknet21 is ~25M params + projector
    assert 20e6 < n < 35e6, n


def test_rangenet_width_only_strides():
    # H=13 (not divisible by anything) must work: strides are width-only
    model = RangeNet(n_classes=C, layers=21, dtype=jnp.float32)
    _, out = _run(model, shape=(1, 13, 64, 5), feat=False)
    assert out["logits"].shape == (1, 13, 64, C)


def test_rangenet_poss_padding():
    model = RangeNet(n_classes=C, layers=21, dtype=jnp.float32, pad_w=24)
    _, out = _run(model, shape=(1, 8, 40, 5), feat=False)  # 40+24=64 = /32*2
    assert out["logits"].shape == (1, 8, 40, C)


def test_squeezesegv3_shapes():
    model = SqueezeSegV3(n_classes=C, layers=21, dtype=jnp.float32)
    variables, out = _run(model)
    assert out["logits"].shape == (B, H, W, C)
    assert out["embedding"].shape == (B, H, W, 256)
    np.testing.assert_allclose(np.asarray(out["probs"].sum(-1)), 1.0,
                               atol=1e-5)


def test_unfold3x3_torch_order():
    """channel order must be c*9 + k, k row-major over the 3x3 window —
    torch F.unfold semantics that released checkpoints depend on."""
    x = np.arange(2 * 3 * 4 * 2, dtype=np.float32).reshape(2, 3, 4, 2)
    out = np.asarray(unfold3x3(jnp.asarray(x)))
    assert out.shape == (2, 3, 4, 18)
    # center tap (k=4) of channel c equals the input
    for c in range(2):
        np.testing.assert_array_equal(out[..., c * 9 + 4], x[..., c])
    # k=0 is the (-1,-1) shifted view with zero padding
    np.testing.assert_array_equal(out[:, 0, :, 0], 0)
    np.testing.assert_array_equal(out[:, 1:, 1:, 0], x[:, :-1, :-1, 0])


def test_build_model_dispatch():
    from coarse3d_tpu.train.setup import build_model
    from tests.test_train_step import tiny_config

    cfg = tiny_config()
    for net in ("salsanext", "rangenet", "squeezesegv3"):
        c = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, net_type=net))
        model = build_model(c)
        assert model.__class__.__name__.lower().startswith(net[:5])
