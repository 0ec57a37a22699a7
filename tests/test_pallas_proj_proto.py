"""Interpret-mode equivalence tests for the two north-star Pallas kernels
(VERDICT r3 Missing #2): the single-pass projection scatter-min and the
fused prototype Sinkhorn/EMA tail. Compiled-mode performance is measured on
the real chip and recorded in PERF.md; these tests pin the semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coarse3d_tpu.configs.config import ContrastConfig, SensorSpec
from coarse3d_tpu.models.prototypes import l2_normalize, update_prototypes
from coarse3d_tpu.ops.pallas.proj_scatter import range_project_batch_pallas
from coarse3d_tpu.ops.pallas.proto_update import update_prototypes_fused
from coarse3d_tpu.ops.projection import range_project_batch


@pytest.fixture
def rng():
    return np.random.default_rng(3)


@pytest.mark.parametrize("sensor", [
    SensorSpec(proj_h=16, proj_w=128),   # hw multiple of 128
    SensorSpec(proj_h=10, proj_w=90),    # hw NOT a multiple (POSS-like)
])
def test_proj_scatter_matches_xla(rng, sensor):
    """Same lexicographic (depth, id) min -> bitwise-identical outputs."""
    b, p = 3, 1000
    pts = rng.normal(0, 8, (b, p, 5)).astype(np.float32)
    pts[:, 500:520] = pts[:, 100:120]  # force exact depth ties
    valid = rng.random((b, p)) > 0.1

    ref = range_project_batch(jnp.asarray(pts), jnp.asarray(valid), sensor)
    got = range_project_batch_pallas(
        jnp.asarray(pts), jnp.asarray(valid), sensor, interpret=True)
    for k in ref:
        np.testing.assert_array_equal(
            np.asarray(ref[k]), np.asarray(got[k]), err_msg=k)


def test_proj_scatter_mask_defect_flag(rng):
    """`mask_excludes_point0` replicates reference defect #4 identically."""
    sensor = SensorSpec(proj_h=16, proj_w=128)
    pts = rng.normal(0, 8, (2, 500, 5)).astype(np.float32)
    valid = np.ones((2, 500), bool)
    ref = range_project_batch(jnp.asarray(pts), jnp.asarray(valid), sensor,
                              mask_excludes_point0=True)
    got = range_project_batch_pallas(
        jnp.asarray(pts), jnp.asarray(valid), sensor,
        mask_excludes_point0=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref["proj_mask"]),
                                  np.asarray(got["proj_mask"]))


def test_fused_proto_update_matches_xla(rng):
    """Same Gumbel stream in, same memory out (float-assoc tolerance)."""
    c, k, d, m = 5, 4, 32, 64
    cfg = ContrastConfig(sub_proto_size=k, proj_dim=d,
                         max_pixels_per_class=m, proto_momentum=0.9)
    protos = jnp.asarray(rng.normal(size=(c, k, d)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(2, 8, 16, d)).astype(np.float32))
    lbl = jnp.asarray(rng.integers(0, c, (2, 8, 16)).astype(np.int32))
    msk = jnp.asarray(rng.random((2, 8, 16)) < 0.5)
    key = jax.random.key(7)

    ref = update_prototypes(protos, emb, lbl, msk, key, cfg, ignore_cls=0)
    got = update_prototypes_fused(protos, emb, lbl, msk, key, cfg,
                                  ignore_cls=0, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_fused_proto_update_empty_class_frozen(rng):
    """A class with no budgeted pixels keeps its (renormalized) old rows."""
    c, k, d, m = 5, 4, 32, 64
    cfg = ContrastConfig(sub_proto_size=k, proj_dim=d,
                         max_pixels_per_class=m, proto_momentum=0.9)
    protos = jnp.asarray(rng.normal(size=(c, k, d)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(2, 8, 16, d)).astype(np.float32))
    lbl = jnp.asarray(rng.integers(0, c, (2, 8, 16)).astype(np.int32))
    lbl = jnp.where(lbl == 3, 1, lbl)  # class 3 absent
    msk = jnp.asarray(rng.random((2, 8, 16)) < 0.5)

    got = update_prototypes_fused(protos, emb, lbl, msk, jax.random.key(0),
                                  cfg, ignore_cls=0, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got[3]),
        np.asarray(l2_normalize(protos.astype(jnp.float32))[3]), atol=1e-6)
