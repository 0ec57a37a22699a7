"""Data-parallel sharding tests on 8 virtual CPU devices (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coarse3d_tpu.parallel import make_mesh, replicate_to_mesh, shard_batch
from coarse3d_tpu.train.setup import build_alpha, build_state
from coarse3d_tpu.train.step import make_eval_step, make_train_step
from tests.test_train_step import tiny_config


@pytest.fixture(scope="module")
def mesh_setup():
    assert jax.device_count() >= 8, "conftest must fake 8 CPU devices"
    cfg = tiny_config()
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    from coarse3d_tpu.data.synthetic import synthetic_batch

    batch = synthetic_batch(rng, cfg, batch_size=8, n_points=2000,
                            weak_ratio=0.01)
    state = build_state(cfg, jax.random.key(0), steps_per_epoch=10,
                        batch_size=8)
    return cfg, mesh, batch, state


def test_sharded_full_train_step(mesh_setup):
    cfg, mesh, batch, state = mesh_setup
    sharded = shard_batch(batch, mesh)
    rstate = replicate_to_mesh(state, mesh)
    step = jax.jit(make_train_step(cfg, build_alpha(cfg),
                                   with_contrast=True))
    new_state, metrics = step(rstate, sharded, 0.25)
    assert np.isfinite(float(metrics["losses"]["total"]))
    # batch shards across devices, params replicated
    feat_shard = sharded["features"].sharding
    assert feat_shard.spec == jax.sharding.PartitionSpec("data")
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_matches_single_device(mesh_setup):
    """Global-batch semantics: the 8-way sharded step must equal the
    unsharded step bit-for-bit up to reduction order (SyncBN, global
    gradients, global confusion)."""
    cfg, mesh, batch, state = mesh_setup
    step_fn = make_train_step(cfg, build_alpha(cfg), with_contrast=False)

    single_state, single_metrics = jax.jit(step_fn)(
        state, {k: jnp.asarray(v) for k, v in batch.items()})

    sharded = shard_batch(batch, mesh)
    rstate = replicate_to_mesh(state, mesh)
    multi_state, multi_metrics = jax.jit(step_fn)(rstate, sharded)

    np.testing.assert_allclose(
        float(single_metrics["losses"]["total"]),
        float(multi_metrics["losses"]["total"]), rtol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(single_metrics["confusion"]),
        np.asarray(multi_metrics["confusion"]))
    # parameters after one update agree to fp tolerance
    s_leaves = jax.tree_util.tree_leaves(single_state.params)
    m_leaves = jax.tree_util.tree_leaves(multi_state.params)
    for a, b in zip(s_leaves, m_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_graft_entry_dryrun_impl():
    """In-process dryrun body on the conftest-provided 8-device backend."""
    import __graft_entry__

    __graft_entry__._dryrun_multichip_impl(8)


def test_make_mesh_raises_on_too_few_devices():
    with pytest.raises(RuntimeError, match="requested 16 devices"):
        make_mesh(16)


def test_graft_entry_dryrun_from_foreign_backend():
    """Regression for MULTICHIP_r01: the driver calls dryrun_multichip(8)
    in a process whose jax already initialized on a 1-device platform.
    dryrun_multichip must succeed anyway (it re-execs a clean subprocess
    with a forced 8-device CPU backend)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # Simulate the driver: 1-device CPU backend fully initialized before
    # the entry is invoked (stands in for the 1-device axon TPU platform).
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert jax.device_count() == 1, jax.devices()\n"
        "import sys\n"
        f"sys.path.insert(0, {repo!r})\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                          capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip(8)" in proc.stdout and "OK" in proc.stdout


def test_prototype_ddp_parity_mode(mesh_setup):
    """ContrastConfig.ddp_parity_protos replicates the reference's DDP sync
    (salsanext_proto.py:397-400): per-replica Sinkhorn/EMA on the local
    batch shard with a per-rank RNG, then a mean all-reduce with NO final
    re-normalization. The shard_map path must equal a hand-rolled loop over
    the 8 shards."""
    import dataclasses

    from coarse3d_tpu.models.prototypes import (update_prototypes,
                                                update_prototypes_ddp_parity)

    import dataclasses as _dc

    cfg, mesh, batch, state = mesh_setup
    # low momentum so per-rank updates visibly diverge (at the recipe's
    # 0.999 the no-renorm quirk is real but ~1e-6 in magnitude)
    ccfg = _dc.replace(cfg.contrast, proto_momentum=0.5)
    c = cfg.data.n_classes
    emb_dim = ccfg.proj_dim
    rng = np.random.default_rng(3)
    b, h, w = batch["train_label"].shape
    embedding = jnp.asarray(rng.normal(size=(b, h, w, emb_dim)),
                            jnp.float32)
    # dense labels so every rank's update touches most classes (the weak
    # labels would leave most prototype rows untouched on every rank)
    label = jnp.asarray(batch["eval_label"], jnp.int32)
    mask = label > 0
    protos = jnp.asarray(rng.normal(size=(c, ccfg.sub_proto_size, emb_dim)),
                         jnp.float32)
    key = jax.random.key(7)

    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = lambda x: jax.device_put(x, NamedSharding(mesh, P("data")))
    got = jax.jit(lambda *a: update_prototypes_ddp_parity(
        a[0], a[1], a[2], a[3], a[4], ccfg, mesh=mesh))(
            jax.device_put(protos, NamedSharding(mesh, P())),
            shard(embedding), shard(label), shard(mask), key)

    # hand-rolled reference semantics: one update per shard, then the mean
    per_rank = []
    for r in range(8):
        sl = slice(r * b // 8, (r + 1) * b // 8)
        per_rank.append(update_prototypes(
            protos, embedding[sl], label[sl], mask[sl],
            jax.random.fold_in(key, r), ccfg))
    want = jnp.stack(per_rank).mean(axis=0)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)
    # the mean of per-rank l2-normalized memories is NOT unit-norm (the
    # reference quirk preserved: no renorm after all_reduce)
    norms = np.linalg.norm(np.asarray(got), axis=-1)
    assert not np.allclose(norms, 1.0, atol=1e-3)

    # and the flag drives the full jitted train step
    pcfg = dataclasses.replace(
        cfg, contrast=dataclasses.replace(ccfg, ddp_parity_protos=True))
    step = jax.jit(make_train_step(pcfg, build_alpha(pcfg),
                                   with_contrast=True, mesh=mesh))
    rstate = replicate_to_mesh(state, mesh)
    new_state, metrics = step(rstate, shard_batch(batch, mesh), 0.25)
    assert np.isfinite(float(metrics["losses"]["total"]))
    assert not bool(jnp.allclose(new_state.prototypes, rstate.prototypes))

    with pytest.raises(ValueError, match="mesh"):
        make_train_step(pcfg, build_alpha(pcfg), with_contrast=True)
