"""Device mesh + sharding helpers (data parallelism).

Behavioral model: the reference's only parallelism is multi-process DDP over
NCCL — gradient all-reduce, SyncBN, prototype mean all-reduce, metric
all-reduce (SURVEY §2.2). The TPU-native equivalent is *sharding, not
processes*: one `Mesh` with a `data` axis, batches sharded on it, train state
replicated. Everything the reference does with explicit collectives falls out
of pjit semantics:

  - gradient all-reduce  -> mean over the global (sharded) batch;
  - SyncBN               -> BN stats are global-batch reductions;
  - prototype all-reduce -> the one-hot^T @ feats contraction is global;
  - metric all-reduce    -> the confusion scatter-add is global.

Collectives ride ICI within a slice and DCN across slices automatically.
Models here are 3-50M params (SURVEY §2.2), so TP/PP/SP/EP are intentionally
omitted; the mesh API keeps an `extra_axes` hook for future model axes.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    axis: str = "data",
    devices=None,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"make_mesh: requested {n_devices} devices but the "
                f"{devices[0].platform if devices else '?'} backend exposes "
                f"only {len(devices)}. For a virtual multi-device CPU mesh, "
                "set XLA_FLAGS=--xla_force_host_platform_device_count=N and "
                "force the cpu platform (jax.config.update('jax_platforms', "
                "'cpu')) BEFORE any jax backend initialization.")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch: dict[str, Any], mesh: Mesh, axis: str = "data"):
    """Place a host batch dict on the mesh, sharded along the leading dim.

    Single process: a plain device_put. Multi-process (mesh spans hosts —
    the DDP-launch analog): each process's batch is its *stripe* of the
    global batch (DataPipeline index-stripes scans per host), assembled into
    one global array via jax.make_array_from_process_local_data; device_put
    cannot express per-process data on a non-addressable sharding
    (tests/test_multiprocess.py::test_two_process_training)."""
    sharding = NamedSharding(mesh, P(axis))
    if sharding.is_fully_addressable:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }


def replicate_to_mesh(tree: Any, mesh: Mesh):
    """Fully replicate a pytree (train state) across the mesh.

    Multi-process meshes need make_array_from_callback (only addressable
    shards are materialized); every process holds the identical full value,
    e.g. a seeded build_state."""
    sharding = NamedSharding(mesh, P())
    if sharding.is_fully_addressable:
        return jax.device_put(tree, sharding)

    def put(v):
        if isinstance(v, jax.Array) and jax.dtypes.issubdtype(
                v.dtype, jax.dtypes.prng_key):
            data = put(np.asarray(jax.random.key_data(v)))
            return jax.random.wrap_key_data(
                data, impl=jax.random.key_impl(v))
        v = np.asarray(v)
        return jax.make_array_from_callback(
            v.shape, sharding, lambda idx: v[idx])

    return jax.tree.map(put, tree)
