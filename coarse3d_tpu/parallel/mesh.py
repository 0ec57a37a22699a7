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
    """Place a host batch dict on the mesh, sharded along the leading dim."""
    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate_to_mesh(tree: Any, mesh: Mesh):
    """Fully replicate a pytree (train state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
