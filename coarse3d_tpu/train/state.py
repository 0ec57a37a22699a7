"""Training state pytree.

One donate-able pytree carries everything the reference spreads across
model/optimizer/scheduler/prototype objects (trainer.py:37-67,
salsanext_proto.py:322): params, BN running stats, optimizer state, the
(n_classes, sub_proto, proj_dim) prototype memory, the step counter and the
PRNG key. Orbax checkpoints this pytree wholesale.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    prototypes: jnp.ndarray  # (n_classes, sub_proto_size, proj_dim) f32
    rng: jax.Array
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, batch_stats):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=batch_stats,
            opt_state=new_opt_state,
        )


def init_prototypes(
    rng: jax.Array, n_classes: int, sub_proto_size: int, proj_dim: int
) -> jnp.ndarray:
    """Truncated-normal(std 0.02) init matching trunc_normal_ at
    salsanext_proto.py:325."""
    protos = (
        jax.random.truncated_normal(
            rng, -2.0, 2.0, (n_classes, sub_proto_size, proj_dim)) * 0.02
    )
    return protos.astype(jnp.float32)


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    input_shape: tuple[int, ...],
    n_classes: int,
    sub_proto_size: int = 20,
    proj_dim: int = 256,
) -> TrainState:
    init_rng, proto_rng, state_rng = jax.random.split(rng, 3)
    variables = model.init(
        {"params": init_rng},
        jnp.zeros(input_shape, jnp.float32),
        train=False,
        return_feat=True,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        prototypes=init_prototypes(
            proto_rng, n_classes, sub_proto_size, proj_dim),
        rng=state_rng,
        apply_fn=model.apply,
        tx=tx,
    )
