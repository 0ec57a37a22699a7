"""Orbax checkpoint / resume.

Behavioral model: the reference's three flavors (SURVEY §5) — rolling
`checkpoint.pth` per epoch with {model, optimizer, scheduler, epoch}
(main.py:148-159), best-metric snapshots per metric key (main.py:124-145),
and one-way pretrained encoder loads (trainer.py:69-106). Prototypes live in
model state there (salsanext_proto.py:322) and in the TrainState pytree here,
so they checkpoint for free. The optax schedule is step-indexed, so restoring
`step` restores the LR schedule (the reference restores scheduler state).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from coarse3d_tpu.train.state import TrainState


def _to_saveable(state: TrainState, epoch: int) -> dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "prototypes": state.prototypes,
        "rng": jax.random.key_data(state.rng),
        "epoch": np.asarray(epoch, np.int32),
    }


class CheckpointManager:
    """Rolling + best-metric checkpoints under <save_path>/checkpoint."""

    def __init__(self, save_path: str, max_to_keep: int = 2):
        self.root = os.path.abspath(os.path.join(save_path, "checkpoint"))
        os.makedirs(self.root, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.root,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )
        self._best: dict[str, float] = {}

    def save_rolling(self, state: TrainState, epoch: int):
        self._mgr.save(
            epoch,
            args=ocp.args.StandardSave(_to_saveable(state, epoch)))
        self._mgr.wait_until_finished()

    def save_best(self, state: TrainState, epoch: int, metrics: dict):
        """Keep best_<key> snapshots when a tracked metric improves
        (main.py:124-145 semantics, keys e.g. 3DAcc / 3DIOU)."""
        improved = []
        for key, value in metrics.items():
            if value > self._best.get(key, float("-inf")):
                self._best[key] = value
                path = os.path.join(self.root, f"best_{key}")
                ckpt = ocp.StandardCheckpointer()
                if os.path.exists(path):
                    import shutil

                    shutil.rmtree(path)
                ckpt.save(path, _to_saveable(state, epoch))
                ckpt.wait_until_finished()
                improved.append(key)
        return improved

    def latest_epoch(self) -> int | None:
        return self._mgr.latest_step()

    def restore_best(self, state: TrainState, key: str = "3DIOU"
                     ) -> TrainState:
        """Restore a best_<key> snapshot (main.py:124-145's best model);
        the published BASELINE numbers are best-checkpoint numbers."""
        path = os.path.join(self.root, f"best_{key}")
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"no best_{key} snapshot under {self.root} (run had no "
                "validation epochs?) — use the rolling checkpoint instead")
        template = jax.tree.map(np.asarray, _to_saveable(state, 0))
        restored = ocp.StandardCheckpointer().restore(
            path, target=template)
        return state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            prototypes=restored["prototypes"],
            rng=jax.random.wrap_key_data(restored["rng"]),
        )

    def restore(self, state: TrainState, epoch: int | None = None
                ) -> tuple[TrainState, int]:
        """Restore into an abstract-compatible TrainState; returns
        (state, start_epoch)."""
        if epoch is None:
            epoch = self._mgr.latest_step()
        assert epoch is not None, "no checkpoint found"
        template = jax.tree.map(np.asarray, _to_saveable(state, 0))
        restored = self._mgr.restore(
            epoch, args=ocp.args.StandardRestore(template))
        new_state = state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            prototypes=restored["prototypes"],
            rng=jax.random.wrap_key_data(restored["rng"]),
        )
        return new_state, int(restored["epoch"]) + 1

    def close(self):
        self._mgr.close()


def restore_from_run_dir(state: TrainState, run_dir: str,
                         ckpt: str = "latest") -> TrainState:
    """Restore a tools-CLI checkpoint selection into `state`.

    `ckpt` is the CLI spelling: 'latest' (rolling) or a best-metric key
    like 'best_3DIOU' / '3DIOU'. Shared by evaluate / train_crf (both take
    --run_dir/--ckpt and must resolve them identically)."""
    mgr = CheckpointManager(run_dir)
    try:
        if ckpt == "latest":
            state, _ = mgr.restore(state)
        else:
            state = mgr.restore_best(state, key=ckpt.removeprefix("best_"))
    finally:
        mgr.close()
    return state


def load_pretrained_params(
    state: TrainState, params_like, only_prefixes: tuple[str, ...] = ()
) -> tuple[TrainState, int]:
    """Shape-and-name-filtered pretrained load (trainer.py:87-102): copy any
    leaf whose path exists in the current params with matching shape;
    optionally restrict to paths starting with the given prefixes (the
    encoder_module.yaml analog)."""
    import flax.traverse_util as tu

    current = tu.flatten_dict(state.params, sep="/")
    incoming = tu.flatten_dict(params_like, sep="/")
    copied = 0
    for key, val in incoming.items():
        if only_prefixes and not key.startswith(only_prefixes):
            continue
        if key in current and current[key].shape == np.shape(val):
            current[key] = np.asarray(val, dtype=current[key].dtype)
            copied += 1
    new_params = tu.unflatten_dict(
        {tuple(k.split("/")): v for k, v in current.items()})
    return state.replace(params=new_params), copied
