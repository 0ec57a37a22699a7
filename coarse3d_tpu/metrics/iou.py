"""Streaming confusion-matrix metrics (IoU / Acc / Recall).

Behavioral model: /root/reference/pc_processor/metrics/iou_eval.py:9-109 —
rows = predictions, cols = targets, ignore rows/cols zeroed before stats,
mean over included classes.

TPU design: the reference accumulates on the CPU via index_put_ (its `device`
arg is ignored — SURVEY §5.1 defect #7). Here the matrix is a device
scatter-add inside jit; under pjit the cross-replica reduction is a plain sum
of sharded partial matrices, which fixes the reference's distributed-metric
inaccuracy (it averaged per-rank mean IoUs, trainer.py:735-747) while staying
one collective.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def confusion_matrix(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    n_classes: int,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(C, C) int32 confusion counts; rows = pred, cols = target."""
    p = pred.reshape(-1).astype(jnp.int32)
    t = target.reshape(-1).astype(jnp.int32)
    flat = p * n_classes + t
    if valid is not None:
        # out-of-range index + mode='drop' discards masked elements
        flat = jnp.where(valid.reshape(-1), flat, n_classes * n_classes)
    conf = jnp.zeros((n_classes * n_classes,), jnp.int32)
    conf = conf.at[flat].add(1, mode="drop")
    return conf.reshape(n_classes, n_classes)


def _stats(conf: jnp.ndarray, ignore: tuple[int, ...]):
    conf = conf.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    for ig in ignore:
        conf = conf.at[ig, :].set(0.0)
        conf = conf.at[:, ig].set(0.0)
    tp = jnp.diag(conf)
    fp = conf.sum(axis=1) - tp
    fn = conf.sum(axis=0) - tp
    return tp, fp, fn


def _include_mask(n_classes: int, ignore: tuple[int, ...]) -> jnp.ndarray:
    mask = jnp.ones((n_classes,), bool)
    for ig in ignore:
        mask = mask.at[ig].set(False)
    return mask


def iou_from_confusion(conf: jnp.ndarray, ignore: tuple[int, ...] = (0,)):
    """Returns (mean IoU over included classes, per-class IoU)."""
    tp, fp, fn = _stats(conf, ignore)
    iou = tp / (tp + fp + fn + 1e-15)
    inc = _include_mask(conf.shape[0], ignore)
    mean = (iou * inc).sum() / inc.sum()
    return mean, iou


def acc_from_confusion(conf: jnp.ndarray, ignore: tuple[int, ...] = (0,)):
    """Per-class precision (tp / (tp + fp)), reference naming 'Acc'."""
    tp, fp, _ = _stats(conf, ignore)
    acc = tp / (tp + fp + 1e-15)
    inc = _include_mask(conf.shape[0], ignore)
    return (acc * inc).sum() / inc.sum(), acc


def recall_from_confusion(conf: jnp.ndarray, ignore: tuple[int, ...] = (0,)):
    tp, _, fn = _stats(conf, ignore)
    rec = tp / (tp + fn + 1e-15)
    inc = _include_mask(conf.shape[0], ignore)
    return (rec * inc).sum() / inc.sum(), rec


@dataclasses.dataclass
class ConfusionState:
    """Host-side accumulator mirroring the reference IOUEval lifecycle."""

    n_classes: int
    ignore: tuple[int, ...] = (0,)

    def __post_init__(self):
        self.reset()

    def reset(self):
        import numpy as np

        self.conf = np.zeros((self.n_classes, self.n_classes), dtype=np.int64)

    def add(self, conf_update) -> None:
        import numpy as np

        self.conf += np.asarray(conf_update, dtype=np.int64)

    def add_batch(self, pred, target, valid=None) -> None:
        self.add(confusion_matrix(
            jnp.asarray(pred), jnp.asarray(target), self.n_classes,
            None if valid is None else jnp.asarray(valid)))

    def iou(self):
        return iou_from_confusion(jnp.asarray(self.conf), self.ignore)

    def acc(self):
        return acc_from_confusion(jnp.asarray(self.conf), self.ignore)

    def recall(self):
        return recall_from_confusion(jnp.asarray(self.conf), self.ignore)
