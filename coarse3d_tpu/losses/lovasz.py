"""Lovász-Softmax loss (Berman et al. 2018) as a fixed-shape masked jnp op.

Behavioral model: /root/reference/pc_processor/loss/lovasz_softmax.py with the
trainer's config (ignore=0, per_image=False, softmax=False,
classes='present', trainer.py:362-364).

TPU design: the reference boolean-filters valid pixels then Python-loops over
present classes, sorting each class's errors (lovasz_softmax.py:101-134).
Here all classes are handled by one vmapped descending sort over the full
padded pixel set; invalid pixels get error -1 so they sort to the tail where
the Lovász gradient is identically zero, and absent classes are masked out of
the final mean. No dynamic shapes, no host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _per_class_loss(fg: jnp.ndarray, pred: jnp.ndarray, valid: jnp.ndarray):
    """Lovász extension for one binary foreground problem.

    fg/pred/valid: (N,) float/float/bool. Invalid entries must not influence
    the loss; they are forced to the sort tail where grad == 0.
    """
    errors = jnp.abs(fg - pred)
    errors = jnp.where(valid, errors, -1.0)
    order = jnp.argsort(-errors)
    errors_s = errors[order]
    fg_s = fg[order]
    valid_s = valid[order].astype(fg.dtype)

    gts = fg.sum()
    intersection = gts - jnp.cumsum(fg_s)
    union = gts + jnp.cumsum((1.0 - fg_s) * valid_s)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    grad = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    loss = jnp.dot(jnp.where(valid_s > 0, errors_s, 0.0), grad)
    present = gts > 0
    return loss, present


def lovasz_budget_overflow(
    labels: jnp.ndarray, ignore: int, budget: int
) -> jnp.ndarray:
    """Valid pixels beyond the `budget` sort cap of lovasz_softmax_loss.

    The budgeted loss silently drops surplus valid pixels (see
    `lovasz_softmax_loss`); this scalar makes the "exact as long as it
    fits" claim observable — any value > 0 means the loss was truncated
    and `train.lovasz_budget` must be raised. Shares the loss's exact
    validity semantics (flattened `labels != ignore`); the reference sorts
    every valid pixel and cannot truncate (lovasz_softmax.py:101-134).
    """
    n_valid = jnp.sum(labels.reshape(-1) != ignore)
    return jnp.maximum(n_valid - budget, 0).astype(jnp.int32)


def lovasz_softmax_loss(
    probs: jnp.ndarray,
    labels: jnp.ndarray,
    ignore: int = 0,
    classes: str = "present",
    budget: int | None = None,
) -> jnp.ndarray:
    """Multi-class Lovász-Softmax.

    Args:
      probs: (..., C) class probabilities.
      labels: (...,) int ground truth.
      ignore: void label dropped from the flattened pixel set.
      classes: 'present' averages only over classes present among valid
        pixels (reference default); 'all' averages over every class.
      budget: optional cap on valid pixels. The supervision labels are weak
        (~0.1% of pixels), but the fixed-shape masked sort otherwise runs
        over EVERY pixel — C sorts of B*H*W elements dominate the train step
        (~500 ms/step at KITTI scale on v5e). One cheap validity argsort +
        gather shrinks the per-class sorts to `budget` elements; exact as
        long as the valid count fits (surplus pixels are dropped).
    """
    c = probs.shape[-1]
    flat_p = probs.reshape(-1, c).astype(jnp.float32)
    flat_l = labels.reshape(-1).astype(jnp.int32)
    valid = flat_l != ignore

    if budget is not None and budget < flat_l.shape[0]:
        order = jnp.argsort(jnp.where(valid, 0, 1).astype(jnp.int8),
                            stable=True)
        sel = order[:budget]
        flat_p = flat_p[sel]
        flat_l = flat_l[sel]
        valid = valid[sel]

    fg_all = jax.nn.one_hot(flat_l, c, dtype=jnp.float32) * valid[:, None]

    losses, present = jax.vmap(
        _per_class_loss, in_axes=(1, 1, None), out_axes=0
    )(fg_all, flat_p, valid)

    if classes == "present":
        weight = present.astype(jnp.float32)
    else:
        weight = jnp.ones_like(losses)
    total = (losses * weight).sum()
    count = weight.sum()
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)
