"""Fixed-shape per-class index gathering.

The reference repeatedly takes dynamic boolean subsets per class
(`init_q = sim[label == c]`, salsanext_proto.py:354-359; per-class loops in
trainer.py:473-506 and contrast_pixel_loss.py:100-123). Dynamic shapes don't
exist under jit, so the TPU idiom here is: one stable sort groups pixels by
class, searchsorted finds each class's contiguous range, and every class gets
a fixed `budget`-sized slice of gather indices plus a validity mask. One
O(N log N) sort replaces C boolean filters, with no (C, N) blowup.
"""

from __future__ import annotations

import jax.numpy as jnp


def class_ranges(keys: jnp.ndarray, n_bins: int):
    """Sorted order + per-bin [start, count) over int keys in [0, n_bins)."""
    order = jnp.argsort(keys, stable=True)
    sorted_keys = keys[order]
    starts = jnp.searchsorted(sorted_keys, jnp.arange(n_bins + 1, dtype=keys.dtype))
    counts = starts[1:] - starts[:-1]
    return order, sorted_keys, starts[:-1], counts


def gather_class_indices(
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    n_classes: int,
    budget: int,
):
    """For each class c, up to `budget` indices of elements with label c.

    Args:
      labels: (N,) int32 class ids.
      valid: (N,) bool; invalid elements are never selected.
      n_classes: number of classes (bins).
      budget: fixed per-class capacity M.

    Returns:
      idx: (n_classes, M) int32 indices into the flat input (clipped
        placeholders where invalid).
      mask: (n_classes, M) bool validity. If a class has more than `budget`
        elements the surplus is dropped (stable order).
    """
    n = labels.shape[0]
    keys = jnp.where(valid, labels.astype(jnp.int32), n_classes)
    order, _, starts, counts = class_ranges(keys, n_classes)
    pos = starts[:, None] + jnp.arange(budget, dtype=jnp.int32)[None, :]
    mask = jnp.arange(budget)[None, :] < counts[:, None]
    idx = order[jnp.clip(pos, 0, n - 1)]
    return idx.astype(jnp.int32), mask


def rank_within_class(
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    n_classes: int,
):
    """Rank of each element among same-class peers by descending score.

    Implements "top-k within every class at once" without materializing a
    (C, N) matrix: sort by score desc, stable re-sort by class, subtract the
    class's start offset. Invalid elements get rank N.

    Returns (ranks (N,), counts (n_classes,)).
    """
    n = scores.shape[0]
    keys = jnp.where(valid, labels.astype(jnp.int32), n_classes)
    perm1 = jnp.argsort(-scores, stable=True)
    keys1 = keys[perm1]
    perm2 = jnp.argsort(keys1, stable=True)
    order = perm1[perm2]            # grouped by class, desc score inside
    sorted_keys = keys1[perm2]
    starts = jnp.searchsorted(
        sorted_keys, jnp.arange(n_classes + 1, dtype=jnp.int32))
    counts = (starts[1:] - starts[:-1])[:n_classes]
    pos_in_class = jnp.arange(n, dtype=jnp.int32) - starts[
        jnp.clip(sorted_keys, 0, n_classes)]
    ranks = jnp.full((n,), n, jnp.int32).at[order].set(pos_in_class)
    ranks = jnp.where(valid, ranks, n)
    return ranks, counts
