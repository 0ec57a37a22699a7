"""Entropy-driven pseudo-label expansion.

Behavioral model: trainer.py:447-518 (`entropy_based_selection`): per-pixel
entropy from the softmax output gives sampling weights exp(-entropy); for
every class that appears in an image's *weak* labels, sample
floor(ratio * |pixels predicted as c|) of that class's predicted pixels
without replacement (probability ∝ weight); keep ground truth on weak pixels;
return the expanded pseudo label + its mask. The keep-ratio grows with epoch
(trainer.py:656-661, see train.step.select_ratio_schedule).

TPU design: `torch.multinomial(..., replacement=False)` per (image, class)
becomes one Gumbel perturbation + a rank-within-class computed from a SINGLE
sort of (class, quantized -score) composite int32 keys — Gumbel top-k is
exactly weighted sampling without replacement, and k varies per class as a
mask, not a shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

def _select_one_image(
    probs, wss_mask, eval_mask, train_label, select_ratio, rng, ignore_cls,
    n_classes,
):
    h, w, c = probs.shape
    n = h * w
    p = probs.reshape(n, c).astype(jnp.float32)
    entropy = -jnp.sum(p * jnp.log(p + 1e-10), axis=-1)
    pseudo = jnp.argmax(p, axis=-1).astype(jnp.int32)
    eval_m = eval_mask.reshape(n)
    wss_m = wss_mask.reshape(n)
    gt = train_label.reshape(n).astype(jnp.int32)

    pseudo = jnp.where(eval_m, pseudo, ignore_cls)

    # Gumbel top-k == multinomial without replacement over exp(-entropy):
    # score = log(weight) + G = -entropy + G.
    gumbel = jax.random.gumbel(rng, (n,), jnp.float32)
    score = -entropy + gumbel

    cand = eval_m & (pseudo != ignore_cls)
    # single-sort rank-within-class: quantize the score into the low bits of
    # a (class, -score) composite int32 key — one argsort instead of the two
    # chained ones in ops.gather.rank_within_class. The score already carries
    # O(1) gumbel noise, so 25-bit quantization (resolution ~5e-7 over the
    # clamped [-8, 8] range) is statistically invisible.
    q_bits = 25
    assert n_classes < (1 << (31 - q_bits))
    q = jnp.clip((score + 8.0) * ((1 << q_bits) / 16.0), 0,
                 (1 << q_bits) - 1).astype(jnp.int32)
    keys = jnp.where(
        cand, pseudo, n_classes) * (1 << q_bits) + ((1 << q_bits) - 1 - q)
    order = jnp.argsort(keys)
    sorted_cls = jnp.where(cand, pseudo, n_classes)[order]
    starts = jnp.searchsorted(
        sorted_cls, jnp.arange(n_classes + 1, dtype=jnp.int32),
        sorter=None)
    counts = (starts[1:] - starts[:-1])[:n_classes]
    pos_in_class = jnp.arange(n, dtype=jnp.int32) - starts[
        jnp.clip(sorted_cls, 0, n_classes)]
    ranks = jnp.full((n,), n, jnp.int32).at[order].set(pos_in_class)
    ranks = jnp.where(cand, ranks, n)

    # classes eligible for expansion: present among this image's weak labels
    weak_present = jnp.zeros((n_classes,), bool).at[
        jnp.where(wss_m, gt, ignore_cls)].set(True, mode="drop")
    weak_present = weak_present.at[ignore_cls].set(False)

    k_per_class = jnp.floor(
        counts.astype(jnp.float32) * select_ratio).astype(jnp.int32)
    k_eff = jnp.where(weak_present & (k_per_class >= 1), k_per_class, 0)

    selected = ranks < k_eff[pseudo]
    out = jnp.where(selected, pseudo, ignore_cls)
    out = jnp.where(wss_m, gt, out)  # ground truth always wins
    return out.reshape(h, w), (out != ignore_cls).reshape(h, w)


def entropy_based_selection(
    probs: jnp.ndarray,
    wss_mask: jnp.ndarray,
    eval_mask: jnp.ndarray,
    train_label: jnp.ndarray,
    select_ratio,
    rng: jax.Array,
    ignore_cls: int = 0,
):
    """Batched pseudo-label expansion.

    Args:
      probs: (B, H, W, C) softmax output.
      wss_mask: (B, H, W) bool weak-label mask.
      eval_mask: (B, H, W) bool valid-pixel mask.
      train_label: (B, H, W) int32 weak labels.
      select_ratio: scalar keep ratio in [0, 1].
      rng: PRNG key.

    Returns (pseudo_label (B, H, W) int32, pseudo_mask (B, H, W) bool).
    """
    b = probs.shape[0]
    n_classes = probs.shape[-1]
    rngs = jax.random.split(rng, b)
    ratio = jnp.asarray(select_ratio, jnp.float32)
    return jax.vmap(
        lambda p, wm, em, tl, r: _select_one_image(
            p, wm, em, tl, ratio, r, ignore_cls, n_classes)
    )(probs, wss_mask, eval_mask, train_label, rngs)
