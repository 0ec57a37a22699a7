"""Golden tests for focal + Lovász losses against NumPy re-derivations of the
published formulas (reference behavior: focal_softmax.py, lovasz_softmax.py
with trainer.py:348-364 settings)."""

import jax.numpy as jnp
import numpy as np

from coarse3d_tpu.losses import (
    focal_alpha_from_counts,
    focal_softmax_loss,
    lovasz_softmax_loss,
)


def _np_focal(probs, target, alpha, mask, gamma):
    p = probs.reshape(-1, probs.shape[-1])
    t = target.reshape(-1)
    pt = p[np.arange(len(t)), t]
    logp = np.log(np.clip(pt, 1e-6, None))
    loss = -((1 - pt) ** gamma) * logp * alpha[t]
    m = mask.reshape(-1).astype(np.float64)
    return (loss * m).sum() / m.sum()


def _np_lovasz_grad(gt_sorted):
    gts = gt_sorted.sum()
    intersection = gts - np.cumsum(gt_sorted)
    union = gts + np.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / union
    out = jaccard.copy()
    out[1:] = jaccard[1:] - jaccard[:-1]
    return out


def _np_lovasz(probs, labels, ignore=0):
    """Published Lovász-Softmax, classes='present', per_image=False."""
    c = probs.shape[-1]
    p = probs.reshape(-1, c)
    l = labels.reshape(-1)
    keep = l != ignore
    p, l = p[keep], l[keep]
    losses = []
    for cls in range(c):
        fg = (l == cls).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - p[:, cls])
        order = np.argsort(-errors, kind="stable")
        losses.append(np.dot(errors[order], _np_lovasz_grad(fg[order])))
    return np.mean(losses)


def test_focal_alpha_from_counts():
    counts = np.array([0.0, 1877, 9, 7809, 38])
    alpha = focal_alpha_from_counts(counts)
    assert alpha[0] == 0.0
    assert alpha.max() <= 1.0
    # rarer classes get larger alpha
    assert alpha[2] > alpha[1] > alpha[3]


def test_focal_matches_numpy(rng):
    b, h, w, c = 2, 8, 16, 7
    logits = rng.normal(size=(b, h, w, c))
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    target = rng.integers(0, c, (b, h, w))
    mask = rng.random((b, h, w)) < 0.2
    alpha = focal_alpha_from_counts(rng.integers(1, 100, c).astype(float))

    got = focal_softmax_loss(
        jnp.asarray(probs, jnp.float32), jnp.asarray(target),
        jnp.asarray(alpha), jnp.asarray(mask), gamma=2.0)
    want = _np_focal(probs, target, alpha, mask, 2.0)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_focal_empty_mask_is_zero(rng):
    probs = jnp.full((4, 5), 0.2)
    target = jnp.zeros((4,), jnp.int32)
    alpha = jnp.ones((5,))
    mask = jnp.zeros((4,), bool)
    assert float(focal_softmax_loss(probs, target, alpha, mask)) == 0.0


def test_lovasz_matches_numpy(rng):
    b, h, w, c = 2, 8, 16, 6
    logits = rng.normal(size=(b, h, w, c))
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    labels = rng.integers(0, c, (b, h, w))

    got = lovasz_softmax_loss(
        jnp.asarray(probs, jnp.float32), jnp.asarray(labels), ignore=0)
    want = _np_lovasz(probs, labels, ignore=0)
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_lovasz_absent_classes_skipped(rng):
    # only classes 1 and 2 appear; mean must be over those two only
    c = 10
    probs = rng.random((50, c))
    probs /= probs.sum(-1, keepdims=True)
    labels = rng.integers(1, 3, (50,))
    got = lovasz_softmax_loss(
        jnp.asarray(probs, jnp.float32), jnp.asarray(labels), ignore=0)
    want = _np_lovasz(probs, labels, ignore=0)
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_lovasz_all_ignore_is_zero():
    probs = jnp.full((10, 4), 0.25)
    labels = jnp.zeros((10,), jnp.int32)
    assert float(lovasz_softmax_loss(probs, labels, ignore=0)) == 0.0


def test_lovasz_grad_flows(rng):
    import jax

    probs = jnp.asarray(rng.random((20, 5)), jnp.float32)
    probs = probs / probs.sum(-1, keepdims=True)
    labels = jnp.asarray(rng.integers(0, 5, (20,)))
    g = jax.grad(lambda p: lovasz_softmax_loss(p, labels))(probs)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0


def test_lovasz_budget_exact_when_sparse(rng):
    """With valid pixels under the budget, the capped loss is exact."""
    n, c = 5000, 8
    probs = rng.random((n, c)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    labels = np.where(rng.random(n) < 0.01, rng.integers(1, c, n), 0)
    full = float(lovasz_softmax_loss(jnp.asarray(probs), jnp.asarray(labels)))
    capped = float(lovasz_softmax_loss(
        jnp.asarray(probs), jnp.asarray(labels), budget=512))
    np.testing.assert_allclose(capped, full, rtol=1e-6)


def test_lovasz_budget_overflow_detection(rng):
    """lovasz_budget_overflow: 0 while the valid set fits, exact surplus
    count (and an actually-different loss) once the sort budget truncates."""
    from coarse3d_tpu.losses.lovasz import lovasz_budget_overflow

    n, c = 4096, 8
    probs = rng.random((n, c)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    labels = rng.integers(1, c, n)  # every pixel valid
    labels[: n // 2] = 0            # half ignored -> n//2 valid

    assert int(lovasz_budget_overflow(jnp.asarray(labels), 0, n)) == 0
    assert int(lovasz_budget_overflow(jnp.asarray(labels), 0, n // 2)) == 0
    got = int(lovasz_budget_overflow(jnp.asarray(labels), 0, 512))
    assert got == n // 2 - 512

    # overflow > 0 coincides with real truncation: budgeted != full loss
    full = float(lovasz_softmax_loss(jnp.asarray(probs), jnp.asarray(labels)))
    capped = float(lovasz_softmax_loss(
        jnp.asarray(probs), jnp.asarray(labels), budget=512))
    assert abs(capped - full) > 1e-4
