"""Tests for the contrastive stack: class gathers, masked Sinkhorn,
prototype EMA update, entropy-driven pseudo-label selection, InfoNCE."""

import jax
import jax.numpy as jnp
import numpy as np

from coarse3d_tpu.configs.config import ContrastConfig
from coarse3d_tpu.losses.contrast import contrast_mem_loss, sample_anchors
from coarse3d_tpu.losses.entropy_selection import entropy_based_selection
from coarse3d_tpu.models.prototypes import (
    l2_normalize,
    prototype_similarity,
    update_prototypes,
)
from coarse3d_tpu.ops.gather import gather_class_indices, rank_within_class
from coarse3d_tpu.ops.sinkhorn import masked_sinkhorn


# ---------------------------------------------------------------------------
# gather ops
# ---------------------------------------------------------------------------

def test_gather_class_indices(rng):
    n, c, m = 500, 6, 32
    labels = rng.integers(0, c, n)
    valid = rng.random(n) < 0.7
    idx, mask = gather_class_indices(
        jnp.asarray(labels), jnp.asarray(valid), c, m)
    idx, mask = np.asarray(idx), np.asarray(mask)
    for cls in range(c):
        want = np.where((labels == cls) & valid)[0]
        got = idx[cls][mask[cls]]
        take = min(len(want), m)
        assert mask[cls].sum() == take
        np.testing.assert_array_equal(np.sort(got), np.sort(want[:take]))


def test_gather_budget_overflow(rng):
    labels = np.zeros(100, np.int32)
    valid = np.ones(100, bool)
    idx, mask = gather_class_indices(
        jnp.asarray(labels), jnp.asarray(valid), 3, 16)
    assert np.asarray(mask)[0].sum() == 16
    assert np.asarray(mask)[1:].sum() == 0


def test_rank_within_class(rng):
    n, c = 300, 5
    scores = rng.normal(size=n).astype(np.float32)
    labels = rng.integers(0, c, n)
    valid = rng.random(n) < 0.8
    ranks, counts = rank_within_class(
        jnp.asarray(scores), jnp.asarray(labels), jnp.asarray(valid), c)
    ranks, counts = np.asarray(ranks), np.asarray(counts)
    for cls in range(c):
        sel = (labels == cls) & valid
        assert counts[cls] == sel.sum()
        # ranks within the class are a permutation of 0..count-1 ordered by
        # descending score
        r = ranks[sel]
        order = np.argsort(-scores[sel])
        np.testing.assert_array_equal(np.sort(r), np.arange(sel.sum()))
        np.testing.assert_array_equal(r[order], np.arange(sel.sum()))
    assert (ranks[~valid] == n).all()


# ---------------------------------------------------------------------------
# masked sinkhorn
# ---------------------------------------------------------------------------

def _np_sinkhorn_plan(sim, iters=3, eps=0.05):
    """Reference transport plan (sinkhorn.py:5-27) on a dense valid block."""
    q = np.exp(sim / eps).T  # (K, B)
    b = q.shape[1]
    k = q.shape[0]
    q /= q.sum()
    for _ in range(iters):
        q /= q.sum(axis=1, keepdims=True)
        q /= k
        q /= q.sum(axis=0, keepdims=True)
        q /= b
    q *= b
    return q.T  # (B, K)


def test_masked_sinkhorn_matches_dense(rng):
    m, k, nv = 64, 8, 40
    sim = rng.normal(size=(m, k)).astype(np.float32) * 0.3
    valid = np.zeros(m, bool)
    valid[:nv] = True
    onehot, index = masked_sinkhorn(
        jnp.asarray(sim), jnp.asarray(valid), jax.random.key(0))
    want_plan = _np_sinkhorn_plan(sim[:nv])
    # noise-free index must match the dense-reference argmax
    np.testing.assert_array_equal(
        np.asarray(index)[:nv], want_plan.argmax(1))
    assert (np.asarray(index)[nv:] == 0).all()
    oh = np.asarray(onehot)
    # valid rows: one-hot; invalid rows: all-zero
    np.testing.assert_array_equal(oh[:nv].sum(1), np.ones(nv))
    assert oh[nv:].sum() == 0


def test_masked_sinkhorn_balanced_assignment(rng):
    # sinkhorn should spread mass across prototypes, not collapse
    m, k = 256, 8
    sim = rng.normal(size=(m, k)).astype(np.float32) * 0.1
    valid = np.ones(m, bool)
    _, index = masked_sinkhorn(
        jnp.asarray(sim), jnp.asarray(valid), jax.random.key(1))
    occupancy = np.bincount(np.asarray(index), minlength=k)
    assert (occupancy > 0).sum() >= k // 2


# ---------------------------------------------------------------------------
# prototype update
# ---------------------------------------------------------------------------

def _proto_setup(rng, b=2, h=8, w=16, c=5, k=4, d=32):
    protos = l2_normalize(
        jnp.asarray(rng.normal(size=(c, k, d)), jnp.float32))
    emb = jnp.asarray(rng.normal(size=(b, h, w, d)), jnp.float32)
    label = jnp.asarray(rng.integers(0, c, (b, h, w)), jnp.int32)
    mask = jnp.asarray(rng.random((b, h, w)) < 0.5)
    return protos, emb, label, mask


def test_update_prototypes_norms_and_shape(rng):
    protos, emb, label, mask = _proto_setup(rng)
    cfg = ContrastConfig(max_pixels_per_class=64)
    new = update_prototypes(protos, emb, label, mask, jax.random.key(0), cfg)
    assert new.shape == protos.shape
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(new), axis=-1), 1.0, rtol=1e-5)


def test_update_prototypes_ignore_class_frozen(rng):
    protos, emb, label, mask = _proto_setup(rng)
    cfg = ContrastConfig(max_pixels_per_class=64)
    new = update_prototypes(
        protos, emb, label, mask, jax.random.key(0), cfg, ignore_cls=0)
    # row 0 only re-normalized (already unit) -> unchanged
    np.testing.assert_allclose(
        np.asarray(new)[0], np.asarray(protos)[0], atol=1e-6)


def test_update_prototypes_absent_class_frozen(rng):
    protos, emb, label, mask = _proto_setup(rng)
    label = jnp.where(label == 3, 1, label)  # class 3 absent
    cfg = ContrastConfig(max_pixels_per_class=64)
    new = update_prototypes(
        protos, emb, label, mask, jax.random.key(0), cfg)
    np.testing.assert_allclose(
        np.asarray(new)[3], np.asarray(protos)[3], atol=1e-6)


def test_update_prototypes_ema_magnitude(rng):
    protos, emb, label, mask = _proto_setup(rng)
    fast = ContrastConfig(proto_momentum=0.0, max_pixels_per_class=64)
    slow = ContrastConfig(proto_momentum=0.999, max_pixels_per_class=64)
    new_fast = update_prototypes(
        protos, emb, label, mask, jax.random.key(0), fast)
    new_slow = update_prototypes(
        protos, emb, label, mask, jax.random.key(0), slow)
    d_fast = float(jnp.abs(new_fast - protos).sum())
    d_slow = float(jnp.abs(new_slow - protos).sum())
    assert d_fast > 10 * d_slow > 0


def test_prototype_similarity_shapes(rng):
    protos, emb, _, _ = _proto_setup(rng)
    feat, sim, nearest = prototype_similarity(emb, protos)
    n = emb.shape[0] * emb.shape[1] * emb.shape[2]
    assert feat.shape == (n, 32)
    assert sim.shape == (n, 5, 4)
    assert nearest.shape == (n, 5)
    assert float(jnp.abs(sim).max()) <= 1.0 + 1e-5


# ---------------------------------------------------------------------------
# entropy-based selection
# ---------------------------------------------------------------------------

def _selection_setup(rng, b=2, h=16, w=32, c=6):
    logits = rng.normal(size=(b, h, w, c)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    eval_mask = rng.random((b, h, w)) < 0.9
    train_label = np.where(
        rng.random((b, h, w)) < 0.01,
        rng.integers(1, c, (b, h, w)), 0).astype(np.int32)
    train_label = np.where(eval_mask, train_label, 0)
    wss_mask = train_label > 0
    return (jnp.asarray(probs), jnp.asarray(wss_mask), jnp.asarray(eval_mask),
            jnp.asarray(train_label))


def test_selection_preserves_ground_truth(rng):
    probs, wss, ev, tl = _selection_setup(rng)
    pseudo, mask = entropy_based_selection(
        probs, wss, ev, tl, 0.3, jax.random.key(0))
    np.testing.assert_array_equal(
        np.asarray(pseudo)[np.asarray(wss)], np.asarray(tl)[np.asarray(wss)])
    np.testing.assert_array_equal(
        np.asarray(mask), np.asarray(pseudo) != 0)


def test_selection_ratio_zero_keeps_only_gt(rng):
    probs, wss, ev, tl = _selection_setup(rng)
    pseudo, mask = entropy_based_selection(
        probs, wss, ev, tl, 0.0, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(pseudo), np.asarray(tl))


def test_selection_counts_bounded(rng):
    probs, wss, ev, tl = _selection_setup(rng)
    ratio = 0.25
    pseudo, _ = entropy_based_selection(
        probs, wss, ev, tl, ratio, jax.random.key(0))
    pseudo = np.asarray(pseudo)
    argmax = np.asarray(probs.argmax(-1))
    evn = np.asarray(ev)
    tln = np.asarray(tl)
    for b in range(pseudo.shape[0]):
        weak_classes = set(np.unique(tln[b])) - {0}
        for c in set(np.unique(pseudo[b])) - {0}:
            # expanded classes must appear in the image's weak labels
            assert c in weak_classes
            n_cand = ((argmax[b] == c) & evn[b]).sum()
            n_sel = ((pseudo[b] == c) & ~(tln[b] == c)).sum()
            assert n_sel <= int(n_cand * ratio) + 1


def test_selection_only_weak_present_classes_expand(rng):
    b, h, w, c = 1, 16, 32, 6
    probs = np.full((b, h, w, c), 1.0 / c, np.float32)
    probs[..., 3] = 0.9  # argmax everywhere class 3
    probs /= probs.sum(-1, keepdims=True)
    ev = np.ones((b, h, w), bool)
    tl = np.zeros((b, h, w), np.int32)
    tl[0, 0, 0] = 2  # only class 2 in weak labels
    pseudo, _ = entropy_based_selection(
        jnp.asarray(probs), jnp.asarray(tl > 0), jnp.asarray(ev),
        jnp.asarray(tl), 0.5, jax.random.key(0))
    # class 3 (not weak-present) must not be expanded
    assert not (np.asarray(pseudo) == 3).any()


def test_selection_prefers_low_entropy():
    """Gumbel top-k over exp(-entropy) (trainer.py:459-496): with half the
    image confidently predicted and half near-uniform, the confident half
    must dominate the expanded set. Regression for the flat composite-key
    quantization: a broken key layout would erase the score ordering."""
    b, h, w, c = 1, 32, 64, 6
    eps = 1e-4
    probs = np.full((b, h, w, c), 1.0 / c, np.float32)
    # left half: near-certain class 2 (entropy ~0, weight ~1); right half
    # stays near-uniform (entropy ln 6, weight exp(-ln 6) ~ 0.17) but still
    # argmaxes to class 2 by an epsilon tilt
    probs[:, :, : w // 2, :] = eps
    probs[:, :, : w // 2, 2] = 1.0 - eps * (c - 1)
    probs[:, :, w // 2:, 2] += eps
    probs /= probs.sum(-1, keepdims=True)
    ev = np.ones((b, h, w), bool)
    tl = np.zeros((b, h, w), np.int32)
    tl[0, 0, 0] = 2  # class 2 weak-present
    pseudo, _ = entropy_based_selection(
        jnp.asarray(probs), jnp.asarray(tl > 0), jnp.asarray(ev),
        jnp.asarray(tl), 0.3, jax.random.key(3))
    sel = np.asarray(pseudo) == 2
    left, right = sel[0, :, : w // 2].mean(), sel[0, :, w // 2:].mean()
    # every candidate is class 2, so ~30% of candidates are kept overall;
    # the Gumbel noise is O(1) so the ~6x weight ratio shows up as a strong
    # (not total) preference for the confident half
    assert left > 2.5 * right, (left, right)
    assert 0.2 < (left + right) / 2 < 0.4, (left, right)


# ---------------------------------------------------------------------------
# contrastive loss
# ---------------------------------------------------------------------------

def test_sample_anchors_respects_classes(rng):
    b, h, w, d, c, a = 2, 8, 16, 16, 5, 32
    emb = jnp.asarray(rng.normal(size=(b, h, w, d)), jnp.float32)
    probs = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32))
    labels = jnp.asarray(rng.integers(0, 3, (b, h, w)), jnp.int32)
    anchors, cls_ids, valid = sample_anchors(
        emb, probs, labels, jax.random.key(0), a)
    assert anchors.shape == (b, c, a, d)
    v = np.asarray(valid)
    for bb in range(b):
        present = set(np.unique(np.asarray(labels)[bb])) - {0}
        assert set(np.where(v[bb])[0]) == present
    # anchors of a valid class are drawn from that class's pixels
    emb_np = np.asarray(emb).reshape(b, -1, d)
    lbl_np = np.asarray(labels).reshape(b, -1)
    for bb in range(b):
        for cc in np.where(v[bb])[0]:
            cls_pix = emb_np[bb][lbl_np[bb] == cc]
            an = np.asarray(anchors)[bb, cc]
            # every anchor row equals some class pixel
            dists = np.abs(an[:, None, :] - cls_pix[None]).sum(-1).min(1)
            assert dists.max() < 1e-5


def test_contrast_loss_discriminates(rng):
    c, k, d = 5, 4, 16
    cfg = ContrastConfig(num_anchor=16, temperature=0.07)
    protos = l2_normalize(
        jnp.asarray(rng.normal(size=(c, k, d)), jnp.float32))
    b, h, w = 1, 8, 8
    labels = jnp.asarray(rng.integers(1, c, (b, h, w)), jnp.int32)
    probs = jnp.full((b, h, w, c), 1.0 / c)
    # embedding = its class's first prototype -> low loss
    emb_good = protos[np.asarray(labels).reshape(-1), 0].reshape(b, h, w, d)
    # embedding = a WRONG class's prototype -> high loss
    wrong = (np.asarray(labels).reshape(-1) % (c - 1)) + 1
    emb_bad = protos[wrong, 0].reshape(b, h, w, d)
    mask = jnp.ones((b, h, w), bool)
    l_good = contrast_mem_loss(
        emb_good, probs, labels, mask, protos, jax.random.key(0), cfg)
    l_bad = contrast_mem_loss(
        emb_bad, probs, labels, mask, protos, jax.random.key(0), cfg)
    assert float(l_good) < float(l_bad)
    assert np.isfinite(float(l_good)) and np.isfinite(float(l_bad))


def test_contrast_loss_empty_labels_is_zero(rng):
    c, k, d = 4, 3, 8
    cfg = ContrastConfig(num_anchor=8)
    protos = l2_normalize(
        jnp.asarray(rng.normal(size=(c, k, d)), jnp.float32))
    emb = jnp.asarray(rng.normal(size=(1, 4, 4, d)), jnp.float32)
    probs = jnp.full((1, 4, 4, c), 1.0 / c)
    labels = jnp.zeros((1, 4, 4), jnp.int32)
    mask = jnp.zeros((1, 4, 4), bool)
    loss = contrast_mem_loss(
        emb, probs, labels, mask, protos, jax.random.key(0), cfg)
    assert float(loss) == 0.0


def test_contrast_loss_grad_finite(rng):
    c, k, d = 4, 3, 8
    cfg = ContrastConfig(num_anchor=8)
    protos = l2_normalize(
        jnp.asarray(rng.normal(size=(c, k, d)), jnp.float32))
    probs = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(1, 4, 4, c)), jnp.float32))
    labels = jnp.asarray(rng.integers(0, c, (1, 4, 4)), jnp.int32)
    mask = labels > 0

    def f(emb):
        return contrast_mem_loss(
            emb, probs, labels, mask, protos, jax.random.key(0), cfg)

    emb = jnp.asarray(rng.normal(size=(1, 4, 4, d)), jnp.float32)
    g = jax.grad(f)(emb)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0


def test_anchor_sampling_follows_weights(rng):
    """CDF-inversion sampling must draw ∝ exp(-entropy^2) within a class."""
    b, h, w, d, c = 1, 1, 256, 4, 3
    emb = jnp.asarray(rng.normal(size=(b, h, w, d)), jnp.float32)
    labels = jnp.ones((b, h, w), jnp.int32)  # all class 1
    # half the pixels confident (low entropy -> high weight), half uniform
    probs = np.full((b, h, w, c), 1.0 / c, np.float32)
    probs[0, 0, :128, 0] = 0.98
    probs[0, 0, :128, 1:] = 0.01
    counts = np.zeros(w)
    for s in range(20):
        _, _, _ = None, None, None
        anchors_idx = None
        # reuse sample_anchors but recover indices by matching features
        a, _, valid = sample_anchors(
            emb, jnp.asarray(probs), labels, jax.random.key(s), 256)
        flat = np.asarray(emb).reshape(-1, d)
        an = np.asarray(a)[0, 1]
        idx = np.abs(an[:, None, :] - flat[None]).sum(-1).argmin(1)
        counts += np.bincount(idx, minlength=w)
    frac_confident = counts[:128].sum() / counts.sum()
    # weight ratio exp(-ent_low^2) vs exp(-ent_high^2): confident pixels
    # should dominate clearly
    assert frac_confident > 0.6, frac_confident


def test_sinkhorn_hard_sample_is_noise_dominated(rng):
    """Reference quirk (preserved): gumbel_softmax is applied to transport
    PROBABILITIES, not log-probabilities (sinkhorn.py:31), so O(1) gumbel
    noise dominates the O(1/B) plan values and the hard assignment is
    mostly random — unlike the noise-free argmax index."""
    m, k = 512, 8
    sim = rng.normal(size=(m, k)).astype(np.float32) * 0.3
    valid = np.ones(m, bool)
    onehot, index = masked_sinkhorn(
        jnp.asarray(sim), jnp.asarray(valid), jax.random.key(0))
    hard = np.asarray(onehot).argmax(1)
    agreement = (hard == np.asarray(index)).mean()
    # noise-free argmax and gumbel-hard agree barely above chance (1/k)
    assert agreement < 0.5, agreement
    assert agreement > 0.0


def test_selection_out_of_range_weak_label_does_not_leak():
    """Regression (flat-segment rewrite): a corrupt weak label gt >= C in
    image i maps to composite index i*(C+1) + gt, which lands inside image
    i+1's segment range while staying globally in bounds — it must be
    masked, not relied on mode='drop'."""
    b, h, w, c = 2, 16, 32, 6
    probs = np.full((b, h, w, c), 1.0 / c, np.float32)
    probs[..., 2] += 1e-3  # argmax everywhere class 2
    probs /= probs.sum(-1, keepdims=True)
    ev = np.ones((b, h, w), bool)
    tl = np.zeros((b, h, w), np.int32)
    # corrupt label: img0_seg + gt = 0*(c+1) + (c+3) lands in image 1's
    # range as class (c+3)-(c+1) = 2 — exactly image 1's argmax class
    tl[0, 0, 0] = c + 3
    wss = tl > 0
    pseudo, _ = entropy_based_selection(
        jnp.asarray(probs), jnp.asarray(wss), jnp.asarray(ev),
        jnp.asarray(tl), 0.5, jax.random.key(0))
    # image 1 has NO weak labels -> nothing may expand there
    assert not (np.asarray(pseudo)[1] != 0).any()
