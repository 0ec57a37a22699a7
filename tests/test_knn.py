"""Golden test for KNN post-processing against a naive NumPy transcription of
the reference algorithm (postproc/knn.py:54-142)."""

import jax.numpy as jnp
import numpy as np

from coarse3d_tpu.ops.knn import knn_postprocess, _inv_gaussian_kernel


def _np_reference_knn(proj_range, unproj_range, proj_argmax, px, py,
                      n_classes, knn=5, search=5, sigma=1.0, cutoff=1.0):
    h, w = proj_range.shape
    pad = (search - 1) // 2
    p = len(unproj_range)
    inv_gauss = _inv_gaussian_kernel(search, sigma)
    out = np.zeros(p, np.int64)
    for i in range(p):
        ranges, labels = [], []
        for ddy in range(-pad, pad + 1):
            for ddx in range(-pad, pad + 1):
                yy, xx = py[i] + ddy, px[i] + ddx
                if 0 <= yy < h and 0 <= xx < w:
                    ranges.append(proj_range[yy, xx])
                    labels.append(proj_argmax[yy, xx])
                else:  # zero padding (F.unfold semantics)
                    ranges.append(0.0)
                    labels.append(0)
        ranges = np.array(ranges, np.float64)
        labels = np.array(labels, np.int64)
        ranges[ranges < 0] = np.inf
        ranges[len(ranges) // 2] = unproj_range[i]
        dist = np.abs(ranges - unproj_range[i]) * inv_gauss
        top = np.argsort(dist, kind="stable")[:knn]
        klbl = labels[top]
        kdist = dist[top]
        klbl = np.where(kdist > cutoff, n_classes, klbl)
        votes = np.bincount(klbl, minlength=n_classes + 1)
        out[i] = votes[1:n_classes].argmax() + 1
    return out


def test_knn_matches_reference(rng):
    h, w, p, c = 12, 24, 200, 6
    proj_range = rng.uniform(1, 50, (h, w)).astype(np.float32)
    proj_range[rng.random((h, w)) < 0.3] = -1.0  # empty pixels
    proj_argmax = rng.integers(0, c, (h, w)).astype(np.int32)
    px = rng.integers(0, w, p).astype(np.int32)
    py = rng.integers(0, h, p).astype(np.int32)
    point_range = rng.uniform(1, 50, p).astype(np.float32)

    got = np.asarray(knn_postprocess(
        jnp.asarray(proj_range)[None], jnp.asarray(point_range)[None],
        jnp.asarray(proj_argmax)[None], jnp.asarray(px)[None],
        jnp.asarray(py)[None], n_classes=c))
    want = _np_reference_knn(
        proj_range, point_range, proj_argmax, px, py, c)

    # ties in distances / votes may break differently; require near-total
    agree = (got[0] == want).mean()
    assert agree > 0.97, agree


def test_knn_smooths_isolated_errors():
    # a lone wrong pixel inside a coherent region gets outvoted
    h, w, c = 8, 8, 5
    proj_range = np.full((h, w), 10.0, np.float32)
    proj_argmax = np.full((h, w), 2, np.int32)
    proj_argmax[4, 4] = 3  # isolated error
    px = np.array([4], np.int32)
    py = np.array([4], np.int32)
    point_range = np.array([10.0], np.float32)
    out = np.asarray(knn_postprocess(
        jnp.asarray(proj_range)[None], jnp.asarray(point_range)[None],
        jnp.asarray(proj_argmax)[None], jnp.asarray(px)[None],
        jnp.asarray(py)[None], n_classes=c))
    assert out[0, 0] == 2


def test_knn_center_survives_cutoff():
    # the center is replaced by the point's own range -> distance 0, so the
    # point's own pixel label always votes, regardless of cutoff
    h, w, c = 8, 8, 5
    proj_range = np.full((h, w), 100.0, np.float32)
    proj_argmax = np.full((h, w), 3, np.int32)
    px = np.array([4], np.int32)
    py = np.array([4], np.int32)
    point_range = np.array([1.0], np.float32)  # 99 away from every neighbor
    out = np.asarray(knn_postprocess(
        jnp.asarray(proj_range)[None], jnp.asarray(point_range)[None],
        jnp.asarray(proj_argmax)[None], jnp.asarray(px)[None],
        jnp.asarray(py)[None], n_classes=c, cutoff=1.0))
    assert out[0, 0] == 3


def test_knn_all_unlabeled_falls_back_to_class_one():
    # votes only on excluded class 0 -> argmax over empty votes -> class 1
    h, w, c = 8, 8, 5
    proj_range = np.full((h, w), 10.0, np.float32)
    proj_argmax = np.zeros((h, w), np.int32)
    px = np.array([4], np.int32)
    py = np.array([4], np.int32)
    point_range = np.array([10.0], np.float32)
    out = np.asarray(knn_postprocess(
        jnp.asarray(proj_range)[None], jnp.asarray(point_range)[None],
        jnp.asarray(proj_argmax)[None], jnp.asarray(px)[None],
        jnp.asarray(py)[None], n_classes=c))
    assert out[0, 0] == 1
