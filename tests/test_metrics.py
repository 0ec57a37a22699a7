"""Confusion-matrix metric tests (reference behavior: iou_eval.py:9-109)."""

import jax.numpy as jnp
import numpy as np

from coarse3d_tpu.metrics import (
    ConfusionState,
    confusion_matrix,
    iou_from_confusion,
    acc_from_confusion,
    recall_from_confusion,
)


def _np_conf(pred, target, n):
    conf = np.zeros((n, n), np.int64)
    for p, t in zip(pred.reshape(-1), target.reshape(-1)):
        conf[p, t] += 1
    return conf


def test_confusion_matches_numpy(rng):
    n = 6
    pred = rng.integers(0, n, 500)
    target = rng.integers(0, n, 500)
    got = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(target), n))
    np.testing.assert_array_equal(got, _np_conf(pred, target, n))


def test_confusion_valid_mask(rng):
    n = 4
    pred = rng.integers(0, n, 100)
    target = rng.integers(0, n, 100)
    valid = rng.random(100) < 0.5
    got = np.asarray(confusion_matrix(
        jnp.asarray(pred), jnp.asarray(target), n, jnp.asarray(valid)))
    np.testing.assert_array_equal(got, _np_conf(pred[valid], target[valid], n))


def test_iou_stats(rng):
    n = 5
    pred = rng.integers(0, n, 2000)
    target = rng.integers(0, n, 2000)
    conf = _np_conf(pred, target, n)
    mean_iou, iou = iou_from_confusion(jnp.asarray(conf), ignore=(0,))

    # manual: zero ignore rows/cols
    c = conf.astype(np.float64)
    c[0, :] = 0
    c[:, 0] = 0
    tp = np.diag(c)
    fp = c.sum(1) - tp
    fn = c.sum(0) - tp
    want = tp / (tp + fp + fn + 1e-15)
    np.testing.assert_allclose(np.asarray(iou), want, rtol=1e-6)
    np.testing.assert_allclose(float(mean_iou), want[1:].mean(), rtol=1e-6)


def test_perfect_prediction():
    n = 4
    target = np.tile(np.arange(1, n), 10)
    conf = confusion_matrix(jnp.asarray(target), jnp.asarray(target), n)
    mean_iou, _ = iou_from_confusion(conf)
    mean_acc, _ = acc_from_confusion(conf)
    mean_rec, _ = recall_from_confusion(conf)
    assert abs(float(mean_iou) - 1.0) < 1e-6
    assert abs(float(mean_acc) - 1.0) < 1e-6
    assert abs(float(mean_rec) - 1.0) < 1e-6


def test_streaming_state_accumulates(rng):
    n = 5
    state = ConfusionState(n_classes=n)
    preds = rng.integers(0, n, (3, 100))
    targets = rng.integers(0, n, (3, 100))
    for p, t in zip(preds, targets):
        state.add_batch(p, t)
    np.testing.assert_array_equal(
        state.conf, _np_conf(preds.reshape(-1), targets.reshape(-1), n))
    state.reset()
    assert state.conf.sum() == 0
