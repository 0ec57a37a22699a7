"""Determinism: the whole train step is a pure function of (state, batch) —
same seeds give bitwise-identical results. The reference's determinism story
is seeding + cudnn.benchmark=True, which actually trades it away
(SURVEY §5, main.py:28-33)."""

import jax
import jax.numpy as jnp
import numpy as np

from coarse3d_tpu.data.synthetic import synthetic_batch
from coarse3d_tpu.train.setup import build_alpha, build_state
from coarse3d_tpu.train.step import make_train_step
from tests.test_train_step import tiny_config


def test_train_step_bitwise_deterministic():
    cfg = tiny_config()
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(
        rng, cfg, batch_size=2, n_points=2000, weak_ratio=0.01).items()}
    alpha = build_alpha(cfg)
    step = jax.jit(make_train_step(cfg, alpha, with_contrast=True))

    outs = []
    for _ in range(2):
        state = build_state(cfg, jax.random.key(3), steps_per_epoch=10,
                            batch_size=2)
        s, m = step(state, batch, 0.3)
        outs.append((np.asarray(jax.tree_util.tree_leaves(s.params)[0]),
                     np.asarray(s.prototypes),
                     float(m["losses"]["total"])))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    assert outs[0][2] == outs[1][2]


def test_pipeline_deterministic():
    from coarse3d_tpu.data.pipeline import DataPipeline
    from coarse3d_tpu.data.synthetic import SyntheticDataset

    cfg = tiny_config()
    ds = SyntheticDataset(6, 2000, cfg.data.n_classes, cfg.sensor)
    batches = []
    for _ in range(2):
        pipe = DataPipeline(ds, cfg, batch_size=2, train=True, seed=5,
                            num_workers=2, process_index=0, process_count=1)
        batches.append(list(pipe.epoch(epoch=1)))
    for a, b in zip(batches[0], batches[1]):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
