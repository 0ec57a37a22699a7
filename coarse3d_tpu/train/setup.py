"""Experiment wiring: model + optimizer + train state + step functions.

The reference spreads this across Experiment._initModel (main.py:64-106) and
Trainer.__init__ (trainer.py:17-67). AdamW matches the reference's
`torch.optim.AdamW(params, lr)` — torch's default weight decay 0.01 applies
there (the YAML weight_decay is unused, SURVEY §5.1 defect #5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from coarse3d_tpu.configs.config import ExperimentConfig
from coarse3d_tpu.losses import focal_alpha_from_counts
from coarse3d_tpu.models import SalsaNext
from coarse3d_tpu.train.schedule import warmup_cosine_schedule
from coarse3d_tpu.train.state import TrainState, create_train_state


def build_model(cfg: ExperimentConfig):
    poss = cfg.data.dataset == "semantic_poss"
    kwargs = dict(
        n_classes=cfg.data.n_classes,
        in_channels=cfg.model.in_channels,
        base_channels=cfg.model.base_channels,
        proj_dim=cfg.contrast.proj_dim,
        dropout_rate=cfg.model.dropout_rate,
        dtype=jnp.dtype(cfg.model.compute_dtype),
    )
    if cfg.model.net_type == "salsanext":
        # "s2d" stacks 2x2 pixels into channels (network at half H, half W);
        # "s2d_w" stacks 1x2 (full H, half W) — halves activation traffic
        # while keeping the row resolution texture-carried tasks need
        # (PERF.md "space-to-depth stem": the 2x2 stem costs -12.3 pt there).
        factors = {"parity": (1, 1), "s2d": (2, 2), "s2d_w": (1, 2)}
        if cfg.model.stem not in factors:
            raise ValueError(f"unknown model.stem: {cfg.model.stem!r} "
                             f"(choose from {sorted(factors)})")
        fi, fj = factors[cfg.model.stem]
        if fi * fj > 1:
            h = cfg.sensor.proj_h + (8 if poss else 0)
            w = cfg.sensor.proj_w + (8 if poss else 0)
            if h % (16 * fi) or w % (16 * fj):
                raise ValueError(
                    f"stem='{cfg.model.stem}' runs the network at 1/{fi} x "
                    f"1/{fj} resolution, so H and W (after any POSS padding) "
                    f"must divide {16 * fi} and {16 * fj}; got {h}x{w} for "
                    f"dataset={cfg.data.dataset}. Use the parity stem for "
                    f"this sensor geometry.")
        # POSS pads H and W by +8 (salsanext_proto.py:426-431)
        return SalsaNext(pad_hw=8 if poss else 0, s2d_factors=(fi, fj),
                         **kwargs)
    if cfg.model.net_type == "rangenet":
        from coarse3d_tpu.models.rangenet import RangeNet

        # POSS pads W by +24 (rangenet_proto.py:583-587)
        return RangeNet(layers=cfg.model.layers,
                        pad_w=24 if poss else 0, **kwargs)
    if cfg.model.net_type == "squeezesegv3":
        from coarse3d_tpu.models.squeezesegv3 import SqueezeSegV3

        return SqueezeSegV3(layers=cfg.model.layers, **kwargs)
    raise ValueError(f"unknown net_type: {cfg.model.net_type}")


def build_optimizer(cfg: ExperimentConfig, steps_per_epoch: int):
    schedule = warmup_cosine_schedule(
        cfg.train.lr,
        warmup_steps=cfg.train.warmup_epochs * steps_per_epoch,
        total_steps=cfg.train.n_epochs * steps_per_epoch,
    )
    return optax.adamw(schedule, weight_decay=cfg.train.weight_decay), schedule


def build_alpha(cfg: ExperimentConfig):
    counts = cfg.data.cls_counts or tuple(
        [0.0] + [1.0] * (cfg.data.n_classes - 1))
    return focal_alpha_from_counts(counts, ignore_cls=cfg.train.ignore_cls)


def build_state(
    cfg: ExperimentConfig,
    rng: jax.Array,
    steps_per_epoch: int = 1000,
    batch_size: int | None = None,
) -> TrainState:
    model = build_model(cfg)
    tx, _ = build_optimizer(cfg, steps_per_epoch)
    bs = batch_size if batch_size is not None else cfg.train.batch_size_train
    input_shape = (bs, cfg.sensor.proj_h, cfg.sensor.proj_w,
                   cfg.model.in_channels)
    return create_train_state(
        model, tx, rng, input_shape,
        n_classes=cfg.data.n_classes,
        sub_proto_size=cfg.contrast.sub_proto_size,
        proj_dim=cfg.contrast.proj_dim,
    )
