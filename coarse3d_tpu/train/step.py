"""Jitted train / eval steps.

Behavioral model: the reference hot loop (trainer.py:572-747): normalize
features by sensor stats gated on the eval mask, forward, focal + Lovász on
weak pixels, (from the contrast warmup epoch) entropy-driven pseudo-label
selection + prototype-anchor InfoNCE + Sinkhorn/EMA prototype update,
backward + AdamW + per-iter LR step, then 3D unprojected confusion-matrix
metrics.

TPU design: one pure function per mode. Everything the reference does across
Python objects and `.item()` syncs is fused into a single XLA program; under
pjit with a batch-sharded mesh the BN statistics, gradient mean, prototype
update and confusion matrix all reduce globally with no explicit collectives
in user code. The contrast path is a separate specialization (static flag) so
warmup epochs don't pay its FLOPs.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from coarse3d_tpu.configs.config import ExperimentConfig
from coarse3d_tpu.eval.unproject import unproject_image
from coarse3d_tpu.losses import focal_softmax_loss, lovasz_softmax_loss
from coarse3d_tpu.losses.lovasz import lovasz_budget_overflow
from coarse3d_tpu.losses.contrast import contrast_mem_loss
from coarse3d_tpu.losses.entropy_selection import entropy_based_selection
from coarse3d_tpu.metrics import confusion_matrix
from coarse3d_tpu.models.prototypes import (
    prototype_diagnostics, update_prototypes)
from coarse3d_tpu.ops.projection import normalize_features
from coarse3d_tpu.train.state import TrainState


def _prepare_inputs(batch: dict[str, jnp.ndarray], cfg: ExperimentConfig):
    train_label = batch["train_label"].astype(jnp.int32)
    eval_label = batch["eval_label"].astype(jnp.int32)
    wss_mask = train_label > 0
    eval_mask = eval_label > 0
    features = normalize_features(
        batch["features"], eval_mask, cfg.sensor, xp=jnp)
    return features, train_label, eval_label, wss_mask, eval_mask


def _metrics_3d(probs, batch, cfg: ExperimentConfig):
    """Unproject the 2D argmax to points and build the confusion update."""
    argmax_2d = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    point_pred = unproject_image(argmax_2d, batch["point_px"],
                                 batch["point_py"])
    return confusion_matrix(
        point_pred, batch["point_label"], cfg.data.n_classes,
        valid=batch["point_valid"])


def make_train_step(cfg: ExperimentConfig, alpha, *, with_contrast: bool,
                    mesh=None):
    """Build the jittable train step. `with_contrast` is the static analog of
    the reference's `epoch >= contrast_warmup` gate (trainer.py:532-541).
    `mesh` is only needed for ContrastConfig.ddp_parity_protos (the
    per-replica shard_map prototype update)."""
    alpha = jnp.asarray(alpha, jnp.float32)
    # only the contrast specialization runs the prototype update; the
    # warmup step is built without a mesh (Trainer.__init__) and must not
    # trip over the ddp-parity flag
    if with_contrast and cfg.contrast.ddp_parity_protos and mesh is None:
        raise ValueError(
            "contrast.ddp_parity_protos needs the data mesh: pass "
            "make_train_step(..., mesh=...)")

    def train_step(state: TrainState, batch: dict[str, Any],
                   select_ratio: jnp.ndarray | float = 0.0):
        (features, train_label, eval_label, wss_mask,
         eval_mask) = _prepare_inputs(batch, cfg)
        rng, dropout_rng, select_rng, anchor_rng, proto_rng = (
            jax.random.split(state.rng, 5))

        def loss_fn(params):
            out, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                features, train=True, return_feat=with_contrast,
                rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
            probs = out["probs"]

            losses = {}
            total = 0.0
            if cfg.train.loss_w_ce_2d > 0:
                losses["focal"] = focal_softmax_loss(
                    probs, train_label, alpha, wss_mask,
                    gamma=cfg.train.focal_gamma)
                total = total + cfg.train.loss_w_ce_2d * losses["focal"]
            if cfg.train.loss_w_lov_2d > 0:
                losses["lovasz"] = lovasz_softmax_loss(
                    probs, train_label, ignore=cfg.train.ignore_cls,
                    budget=cfg.train.lovasz_budget or None)
                total = total + cfg.train.loss_w_lov_2d * losses["lovasz"]
                if cfg.train.lovasz_budget:
                    # not a loss: truncation sentinel (rides the losses
                    # accumulator; Trainer warns loudly when it sums > 0)
                    losses["lovasz_overflow"] = lovasz_budget_overflow(
                        train_label, cfg.train.ignore_cls,
                        cfg.train.lovasz_budget).astype(jnp.float32)

            if with_contrast and cfg.contrast.loss_w_contrast > 0:
                embedding = out["embedding"]
                if cfg.contrast.entropy_selection:
                    pseudo_label, pseudo_mask = entropy_based_selection(
                        jax.lax.stop_gradient(probs), wss_mask, eval_mask,
                        train_label, select_ratio, select_rng,
                        ignore_cls=cfg.train.ignore_cls)
                else:
                    pseudo_label, pseudo_mask = train_label, wss_mask
                losses["contrast"] = contrast_mem_loss(
                    embedding, jax.lax.stop_gradient(probs), pseudo_label,
                    pseudo_mask, jax.lax.stop_gradient(state.prototypes),
                    anchor_rng, cfg.contrast,
                    ignore_cls=cfg.train.ignore_cls)
                total = total + (
                    cfg.contrast.loss_w_contrast * losses["contrast"])

            losses["total"] = total
            aux = (mutated["batch_stats"], out, losses, train_label, wss_mask)
            return total, aux

        grads, (batch_stats, out, losses, proto_label, proto_mask) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, batch_stats).replace(rng=rng)

        metrics = {"losses": losses}
        if with_contrast and cfg.contrast.use_prototype:
            if cfg.contrast.ddp_parity_protos:
                from coarse3d_tpu.models.prototypes import (
                    update_prototypes_ddp_parity)

                new_protos = update_prototypes_ddp_parity(
                    state.prototypes,
                    jax.lax.stop_gradient(out["embedding"]),
                    proto_label, proto_mask, proto_rng, cfg.contrast,
                    mesh=mesh, ignore_cls=cfg.train.ignore_cls)
            else:
                new_protos = update_prototypes(
                    state.prototypes,
                    jax.lax.stop_gradient(out["embedding"]),
                    proto_label, proto_mask, proto_rng, cfg.contrast,
                    ignore_cls=cfg.train.ignore_cls)
            new_state = new_state.replace(prototypes=new_protos)
        if with_contrast:
            # memory-health scalars (collapse visibility); with the EMA
            # update off this reports the frozen memory (drift == 0)
            metrics["diag"] = prototype_diagnostics(
                state.prototypes, new_state.prototypes,
                ignore_cls=cfg.train.ignore_cls)

        metrics["confusion"] = _metrics_3d(
            jax.lax.stop_gradient(out["probs"]), batch, cfg)
        return new_state, metrics

    return train_step


def make_eval_step(cfg: ExperimentConfig, use_knn: bool = False,
                   return_point_pred: bool = False, use_crf: bool = False,
                   crf_kernel=None):
    """`use_knn` applies the KNN range cleanup to the unprojected labels
    before the confusion matrix — the reference's published numbers include
    it even though its shipped trainer never calls it (SURVEY §5.1 #10).
    `use_crf` refines the 2D softmax with the locally-connected xyz CRF
    before the argmax — the reference ships this module but never exports
    or calls it (postproc/crf.py, SURVEY §5.1 #8 adjacent); here it is an
    opt-in. `crf_kernel` supplies a TRAINED (C, C) compatibility matrix
    (tools/train_crf.py); default is the reference's untrained init, which
    measurably hurts (PARITY.md CRF entry)."""

    def eval_step(state: TrainState, batch: dict[str, Any]):
        features, _, _, _, eval_mask = _prepare_inputs(batch, cfg)
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            features, train=False, return_feat=False)
        if use_crf:
            from coarse3d_tpu.postproc.crf import crf_refine, init_compat_kernel

            kernel = (jnp.asarray(crf_kernel, jnp.float32)
                      if crf_kernel is not None
                      else init_compat_kernel(cfg.data.n_classes,
                                              xyz_coef=0.1))
            # feature channels 1:4 are the projected xyz (pipeline layout)
            refined = crf_refine(
                batch["features"][..., 1:4].astype(jnp.float32),
                jax.nn.softmax(out["logits"], axis=-1), eval_mask, kernel)
            argmax_2d = jnp.argmax(refined, -1).astype(jnp.int32)
        else:
            # softmax is monotonic: argmax over logits is identical and lets
            # XLA dead-code-eliminate the (B, H, W, C) softmax
            argmax_2d = jnp.argmax(out["logits"], -1).astype(jnp.int32)
        if use_knn:
            from coarse3d_tpu.ops.knn import knn_postprocess

            point_pred = knn_postprocess(
                batch["features"][..., 0],  # channel 0 = projected range
                batch["point_depth"], argmax_2d,
                batch["point_px"], batch["point_py"],
                n_classes=cfg.data.n_classes, knn=cfg.knn.knn,
                search=cfg.knn.search, sigma=cfg.knn.sigma,
                cutoff=cfg.knn.cutoff)
        else:
            point_pred = unproject_image(
                argmax_2d, batch["point_px"], batch["point_py"])
        conf = confusion_matrix(
            point_pred, batch["point_label"], cfg.data.n_classes,
            valid=batch["point_valid"])
        result = {"confusion": conf, "argmax_2d": argmax_2d}
        if return_point_pred:
            result["point_pred"] = point_pred
        return result

    return eval_step


@functools.lru_cache(maxsize=8)
def select_ratio_schedule(n_epochs: int):
    """Pseudo-label keep ratio (trainer.py:656-661):
    0.5 * log(1 + (1+epoch)/n_epochs) / log(2)."""
    import numpy as np

    def ratio(epoch: int) -> float:
        return float(
            0.5 * np.log(1 + (1 + epoch) / n_epochs) / np.log(2))

    return ratio
