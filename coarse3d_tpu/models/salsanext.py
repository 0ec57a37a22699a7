"""SalsaNext encoder-decoder with contrastive projection head.

Behavioral model: /root/reference/pc_processor/models/salsanext_proto.py:253-492
(minus the leftover debug block at :414-421 that overwrites inputs with
torch.randn — SURVEY §5.1 defect #1): 3 ResContext blocks, 5 ResBlocks
(4 pooled), 4 PixelShuffle UpBlocks with pre-pool skips, 1x1 class head ->
softmax probabilities; for contrastive training the 4 pre-pool skip maps
(32+64+128+256 = 704ch) are bilinear-resized to (H/2, W/2), concatenated,
projected to a 256-d L2-normalized embedding, and upsampled back to (H, W)
(:466-492). SemanticPOSS inputs are zero-padded by +8 in H and W (:426-431)
so every stage divides by 16.

TPU design: NHWC layout (channels on the lane dim), bf16 activations with
fp32 params; softmax/projection head in fp32. Prototype memory is NOT a
module member — it is functional train-state updated by
coarse3d_tpu.models.prototypes (the reference keeps it as a no-grad
nn.Parameter, :322).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from coarse3d_tpu.models.blocks import (
    ClassifierHead,
    ProjectionHead,
    ResBlock,
    ResContextBlock,
    UpBlock,
)
from coarse3d_tpu.ops.resize import resize_bilinear

# Encoder parameter prefixes for encoder-only pretrained loads — the
# 198-name encoder_module.yaml analog (trainer.py:91-94, option.py:93-95).
ENCODER_PREFIXES = ("ResContextBlock", "ResBlock")


class SalsaNext(nn.Module):
    n_classes: int
    in_channels: int = 5
    base_channels: int = 32
    proj_dim: int = 256
    dropout_rate: float = 0.2
    dtype: Any = jnp.bfloat16
    # SemanticPOSS 40x1800 inputs get +8 zero-pad in H and W.
    pad_hw: int = 0
    # ImageNet-pretrain classification mode (reference FC head,
    # salsanext_proto.py:308-309,444-447): encoder only -> 1000-way logits.
    classification: bool = False
    # TPU-native space-to-depth stem (NOT reference-weight-compatible):
    # (i, j) pixel blocks stack into channels so the whole network runs at
    # reduced resolution; logits come back via pixel-shuffle. Raises MXU
    # occupancy of the thin-channel full-res stages (PERF.md: the parity
    # model is HBM-bound at ~6% MXU) at i*j-times lower activation
    # bandwidth. (1, 1) = parity stem; (2, 2) = the r2 "s2d" stem (-12.3 pt
    # on texture-carried tasks, PERF.md); (1, 2) = width-only middle ground
    # that halves activation traffic while keeping full H resolution.
    s2d_factors: tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_feat: bool = False) -> dict[str, jnp.ndarray]:
        """x: (B, H, W, in_channels) normalized range-image features."""
        bc = self.base_channels
        drop = self.dropout_rate
        h0, w0 = x.shape[1], x.shape[2]
        if self.pad_hw:
            x = jnp.pad(
                x, ((0, 0), (0, self.pad_hw), (0, self.pad_hw), (0, 0)))
        fi, fj = self.s2d_factors
        if fi * fj > 1:
            from einops import rearrange

            x = rearrange(x, "b (h i) (w j) c -> b h w (c i j)", i=fi, j=fj)
        h, w = x.shape[1], x.shape[2]
        assert h % 16 == 0 and w % 16 == 0, f"H,W must divide 16, got {h}x{w}"

        x = x.astype(self.dtype)
        ctx = ResContextBlock(bc, dtype=self.dtype)(x, train)
        ctx = ResContextBlock(bc, dtype=self.dtype)(ctx, train)
        ctx = ResContextBlock(bc, dtype=self.dtype)(ctx, train)

        d0c, d0b = ResBlock(2 * bc, drop, pooling=True, drop_out=False,
                            dtype=self.dtype)(ctx, train)
        d1c, d1b = ResBlock(4 * bc, drop, pooling=True,
                            dtype=self.dtype)(d0c, train)
        d2c, d2b = ResBlock(8 * bc, drop, pooling=True,
                            dtype=self.dtype)(d1c, train)
        d3c, d3b = ResBlock(8 * bc, drop, pooling=True,
                            dtype=self.dtype)(d2c, train)
        d5c = ResBlock(8 * bc, drop, pooling=False,
                       dtype=self.dtype)(d3c, train)

        if self.classification:
            return {"class_logits": ClassifierHead(name="fc")(d5c)}

        u4 = UpBlock(4 * bc, drop, dtype=self.dtype)(d5c, d3b, train)
        u3 = UpBlock(4 * bc, drop, dtype=self.dtype)(u4, d2b, train)
        u2 = UpBlock(2 * bc, drop, dtype=self.dtype)(u3, d1b, train)
        u1 = UpBlock(bc, drop, drop_out=False, dtype=self.dtype)(u2, d0b, train)

        if fi * fj > 1:
            # fi x fj logits per coarse pixel, unshuffled to full resolution
            from coarse3d_tpu.models.blocks import pixel_shuffle

            logits = nn.Conv(fi * fj * self.n_classes, (1, 1),
                             dtype=jnp.float32,
                             name="cls_head_s2d")(u1.astype(jnp.float32))
            logits = pixel_shuffle(logits, fi, fj)
        else:
            logits = nn.Conv(self.n_classes, (1, 1), dtype=jnp.float32,
                             name="cls_head")(u1.astype(jnp.float32))
        if self.pad_hw:
            logits = logits[:, :h0, :w0, :]
        probs = nn.softmax(logits, axis=-1)

        out = {"logits": logits, "probs": probs}

        if return_feat:
            h2, w2 = h // 2, w // 2
            mix = jnp.concatenate(
                [
                    resize_bilinear(d0b, h2, w2),
                    resize_bilinear(d1b, h2, w2),
                    resize_bilinear(d2b, h2, w2),
                    resize_bilinear(d3b, h2, w2),
                ],
                axis=-1,
            )
            emb = ProjectionHead(self.proj_dim, name="projector")(mix, train)
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            # back to input resolution (fi*h, fj*w when an s2d stem
            # reduced it)
            emb = resize_bilinear(emb, fi * h, fj * w)
            if self.pad_hw:
                emb = emb[:, :h0, :w0, :]
            out["embedding"] = emb

        return out
