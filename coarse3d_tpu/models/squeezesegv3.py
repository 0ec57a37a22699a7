"""SqueezeSegV3 (SAC backbone) with contrastive projection head.

Behavioral model: /root/reference/pc_processor/models/squeezesegv3_Proto.py —
SACBlock spatially-adaptive convolution (:469-510): a 7x7 conv + BN over the
(possibly downsampled) xyz image produces a sigmoid attention over the 3x3
unfold of the features (channel order c*9+k, torch F.unfold), followed by a
1x1 + 3x3 MLP (BN momentum 0.1, ReLU) and a residual add. Backbone OS=8 with
width-only strides [2,2,2,1,1] (:513-640): enc1-3 = SACs + downsample conv
(BN momentum 0.01, LeakyReLU 0.1) with the xyz stream bilinear-halved in W
(:645-650); enc4/5 = SACs only at 256ch. Decoder strides [1,1,2,2,2]
(:720-832) with ConvTranspose [1,4]/[1,2] width upsampling, skip adds, and
darknet BasicBlocks; 5 aux heads exist but only head5 (32ch -> 3x3 conv) is
live (:377-394); contrastive mix = skips OS 1/2/4 + backbone output
(32+64+128+256 = 480ch). No POSS padding (commented out in the reference).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from einops import rearrange

from coarse3d_tpu.models.blocks import ProjectionHead
from coarse3d_tpu.models.rangenet import BasicBlock, ConvBN, UpConvBN
from coarse3d_tpu.ops.resize import resize_bilinear

MODEL_BLOCKS = {21: (1, 1, 2, 2, 1), 53: (1, 2, 8, 8, 4)}


def unfold3x3(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, C*9), zero-padded 3x3 neighborhoods in
    torch F.unfold channel order (channel-major: index = c*9 + k)."""
    pads = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    views = [
        pads[:, dy:dy + h, dx:dx + w, :]
        for dy in range(3) for dx in range(3)
    ]
    return rearrange(jnp.stack(views, axis=0), "k b h w c -> b h w (c k)")


class SACBlock(nn.Module):
    """Spatially-adaptive conv: xyz-conditioned attention over unfolded 3x3
    features + 2-layer MLP + residual."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xyz, feature, train: bool):
        c = self.features
        att = nn.Conv(9 * c, (7, 7), padding="SAME",
                      dtype=self.dtype, name="attention_conv")(
            xyz.astype(self.dtype))
        att = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype,
                           name="attention_bn")(att)
        att = nn.sigmoid(att)

        new = unfold3x3(feature) * att
        new = nn.Conv(c, (1, 1), dtype=self.dtype)(new)
        new = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype)(new)
        new = nn.relu(new)
        new = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype)(new)
        new = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype)(new)
        new = nn.relu(new)
        return new + feature


class SqueezeSegV3(nn.Module):
    n_classes: int
    layers: int = 21
    in_channels: int = 5
    base_channels: int = 32
    proj_dim: int = 256
    dropout_rate: float = 0.0
    dtype: Any = jnp.bfloat16
    pad_h: int = 0
    pad_w: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_feat: bool = False) -> dict[str, jnp.ndarray]:
        blocks = MODEL_BLOCKS[self.layers]
        h0, w0 = x.shape[1], x.shape[2]
        x = x.astype(self.dtype)
        xyz = x[..., 1:4]

        def dropout(v, rate=0.01):
            return nn.Dropout(rate, broadcast_dims=(1, 2),
                              deterministic=not train)(v)

        feat = ConvBN(32, (3, 3), dtype=self.dtype)(x, train)

        skips = {}
        os = 1
        # (sac_channels, down_channels, downsample?)
        stages = [(32, 64, True), (64, 128, True), (128, 256, True),
                  (256, 256, False), (256, 256, False)]
        for stage, (c_sac, c_out, ds) in enumerate(stages):
            # the skip is the STAGE INPUT — before this stage's SAC blocks
            # (run_layer stores `feature` pre-layer, :645-651)
            stage_input = feat
            for _ in range(blocks[stage]):
                feat = SACBlock(c_sac, dtype=self.dtype)(xyz, feat, train)
            if ds:
                skips[os] = stage_input
                os *= 2
                feat = ConvBN(c_out, (3, 3), strides=(1, 2),
                              dtype=self.dtype)(feat, train)
                xyz = resize_bilinear(xyz, xyz.shape[1], xyz.shape[2] // 2)
            feat = dropout(feat)

        backbone_out = feat  # 256ch at W/8

        # decoder (OS 8): two stride-1 conv stages then three width x2 ups
        dec_plan = [(256, 256, False), (256, 256, False), (256, 128, True),
                    (128, 64, True), (64, 32, True)]
        outputs = []
        for c_in, c_out, up in dec_plan:
            if up:
                feat = UpConvBN(c_out, dtype=self.dtype)(feat, train)
                # residual runs BEFORE the skip add (the dec Sequential
                # includes it, squeezesegv3_Proto.py:808-815)
                feat = BasicBlock(c_in, c_out, dtype=self.dtype)(feat, train)
                os //= 2
                feat = feat + skips[os].astype(self.dtype)
            else:
                feat = ConvBN(c_out, (3, 3), use_bias=True,
                              dtype=self.dtype)(feat, train)
                feat = BasicBlock(c_in, c_out, dtype=self.dtype)(feat, train)
            outputs.append(feat)
        feat = dropout(feat)

        # only head5 is live (reference :377-394)
        logits = nn.Conv(self.n_classes, (3, 3), padding="SAME",
                         dtype=jnp.float32, name="head5")(
            dropout(feat).astype(jnp.float32))
        probs = nn.softmax(logits, axis=-1)
        out = {"logits": logits, "probs": probs}

        if return_feat:
            h2, w2 = h0 // 2, w0 // 2
            mix = jnp.concatenate(
                [
                    resize_bilinear(skips[1], h2, w2),
                    resize_bilinear(skips[2], h2, w2),
                    resize_bilinear(skips[4], h2, w2),
                    resize_bilinear(backbone_out, h2, w2),
                ],
                axis=-1)  # 480ch
            emb = ProjectionHead(self.proj_dim, name="projector")(mix, train)
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            emb = resize_bilinear(emb, h0, w0)
            out["embedding"] = emb
        return out
