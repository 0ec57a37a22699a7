"""RangeNet (darknet21/53) encoder-decoder with contrastive projection head.

Behavioral model: /root/reference/pc_processor/models/rangenet_proto.py —
darknet backbone with *width-only* strides [1,2] (OS=32 on W, H untouched,
:107-178), BasicBlock residuals (1x1 -> 3x3, LeakyReLU 0.1, BN momentum
0.01, :38-64), skip maps captured before each downsample keyed by output
stride (:215-249); ConvTranspose [1,4]/[1,2] width upsampling decoder with
skip *adds* (:261-369); dropout-conv3x3 head -> softmax (:418-427);
contrastive mix = skips at OS 1/2/4/8 (32+64+128+256 = 480ch) resized to
(H/2, W/2) -> ProjectionV1 -> L2 norm -> upsample (:605-632). SemanticPOSS
inputs pad W by +24 (:583-587).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from coarse3d_tpu.models.blocks import ProjectionHead
from coarse3d_tpu.ops.resize import resize_bilinear

# residual block counts per darknet depth (rangenet_proto.py:70-73)
MODEL_BLOCKS = {21: (1, 1, 2, 2, 1), 53: (1, 2, 8, 8, 4)}
# torch BN momentum 0.01 -> flax EMA momentum 0.99
BN_MOM = 0.99


class ConvBN(nn.Module):
    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        # torch-style symmetric padding (k//2): XLA 'SAME' pads (0, 1) for
        # stride 2, shifting every window one tap right of the reference
        pad = tuple((k // 2, k // 2) for k in self.kernel)
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=pad, use_bias=self.use_bias,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOM,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.1)


class BasicBlock(nn.Module):
    """Darknet residual: 1x1 squeeze -> 3x3 expand, both BN+LeakyReLU(0.1)."""

    squeeze: int
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        res = ConvBN(self.squeeze, (1, 1), dtype=self.dtype)(x, train)
        res = ConvBN(self.features, (3, 3), dtype=self.dtype)(res, train)
        return x + res


class UpConvBN(nn.Module):
    """ConvTranspose [1,4] stride [1,2] pad [0,1]: exact width doubling."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        # torch ConvTranspose2d(k=[1,4], s=[1,2], p=[0,1]) gives out = 2*in;
        # flax interprets pair-paddings differently, but SAME reproduces the
        # same geometry (verified against torch in the converter tests)
        x = nn.ConvTranspose(
            self.features, (1, 4), strides=(1, 2),
            padding="SAME", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOM,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.1)


class RangeNet(nn.Module):
    n_classes: int
    layers: int = 21
    in_channels: int = 5
    base_channels: int = 32  # fixed by the architecture; kept for API parity
    proj_dim: int = 256
    dropout_rate: float = 0.0  # unused; darknet uses its own probs below
    dtype: Any = jnp.bfloat16
    pad_h: int = 0
    pad_w: int = 0  # SemanticPOSS: 24

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_feat: bool = False) -> dict[str, jnp.ndarray]:
        blocks = MODEL_BLOCKS[self.layers]
        drop_enc = 0.01 if self.layers == 21 else 0.05
        drop_dec = 0.001 if self.layers == 21 else 0.005
        h0, w0 = x.shape[1], x.shape[2]
        if self.pad_h or self.pad_w:
            x = jnp.pad(x, ((0, 0), (0, self.pad_h), (0, self.pad_w), (0, 0)))
        x = x.astype(self.dtype)

        def dropout(v, rate):
            return nn.Dropout(rate, broadcast_dims=(1, 2),
                              deterministic=not train)(v)

        # encoder: skips keyed by width output-stride, captured pre-downsample
        feat = ConvBN(32, (3, 3), dtype=self.dtype)(x, train)
        skips = {}
        os = 1
        chans = [(32, 64), (64, 128), (128, 256), (256, 512), (512, 1024)]
        for stage, (c_in, c_out) in enumerate(chans):
            skips[os] = feat
            os *= 2
            feat = ConvBN(c_out, (3, 3), strides=(1, 2),
                          dtype=self.dtype)(feat, train)
            for _ in range(blocks[stage]):
                feat = BasicBlock(c_in, c_out, dtype=self.dtype)(feat, train)
            feat = dropout(feat, drop_enc)

        # decoder: width x2 upsample + skip add
        for c_in, c_out in [(1024, 512), (512, 256), (256, 128), (128, 64),
                            (64, 32)]:
            feat = UpConvBN(c_out, dtype=self.dtype)(feat, train)
            # decoder residual squeezes UP to c_in then back (planes order
            # [in, out] with block(inplanes=out), rangenet_proto.py:320-347),
            # and runs BEFORE the skip add (the dec Sequential includes it,
            # :349-355)
            feat = BasicBlock(c_in, c_out, dtype=self.dtype)(feat, train)
            os //= 2
            feat = feat + skips[os].astype(self.dtype)
        feat = dropout(feat, drop_dec)

        logits = nn.Conv(self.n_classes, (3, 3), padding="SAME",
                         dtype=jnp.float32, name="cls_head")(
            dropout(feat, drop_enc).astype(jnp.float32))
        if self.pad_h or self.pad_w:
            logits = logits[:, :h0, :w0, :]
        probs = nn.softmax(logits, axis=-1)
        out = {"logits": logits, "probs": probs}

        if return_feat:
            h2, w2 = logits.shape[1] // 2, logits.shape[2] // 2
            mix = jnp.concatenate(
                [resize_bilinear(skips[s], h2, w2) for s in (1, 2, 4, 8)],
                axis=-1)  # 32+64+128+256 = 480
            emb = ProjectionHead(self.proj_dim, name="projector")(mix, train)
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            emb = resize_bilinear(emb, h0, w0)
            out["embedding"] = emb
        return out
