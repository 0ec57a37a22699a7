"""Shared conv building blocks (Flax, NHWC, bf16-compute/fp32-params).

Behavioral model: the SalsaNext block zoo in
/root/reference/pc_processor/models/salsanext_proto.py —
ResContextBlock (:38-65), ResBlock (:68-148), UpBlock (:151-212) — re-expressed
channel-last for TPU (lane dim = channels) with LeakyReLU(0.01) and
BatchNorm(eps 1e-5, ema momentum 0.9) matching torch defaults. Cross-replica
("Sync") batch-norm semantics come for free: under pjit the batch axis is
globally sharded, so the batch mean/var reductions are global collectives.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from einops import rearrange

Dtype = Any


def pixel_shuffle(x: jnp.ndarray, r: int = 2, rw: int | None = None
                  ) -> jnp.ndarray:
    """(B, H, W, C*r*rw) -> (B, H*r, W*rw, C), torch PixelShuffle channel
    order. `rw` defaults to `r` (square shuffle); a rectangular (r, rw)
    supports the width-only s2d stem (salsanext.py)."""
    return rearrange(x, "b h w (c i j) -> b (h i) (w j) c", i=r,
                     j=r if rw is None else rw)


class ConvActBN(nn.Module):
    """conv -> leaky_relu -> batchnorm, the reference's recurring triplet."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    dilation: tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features, self.kernel, kernel_dilation=self.dilation,
            padding=self.padding, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.01)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype)(x)
        return x


class ResContextBlock(nn.Module):
    """1x1 shortcut + two 3x3 convs (2nd dilated), residual sum."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = nn.Conv(self.features, (1, 1), dtype=self.dtype)(x)
        shortcut = nn.leaky_relu(shortcut, 0.01)
        res = ConvActBN(self.features, (3, 3), dtype=self.dtype)(shortcut, train)
        res = ConvActBN(
            self.features, (3, 3), dilation=(2, 2), dtype=self.dtype)(res, train)
        return shortcut + res


class ResBlock(nn.Module):
    """Three stacked dilated convs, concat-fuse, residual; optional pool.

    Returns (pooled, pre_pool_skip) when pooling, else the block output —
    matching ResBlock.forward (salsanext_proto.py:113-148).
    """

    features: int
    dropout_rate: float = 0.2
    pooling: bool = True
    drop_out: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = nn.Conv(self.features, (1, 1), dtype=self.dtype)(x)
        shortcut = nn.leaky_relu(shortcut, 0.01)

        res1 = ConvActBN(self.features, (3, 3), dtype=self.dtype)(x, train)
        res2 = ConvActBN(
            self.features, (3, 3), dilation=(2, 2), dtype=self.dtype)(res1, train)
        # 2x2 kernel, dilation 2, pad 1 keeps spatial size (effective 3x3)
        res3 = ConvActBN(
            self.features, (2, 2), dilation=(2, 2),
            padding=((1, 1), (1, 1)), dtype=self.dtype)(res2, train)

        concat = jnp.concatenate([res1, res2, res3], axis=-1)
        res = ConvActBN(self.features, (1, 1), dtype=self.dtype)(concat, train)
        res = shortcut + res

        out = res
        if self.drop_out:
            out = nn.Dropout(
                self.dropout_rate, broadcast_dims=(1, 2),
                deterministic=not train)(out)
        if self.pooling:
            pooled = nn.avg_pool(
                out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                count_include_pad=True)
            return pooled, res
        return out


class UpBlock(nn.Module):
    """PixelShuffle x2 upsample, skip concat, three convs, concat-fuse."""

    features: int
    dropout_rate: float = 0.2
    drop_out: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip, train: bool):
        up = pixel_shuffle(x, 2)
        if self.drop_out:
            up = nn.Dropout(
                self.dropout_rate, broadcast_dims=(1, 2),
                deterministic=not train)(up)
        up = jnp.concatenate([up, skip], axis=-1)
        if self.drop_out:
            up = nn.Dropout(
                self.dropout_rate, broadcast_dims=(1, 2),
                deterministic=not train)(up)

        e1 = ConvActBN(self.features, (3, 3), dtype=self.dtype)(up, train)
        e2 = ConvActBN(
            self.features, (3, 3), dilation=(2, 2), dtype=self.dtype)(e1, train)
        e3 = ConvActBN(
            self.features, (2, 2), dilation=(2, 2),
            padding=((1, 1), (1, 1)), dtype=self.dtype)(e2, train)

        concat = jnp.concatenate([e1, e2, e3], axis=-1)
        out = ConvActBN(self.features, (1, 1), dtype=self.dtype)(concat, train)
        if self.drop_out:
            out = nn.Dropout(
                self.dropout_rate, broadcast_dims=(1, 2),
                deterministic=not train)(out)
        return out


class SEBlock(nn.Module):
    """Squeeze-and-excitation (reference salsanext_proto.py:234-250; defined
    but unused by the shipped models — provided for API completeness)."""

    reduction: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = x.mean(axis=(1, 2))
        s = nn.Dense(c // self.reduction, dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype)(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class ClassifierHead(nn.Module):
    """Global-pool + linear classifier for ImageNet encoder pretraining
    (reference FC, salsanext_proto.py:216-231)."""

    n_outputs: int = 1000

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32).mean(axis=(1, 2))
        return nn.Dense(self.n_outputs)(x)


class ConvUpSample(nn.Module):
    """Bilinear-upsample + conv deconv substitute (reference
    layers/modules.py:5-28; unused by the shipped models)."""

    features: int
    scale: int = 2
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        from coarse3d_tpu.ops.resize import resize_bilinear

        x = resize_bilinear(x, x.shape[1] * self.scale,
                            x.shape[2] * self.scale)
        return ConvActBN(self.features, (3, 3), dtype=self.dtype)(x, train)


class ProjectionHead(nn.Module):
    """Contrastive embedding head (reference ProjectionV1, projector.py:11-27):
    1x1 conv -> BN -> LeakyReLU -> 1x1 conv. Computed in fp32 — the embedding
    feeds cosine similarities where bf16 hurts."""

    proj_dim: int

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(jnp.float32)
        feats = x.shape[-1]
        x = nn.Conv(feats, (1, 1), dtype=jnp.float32)(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        x = nn.leaky_relu(x, 0.01)
        x = nn.Conv(self.proj_dim, (1, 1), dtype=jnp.float32)(x)
        return x


class ProjectionHeadV2(nn.Module):
    """Reference ProjectionV2 (projector.py:31-44, dead code — never
    instantiated): 1x1 conv -> ReLU -> 1x1 conv. Rebuilt for literal API
    completeness."""

    proj_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(jnp.float32)
        x = nn.Conv(x.shape[-1], (1, 1), dtype=jnp.float32)(x)
        x = nn.relu(x)
        return nn.Conv(self.proj_dim, (1, 1), dtype=jnp.float32)(x)


class ProjectionHeadV3(nn.Module):
    """Reference ProjectionV3 (projector.py:48-60, dead code): V2 with
    LeakyReLU instead of ReLU."""

    proj_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(jnp.float32)
        x = nn.Conv(x.shape[-1], (1, 1), dtype=jnp.float32)(x)
        x = nn.leaky_relu(x, 0.01)
        return nn.Conv(self.proj_dim, (1, 1), dtype=jnp.float32)(x)


class ProjectionHeadV4(nn.Module):
    """Reference ProjectionV4 (projector.py:64-84, dead code): one 1x1 conv
    then a SCALAR global l2 norm — `torch.norm(x, p=2)` with no dim reduces
    over everything, so the module returns a single number. Reproduced
    exactly (it is broken-by-design dead code in the reference)."""

    proj_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(jnp.float32)
        x = nn.Conv(self.proj_dim, (1, 1), dtype=jnp.float32)(x)
        return jnp.sqrt(jnp.sum(jnp.square(x)))


class CSAttention(nn.Module):
    """Channel-wise spatial attention (reference layers/modules.py:30-56,
    unused by the shipped models): a 3x3-conv-ReLU-3x3-conv value branch
    gated elementwise by a parallel sigmoid attention branch."""

    out_channels: int
    stride: int = 1
    scale: float = 1.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        mid = int(x.shape[-1] * self.scale)
        s = (self.stride, self.stride)

        def branch(h, final_act):
            h = nn.Conv(mid, (3, 3), strides=s, dtype=self.dtype)(h)
            h = nn.relu(h)
            h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype)(h)
            return final_act(h)

        return branch(x, nn.relu) * branch(x, nn.sigmoid)
