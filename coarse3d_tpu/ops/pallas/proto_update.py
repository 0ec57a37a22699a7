"""Pallas TPU kernel: fused prototype Sinkhorn/EMA update (north-star #2).

The dense tail of models/prototypes.py:update_prototypes — row LayerNorm +
l2, the (C·M, C·K) similarity, the mask-norm/agreement filter, the masked
Sinkhorn iterations, the one-hot^T @ feats contraction and the EMA/renorm —
is a chain of ~30 small XLA ops over (C, M, K/D) tensors that each pay HBM
round-trips and lane-underfilled VPU dispatch. This kernel runs the whole
tail as ONE program per class: every intermediate lives in VMEM, the two
matmuls hit the MXU back-to-back, and HBM traffic drops to one read of the
(M, D) class rows + one (K, D) write.

The point-rate class gather that FEEDS the tail (ops/gather.py:
gather_class_indices — one composite sort) stays in XLA: it is
gather-engine-bound, not fusion-bound (PERF.md "the point-op wall").

Behavioral model: salsanext_proto.py:337-402 via models/prototypes.py
(gather-first formulation). The Gumbel noise is PASSED IN (drawn with the
same jax.random stream as the XLA path), so both paths are equivalent to
float-reassociation tolerance — swapping in pltpu.prng_random_bits would
silently change the assignment sample stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coarse3d_tpu.configs.config import ContrastConfig


def _l2(x, axis=-1):
    return x / jnp.maximum(
        jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True)), 1e-12)


def _kernel(feat_ref, valid_ref, protos_all_ref, protos_c_ref, gumbel_ref,
            out_ref, *, n_classes, sub_k, momentum, ignore_cls,
            sinkhorn_iters, sinkhorn_eps):
    c = pl.program_id(0)
    feat_raw = feat_ref[0].astype(jnp.float32)            # (M, D)
    vf = valid_ref[0].astype(jnp.float32)                 # (1, M)
    vcol = vf.reshape(-1, 1)                              # (M, 1)
    protos = protos_all_ref[...].astype(jnp.float32)      # (C, K, D) l2-normed
    protos_c = protos_c_ref[0].astype(jnp.float32)        # (K, D)
    gumbel = gumbel_ref[0].astype(jnp.float32)            # (M, K)
    m, d = feat_raw.shape

    # row LayerNorm (parameter-free, prototypes.py:_layer_norm) + l2
    mu = jnp.mean(feat_raw, axis=-1, keepdims=True)
    var = jnp.mean((feat_raw - mu) ** 2, axis=-1, keepdims=True)
    feat = _l2((feat_raw - mu) * jax.lax.rsqrt(var + 1e-5))

    # similarity to every sub-prototype: (M, C*K) on the MXU. The per-class
    # max is a static-slice loop — Mosaic cannot lower the (M, C*K) ->
    # (M, C, K) vector reshape (r4 measurement: "unsupported shape cast").
    sim_full = jnp.dot(feat, protos.reshape(n_classes * sub_k, d).T,
                       preferred_element_type=jnp.float32)
    nearest = jnp.concatenate(
        [jnp.max(sim_full[:, cc * sub_k:(cc + 1) * sub_k], axis=-1,
                 keepdims=True) for cc in range(n_classes)], axis=-1)

    # mask_norm LayerNorm over classes + agreement with this class
    nmu = jnp.mean(nearest, axis=-1, keepdims=True)
    nvar = jnp.mean((nearest - nmu) ** 2, axis=-1, keepdims=True)
    nearest_ln = (nearest - nmu) * jax.lax.rsqrt(nvar + 1e-5)
    pred = jnp.argmax(nearest_ln, axis=-1, keepdims=True).astype(jnp.int32)
    agree = (pred == c).astype(jnp.float32) * vcol  # (M, 1)

    # own-class block + masked Sinkhorn (ops/sinkhorn.py semantics)
    sim_c = jnp.dot(feat, protos_c.T,
                    preferred_element_type=jnp.float32)    # (M, K)
    logits = sim_c / sinkhorn_eps
    lmax = jnp.max(jnp.where(vcol > 0, logits, -jnp.inf))
    q = jnp.exp(logits - lmax) * vcol

    def safe_div(a, b):
        return a / jnp.where(b > 0, b, 1.0)

    n_valid = jnp.maximum(jnp.sum(vf), 1.0)
    q = safe_div(q, jnp.sum(q))
    for _ in range(sinkhorn_iters):
        q = safe_div(q, jnp.sum(q, axis=0, keepdims=True)) / sub_k
        q = safe_div(q, jnp.sum(q, axis=1, keepdims=True)) / n_valid
        q = q * vcol
    q = q * n_valid

    hard = jnp.argmax(q + gumbel, axis=-1, keepdims=True)  # (M, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, sub_k), 1)
    onehot = (cols == hard).astype(jnp.float32) * vcol
    m_q = onehot * agree                                    # (M, K)

    # contraction + EMA + renorm
    f = jnp.dot(m_q.T, feat, preferred_element_type=jnp.float32)  # (K, D)
    n_assigned = jnp.sum(m_q, axis=0).reshape(-1, 1)               # (K, 1)
    f = _l2(f)
    occupied = (n_assigned > 0) & (c != ignore_cls)
    new = jnp.where(occupied, momentum * protos_c + (1.0 - momentum) * f,
                    protos_c)
    out_ref[0] = _l2(new)


@functools.partial(jax.jit, static_argnames=("cfg", "ignore_cls", "interpret"))
def fused_proto_tail(
    feat_rows: jax.Array,
    valid: jax.Array,
    protos_n: jax.Array,
    gumbel: jax.Array,
    cfg: ContrastConfig,
    ignore_cls: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Dense tail of the prototype update, one Pallas program per class.

    Args:
      feat_rows: (C, M, D) raw gathered embedding rows (pre-LayerNorm).
      valid: (C, M) bool budget mask.
      protos_n: (C, K, D) l2-NORMALIZED memory.
      gumbel: (C, M, K) Gumbel noise (same stream as the XLA path).

    Returns the new (C, K, D) memory (l2-renormalized).
    """
    c, m, d = feat_rows.shape
    k = protos_n.shape[1]
    kernel = functools.partial(
        _kernel, n_classes=c, sub_k=k, momentum=cfg.proto_momentum,
        ignore_cls=ignore_cls, sinkhorn_iters=3, sinkhorn_eps=0.05)
    return pl.pallas_call(
        kernel,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, m, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # (C, 1, M) so the block's last two dims equal the array's
            # (Mosaic's lowering constraint); kernel reads it as (1, M)
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, k, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, k, d), jnp.float32),
        # the (M, C*K) similarity + its fusions overflow the default 16 MB
        # scoped-VMEM budget (r4 measurement: 24.6 MB needed); v5e has 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
        # protos_n rides twice: full memory (the similarity target set) and
        # the pipeline's per-class block (this program's own EMA rows)
    )(feat_rows, valid.astype(jnp.float32)[:, None, :], protos_n, protos_n,
      gumbel)


def update_prototypes_fused(
    prototypes: jax.Array,
    embedding: jax.Array,
    label: jax.Array,
    label_mask: jax.Array,
    rng: jax.Array,
    cfg: ContrastConfig,
    ignore_cls: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in variant of models/prototypes.py:update_prototypes with the
    dense tail in one Pallas kernel. Same signature, same Gumbel stream."""
    from coarse3d_tpu.models.prototypes import l2_normalize
    from coarse3d_tpu.ops.gather import gather_class_indices

    c, k, d = prototypes.shape
    protos_n = l2_normalize(prototypes.astype(jnp.float32))

    flat_label = label.reshape(-1).astype(jnp.int32)
    flat_valid = label_mask.reshape(-1) & (flat_label != ignore_cls)
    idx, valid = gather_class_indices(
        flat_label, flat_valid, c, cfg.max_pixels_per_class)

    emb_flat = embedding.reshape(-1, d).astype(jnp.float32)
    feat_rows = emb_flat[idx]                             # (C, M, D) raw

    rngs = jax.random.split(rng, c)
    gumbel = jax.vmap(
        lambda r: jax.random.gumbel(
            r, (cfg.max_pixels_per_class, k), jnp.float32))(rngs)

    return fused_proto_tail(feat_rows, valid, protos_n, gumbel, cfg,
                            ignore_cls=ignore_cls, interpret=interpret)
