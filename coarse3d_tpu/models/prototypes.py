"""Class-prototype memory: similarity, Sinkhorn clustering, EMA update.

Behavioral model: salsanext_proto.py:337-402 (`prototype_learning`, identical
copies in rangenet_proto.py:460-567 and squeezesegv3_Proto.py:253-351):
per class c — Sinkhorn-cluster the class's pixels over `sub_proto_size`
sub-prototypes; keep only pixels whose nearest-prototype class prediction
agrees with the label; masked one-hot^T @ feats gives new sub-prototype
means (L2-normalized); EMA-update occupied rows (momentum 0.999); L2-renorm
the whole memory. The reference's feat_norm/mask_norm LayerNorms (:327-328)
carry learnable affines that never receive gradients (contrast_logits are
unused by the shipped trainer), so they are plain parameter-free LayerNorms
here.

TPU design: the per-class Python loop with dynamic `label == c` subsets
becomes one stable-sort class gather (fixed budget per class) + a vmapped
masked Sinkhorn — a single fused XLA program. Under pjit the embedding batch
is sharded on `data`, so the one-hot^T @ feats contraction and the EMA update
reduce globally — a *sharper* equivalent of the reference's per-rank-update +
all_reduce-mean (salsanext_proto.py:397-400). For bitwise replication of the
reference's DDP semantics, `update_prototypes_ddp_parity` runs the same
update per replica over its local batch shard under shard_map and
mean-reduces the memories (ContrastConfig.ddp_parity_protos).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from coarse3d_tpu.configs.config import ContrastConfig
from coarse3d_tpu.ops.gather import gather_class_indices
from coarse3d_tpu.ops.sinkhorn import masked_sinkhorn


def _layer_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def l2_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def prototype_similarity(
    embedding: jnp.ndarray, prototypes: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Cosine similarity of every pixel to every sub-prototype.

    Args:
      embedding: (..., D) projector output.
      prototypes: (C, K, D) memory.

    Returns (feat (N, D) normalized, sim (N, C, K), nearest (N, C) after the
    parameter-free class LayerNorm — reference :497-510).
    """
    d = embedding.shape[-1]
    feat = embedding.reshape(-1, d).astype(jnp.float32)
    feat = l2_normalize(_layer_norm(feat))
    protos = l2_normalize(prototypes.astype(jnp.float32))
    sim = jnp.einsum("nd,ckd->nck", feat, protos)
    nearest = _layer_norm(jnp.max(sim, axis=-1))  # mask_norm analog
    return feat, sim, nearest


def update_prototypes(
    prototypes: jnp.ndarray,
    embedding: jnp.ndarray,
    label: jnp.ndarray,
    label_mask: jnp.ndarray,
    rng: jax.Array,
    cfg: ContrastConfig,
    ignore_cls: int = 0,
) -> jnp.ndarray:
    """One EMA step of the prototype memory. Pure; call under stop_gradient.

    Args:
      prototypes: (C, K, D).
      embedding: (B, H, W, D) projector output.
      label: (B, H, W) int32 training labels (weak).
      label_mask: (B, H, W) bool — which labels supervise (wss mask).
      rng: key for the Sinkhorn Gumbel sample.
      cfg: contrast config (momentum, budget).
    """
    c, k, d = prototypes.shape
    protos = l2_normalize(prototypes.astype(jnp.float32))

    flat_label = label.reshape(-1).astype(jnp.int32)
    flat_valid = label_mask.reshape(-1) & (flat_label != ignore_cls)

    idx, valid = gather_class_indices(
        flat_label, flat_valid, c, cfg.max_pixels_per_class)  # (C, M)

    # Gather FIRST, normalize/contract after: only the (C, M) budgeted rows
    # are ever consumed, so computing prototype_similarity over all B*H*W
    # pixels (the reference shape, salsanext_proto.py:497-510) wastes ~13x
    # the FLOPs and ~500 MB of LayerNorm traffic. Identical numerics — the
    # per-row LN/l2/sim math doesn't depend on the other rows.
    emb_flat = embedding.reshape(-1, d).astype(jnp.float32)
    feat_c = l2_normalize(_layer_norm(emb_flat[idx]))       # (C, M, D)

    sim_g = jnp.einsum("cmd,jkd->cmjk", feat_c, protos)     # (C, M, C, K)
    nearest_g = _layer_norm(jnp.max(sim_g, axis=-1))        # mask_norm analog
    pred_g = jnp.argmax(nearest_g, axis=-1).astype(jnp.int32)  # (C, M)

    # own-class similarity block per class (== sim_g[c, :, c, :])
    sim_c = jnp.einsum("cmd,ckd->cmk", feat_c, protos)      # (C, M, K)
    rngs = jax.random.split(rng, c)
    onehot, _ = jax.vmap(masked_sinkhorn)(sim_c, valid, rngs)  # (C, M, K)

    agree = (pred_g == jnp.arange(c)[:, None]) & valid      # (C, M)
    m_q = onehot * agree[..., None].astype(jnp.float32)

    f = jnp.einsum("cmk,cmd->ckd", m_q, feat_c)             # (C, K, D)
    n = m_q.sum(axis=1)                                     # (C, K)

    f = l2_normalize(f)
    occupied = (n > 0) & (jnp.arange(c)[:, None] != ignore_cls)
    new = jnp.where(
        occupied[..., None],
        cfg.proto_momentum * protos + (1.0 - cfg.proto_momentum) * f,
        protos,
    )
    return l2_normalize(new)


def prototype_diagnostics(
    old: jnp.ndarray,
    new: jnp.ndarray,
    ignore_cls: int = 0,
) -> dict[str, jnp.ndarray]:
    """Scalar health metrics of the prototype memory (observability).

    The contrast loss is only discriminative while the per-class targets stay
    separated; with the EMA update ON the memory can collapse toward the
    early-training feature mean (every class's pixels look alike to an
    untrained backbone), at which point InfoNCE pulls all anchors toward the
    same direction. These scalars make that failure mode visible in the
    Recorder without fetching the (C, K, D) memory:

      proto_inter_sim — mean cosine similarity between sub-prototypes of
        DIFFERENT classes (ignore-class rows excluded). Random D-dim init
        ~0; collapse drives it toward 1.
      proto_intra_sim — mean cosine similarity within a class's own
        sub-prototypes (self-pairs excluded).
      proto_drift — mean L2 step distance ||new - old|| over non-ignore
        rows (0 when use_prototype=False).

    Cost: one (C*K, C*K) similarity matrix — a few hundred rows, negligible
    next to the step.
    """
    c, k, d = new.shape
    rows = l2_normalize(new.astype(jnp.float32).reshape(c * k, d))
    cls = jnp.repeat(jnp.arange(c), k)
    row_valid = cls != ignore_cls

    sim = rows @ rows.T                                     # (CK, CK)
    pair_valid = row_valid[:, None] & row_valid[None, :]
    same_cls = cls[:, None] == cls[None, :]
    self_pair = jnp.eye(c * k, dtype=bool)

    inter_mask = pair_valid & ~same_cls
    intra_mask = pair_valid & same_cls & ~self_pair

    def masked_mean(values, mask):
        m = mask.astype(jnp.float32)
        return (values * m).sum() / jnp.maximum(m.sum(), 1.0)

    drift = jnp.linalg.norm(
        new.astype(jnp.float32) - old.astype(jnp.float32), axis=-1)
    return {
        "proto_inter_sim": masked_mean(sim, inter_mask),
        "proto_intra_sim": masked_mean(sim, intra_mask),
        "proto_drift": masked_mean(drift.reshape(c * k), row_valid),
    }


def update_prototypes_ddp_parity(
    prototypes: jnp.ndarray,
    embedding: jnp.ndarray,
    label: jnp.ndarray,
    label_mask: jnp.ndarray,
    rng: jax.Array,
    cfg: ContrastConfig,
    mesh,
    ignore_cls: int = 0,
    axis: str = "data",
) -> jnp.ndarray:
    """Reference-DDP-parity prototype step (salsanext_proto.py:338-400).

    Each data-parallel replica runs the full Sinkhorn/EMA update on its OWN
    batch shard (its "GPU"), each with an independently folded RNG (each
    rank draws its own Gumbel sample), and the resulting memories are
    mean-all-reduced — deliberately WITHOUT a final re-normalization, matching
    the reference's `dist.all_reduce(protos.div_(world_size))` applied after
    its l2_normalize. The default global-contraction `update_prototypes` is
    sharper (one clustering over the global batch); this mode exists so the
    DDP-equivalence claim is testable (tests/test_multichip.py).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local_update(protos, emb, lbl, msk, key_data):
        key = jax.random.wrap_key_data(key_data)
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        local = update_prototypes(
            protos, emb, lbl, msk, key, cfg, ignore_cls=ignore_cls)
        return jax.lax.pmean(local, axis)

    shmapped = shard_map(
        local_update, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P()),
        out_specs=P(), check_vma=False)
    return shmapped(prototypes, embedding, label, label_mask,
                    jax.random.key_data(rng))
