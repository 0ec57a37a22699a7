from coarse3d_tpu.losses.focal import focal_alpha_from_counts, focal_softmax_loss
from coarse3d_tpu.losses.lovasz import lovasz_softmax_loss

__all__ = [
    "focal_alpha_from_counts",
    "focal_softmax_loss",
    "lovasz_softmax_loss",
]
