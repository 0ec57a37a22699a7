from coarse3d_tpu.losses.contrast import contrast_mem_loss, sample_anchors
from coarse3d_tpu.losses.entropy_selection import entropy_based_selection
from coarse3d_tpu.losses.focal import focal_alpha_from_counts, focal_softmax_loss
from coarse3d_tpu.losses.lovasz import lovasz_softmax_loss

__all__ = [
    "contrast_mem_loss",
    "entropy_based_selection",
    "focal_alpha_from_counts",
    "focal_softmax_loss",
    "lovasz_softmax_loss",
    "sample_anchors",
]
