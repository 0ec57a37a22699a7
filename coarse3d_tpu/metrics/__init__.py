from coarse3d_tpu.metrics.iou import (
    ConfusionState,
    confusion_matrix,
    iou_from_confusion,
    acc_from_confusion,
    recall_from_confusion,
)

__all__ = [
    "ConfusionState",
    "confusion_matrix",
    "iou_from_confusion",
    "acc_from_confusion",
    "recall_from_confusion",
]
