from coarse3d_tpu.postproc.border import border_mask
from coarse3d_tpu.postproc.crf import crf_refine

# KNN lives in ops.knn (it's part of the hot inference path); re-exported
# here to mirror the reference's postproc package surface.
from coarse3d_tpu.ops.knn import knn_postprocess

__all__ = ["border_mask", "crf_refine", "knn_postprocess"]
