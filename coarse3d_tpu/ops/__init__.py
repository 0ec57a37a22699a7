from coarse3d_tpu.ops import gather, projection, resize, sinkhorn

__all__ = ["gather", "projection", "resize", "sinkhorn"]
