from coarse3d_tpu.ops import projection

__all__ = ["projection"]
