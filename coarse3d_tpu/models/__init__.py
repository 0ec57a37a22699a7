from coarse3d_tpu.models.salsanext import SalsaNext

__all__ = ["SalsaNext"]
