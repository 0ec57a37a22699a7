from coarse3d_tpu.eval.unproject import unproject_image

__all__ = ["unproject_image"]
