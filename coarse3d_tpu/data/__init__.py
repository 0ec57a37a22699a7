from coarse3d_tpu.data import label_maps, readers, synthetic

__all__ = ["label_maps", "readers", "synthetic"]
