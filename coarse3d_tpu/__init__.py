"""coarse3d_tpu — a TPU-native weakly-supervised LiDAR segmentation framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
astra-vision/COARSE3D (BMVC 2022): spherical range-image projection,
SalsaNext/SqueezeSegV3/RangeNet-style conv encoder-decoders, weak-label
training with focal + Lovász losses, class-prototype contrastive learning
(entropy-driven anchor sampling, Sinkhorn sub-prototype assignment, EMA
prototype memory), KNN range post-processing, and 3D mIoU evaluation over
SemanticKITTI / SemanticPOSS / nuScenes-lidarseg.

Design stance (see SURVEY.md §7): host-side NumPy/C++ pipeline producing
fixed-shape device batches; Flax modules jitted under a `jax.sharding.Mesh`
(data parallelism is plain pjit sharding — batch statistics, gradients,
prototype EMA and metric reductions become global automatically); losses and
prototype updates are pure fixed-shape masked functions inside one
`train_step`; Pallas kernels where XLA's default lowering is weak.
"""

__version__ = "0.1.0"

# Platform pin for CHILD processes (tools/baseline_matrix.py subprocess
# stages, tests): some site configurations register accelerator platforms in
# every python process and ignore the JAX_PLATFORMS env var, so an env-only
# CPU pin is silently lost. Setting COARSE3D_JAX_PLATFORMS=cpu forces the
# platform at package import, which every CLI does before first device use.
import os as _os

_plat = _os.environ.get("COARSE3D_JAX_PLATFORMS")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)
