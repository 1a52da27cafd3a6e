"""unet_image_segmentation_tpu — TPU-native semantic-segmentation framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
``planck-epoch/unet-image-segmentation`` (TF2/Keras):

* :mod:`.models` — Flax U-Net (separable-conv and full-conv variants)
  designed for the TPU MXU (transpose-conv-as-matmul decoder, NHWC).
* :mod:`.ops` — jittable dice/IoU/BCE losses, Keras-semantics MeanIoU,
  device-side preprocessing, and Pallas fused kernels for the hot path.
* :mod:`.parallel` — device-mesh runtime: data-parallel sharding over ICI
  and halo-exchange spatial partitioning for high-resolution inputs.
* :mod:`.data` — host-parallel loader for the reference dataset directory
  contract, plus MIDV-500/2019 download/rasterize/split utilities.
* :mod:`.train` — pjit train step, AdamW, checkpoint/early-stop/
  reduce-LR-on-plateau/TensorBoard callbacks, Orbax resume.
* :mod:`.export` — StableHLO serving artifact + metadata sidecar
  (replacing the reference's TFLite pair) and optional TFLite bridge.
* :mod:`.utils` — contour/warp post-processing (reference utils/image.py
  parity) and Keras ``.h5`` checkpoint import.
"""

__version__ = "0.1.0"

# Keep the top-level import light: heavy deps (cv2, orbax, TF compat)
# are imported lazily by their submodules.
from unet_image_segmentation_tpu.config import (  # noqa: F401
    Config,
    DataConfig,
    EvalConfig,
    InferConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
