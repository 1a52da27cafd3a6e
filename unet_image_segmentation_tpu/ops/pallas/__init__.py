from unet_image_segmentation_tpu.ops.pallas.fused_sepconv import (  # noqa: F401
    fused_sepconv_bn_relu,
    sepconv_apply,
)
