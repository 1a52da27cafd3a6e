from unet_image_segmentation_tpu.models.unet import UNet, build_unet  # noqa: F401
