from unet_image_segmentation_tpu.data.loader import (  # noqa: F401
    DirectoryDataset,
    Prefetcher,
    make_loaders,
)
