from unet_image_segmentation_tpu.ops.losses import (  # noqa: F401
    bce_loss,
    dice_loss,
    get_loss,
    iou_loss,
    jaccard_loss,
)
from unet_image_segmentation_tpu.ops.metrics import (  # noqa: F401
    MeanIoUState,
    confusion_matrix,
    dice_coef,
    iou_coef,
    mean_iou_from_cm,
    mean_iou_init,
    mean_iou_result,
    mean_iou_update,
)
