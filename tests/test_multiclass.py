"""Multi-class configuration tests (BASELINE configs[3] at reduced size)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("cv2")

from unet_image_segmentation_tpu.config import Config
from unet_image_segmentation_tpu.data.loader import DirectoryDataset
from unet_image_segmentation_tpu.data.synthetic import (
    write_synthetic_multiclass_dataset,
)
from unet_image_segmentation_tpu.ops.losses import categorical_ce_loss, get_loss
from unet_image_segmentation_tpu.train.loop import fit
from unet_image_segmentation_tpu.train.steps import _prep_masks

HW = 32
NC = 3


def test_categorical_ce_matches_numpy(rng_np):
    y_true = np.eye(3, dtype=np.float32)[rng_np.randint(0, 3, (2, 4, 4))]
    logits = rng_np.rand(2, 4, 4, 3).astype(np.float32)
    probs = logits / logits.sum(-1, keepdims=True)
    got = float(categorical_ce_loss(jnp.asarray(y_true), jnp.asarray(probs)))
    expected = float(
        np.mean(-np.sum(y_true * np.log(np.clip(probs, 1e-7, 1.0)), axis=-1))
    )
    assert got == pytest.approx(expected, rel=1e-5)
    assert get_loss("cce") is categorical_ce_loss


def test_prep_masks_one_hot():
    masks = jnp.asarray([[[[0.0], [1.0]], [[2.0], [1.0]]]])  # (1,2,2,1)
    oh = _prep_masks(masks, 3)
    assert oh.shape == (1, 2, 2, 3)
    np.testing.assert_array_equal(np.asarray(oh[0, 0, 0]), [1, 0, 0])
    np.testing.assert_array_equal(np.asarray(oh[0, 1, 0]), [0, 0, 1])
    # binary passthrough
    assert _prep_masks(masks, 1) is masks


def test_class_id_loader(tmp_path):
    root = str(tmp_path / "mc")
    write_synthetic_multiclass_dataset(root, n_train=4, n_val=2,
                                       image_size=(HW, HW), num_classes=NC)
    ds = DirectoryDataset(
        frames_dir=os.path.join(root, "train_frames", "image"),
        masks_dir=os.path.join(root, "train_masks", "image"),
        image_size=(HW, HW),
        mask_mode="class_id",
    )
    img, mask = ds.load_sample(0)
    classes = set(np.unique(mask).astype(int))
    assert classes.issubset({0, 1, 2})
    assert 1 in classes  # the document is always present


def test_multiclass_training_converges(tmp_path):
    root = str(tmp_path / "ds")
    write_synthetic_multiclass_dataset(root, n_train=16, n_val=4,
                                       image_size=(HW, HW), num_classes=NC)
    cfg = Config().override(
        model__image_height=HW,
        model__image_width=HW,
        model__filters=(8, 16),
        model__num_classes=NC,
        model__dropout_rate=0.0,
        data__root=root,
        data__mask_mode="class_id",
        data__num_workers=2,
        train__epochs=3,
        train__batch_size=8,
        train__loss="cce",
        train__model_out=str(tmp_path / "model"),
        train__log_dir=str(tmp_path / "logs"),
    )
    result = fit(cfg, verbose=False)
    hist = result.history
    assert hist["loss"][-1] < hist["loss"][0]
    # per-class IoU breakdown is reported for C > 2
    for key in ("val_iou_class_0", "val_iou_class_1", "val_iou_class_2"):
        assert key in hist, sorted(hist)
    # background class should be learned quickly on this easy task
    assert hist["val_iou_class_0"][-1] > 0.5


def test_multiclass_inference_pipeline(tmp_path):
    """run_inference with a softmax head saves a class-id mask (regression:
    the binary path used to feed a 3-channel image into findContours)."""
    import cv2
    import jax

    from unet_image_segmentation_tpu.data.synthetic import render_sample
    from unet_image_segmentation_tpu.inference import Predictor, run_inference
    from unet_image_segmentation_tpu.models.unet import UNet, init_unet
    from unet_image_segmentation_tpu.train.checkpoint import save_inference_variables

    model = UNet(num_classes=NC, filters=(8, 16), dropout_rate=0.0)
    variables = init_unet(model, jax.random.PRNGKey(0), (HW, HW, 3))
    ckpt = str(tmp_path / "mc_ckpt")
    save_inference_variables(
        ckpt, variables["params"], variables.get("batch_stats"),
        model_kwargs=dict(num_classes=NC, filters=[8, 16], dropout_rate=0.0,
                          use_batch_norm=True, conv_type="separable"),
    )
    img, _, _ = render_sample(np.random.RandomState(2), 48, 40)
    in_path = str(tmp_path / "in.png")
    cv2.imwrite(in_path, img[..., ::-1])

    predictor = Predictor(ckpt, image_size=(HW, HW))
    assert predictor.num_classes == NC
    result = run_inference(
        predictor, in_path,
        str(tmp_path / "mask.png"), str(tmp_path / "crop.png"),
        min_contour_area=5.0, verbose=False,
    )
    mask = cv2.imread(str(tmp_path / "mask.png"), cv2.IMREAD_UNCHANGED)
    assert mask is not None and mask.ndim == 2  # single-channel class ids
    assert mask.shape == (48, 40)
    assert set(np.unique(mask)).issubset(set(range(NC)))
    assert result["num_classes"] == NC
