"""Losses/metrics vs hand-checked NumPy oracles.

Oracle formulas transcribed from reference ``utils/metrics.py:26-62`` and
``utils/loss.py:9-48`` (spatial-axes [1,2] reductions, smooth=1e-7).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from unet_image_segmentation_tpu.ops import (
    bce_loss,
    dice_coef,
    dice_loss,
    get_loss,
    iou_coef,
    iou_loss,
    jaccard_loss,
    mean_iou_init,
    mean_iou_result,
    mean_iou_update,
)
from unet_image_segmentation_tpu.ops.metrics import (
    confusion_matrix,
    mean_iou_from_cm,
    per_class_iou_from_cm,
    sample_iou,
)

SMOOTH = 1e-7


def np_dice(y_true, y_pred, smooth=SMOOTH):
    inter = (y_true * y_pred).sum(axis=(1, 2))
    s = y_true.sum(axis=(1, 2)) + y_pred.sum(axis=(1, 2))
    return float(np.mean((2 * inter + smooth) / (s + smooth)))


def np_iou(y_true, y_pred, smooth=SMOOTH):
    inter = (y_true * y_pred).sum(axis=(1, 2))
    union = y_true.sum(axis=(1, 2)) + y_pred.sum(axis=(1, 2)) - inter
    return float(np.mean((inter + smooth) / (union + smooth)))


@pytest.fixture
def batch(rng_np):
    y_true = (rng_np.rand(4, 16, 16, 1) > 0.5).astype(np.float32)
    y_pred = rng_np.rand(4, 16, 16, 1).astype(np.float32)
    return y_true, y_pred


def test_dice_coef_matches_numpy(batch):
    y_true, y_pred = batch
    got = float(dice_coef(jnp.asarray(y_true), jnp.asarray(y_pred)))
    assert got == pytest.approx(np_dice(y_true, y_pred), rel=1e-6)


def test_iou_coef_matches_numpy(batch):
    y_true, y_pred = batch
    got = float(iou_coef(jnp.asarray(y_true), jnp.asarray(y_pred)))
    assert got == pytest.approx(np_iou(y_true, y_pred), rel=1e-6)


def test_dice_loss_is_one_minus_coef(batch):
    y_true, y_pred = batch
    assert float(dice_loss(y_true, y_pred)) == pytest.approx(
        1.0 - np_dice(y_true, y_pred), rel=1e-6
    )


def test_iou_loss_and_jaccard_alias(batch):
    y_true, y_pred = batch
    expected = 1.0 - np_iou(y_true, y_pred)
    assert float(iou_loss(y_true, y_pred)) == pytest.approx(expected, rel=1e-6)
    assert jaccard_loss is iou_loss


def test_perfect_prediction_limits():
    y = np.ones((2, 8, 8, 1), np.float32)
    assert float(dice_coef(y, y)) == pytest.approx(1.0, abs=1e-6)
    assert float(dice_loss(y, y)) == pytest.approx(0.0, abs=1e-6)
    z = np.zeros_like(y)
    # all-empty masks: smooth/smooth -> 1.0 (reference semantics)
    assert float(dice_coef(z, z)) == pytest.approx(1.0, abs=1e-6)


def test_bce_matches_numpy(batch):
    y_true, y_pred = batch
    eps = SMOOTH
    p = np.clip(y_pred, eps, 1 - eps)
    expected = float(
        np.mean(-(y_true * np.log(p) + (1 - y_true) * np.log(1 - p)))
    )
    assert float(bce_loss(y_true, y_pred)) == pytest.approx(expected, rel=1e-5)


def test_get_loss_registry():
    assert get_loss("dice") is dice_loss
    assert get_loss("bce") is bce_loss
    with pytest.raises(ValueError):
        get_loss("nope")


# ---- MeanIoU (Keras semantics) ----


def np_confusion(y_true, y_pred, n):
    t = y_true.astype(np.int64).reshape(-1)
    p = y_pred.astype(np.int64).reshape(-1)
    cm = np.zeros((n, n))
    for ti, pi in zip(t, p):
        cm[ti, pi] += 1
    return cm


def test_confusion_matrix_int_cast_semantics(rng_np):
    # Raw probabilities int-cast like Keras MeanIoU (floor).
    y_true = (rng_np.rand(2, 8, 8, 1) > 0.5).astype(np.float32)
    y_pred = rng_np.rand(2, 8, 8, 1).astype(np.float32)
    got = np.asarray(confusion_matrix(jnp.asarray(y_true), jnp.asarray(y_pred), 2))
    expected = np_confusion(y_true, y_pred.astype(np.int32), 2)
    np.testing.assert_allclose(got, expected)


def test_confusion_matrix_thresholded(rng_np):
    y_true = (rng_np.rand(2, 8, 8, 1) > 0.5).astype(np.float32)
    y_pred = rng_np.rand(2, 8, 8, 1).astype(np.float32)
    got = np.asarray(
        confusion_matrix(jnp.asarray(y_true), jnp.asarray(y_pred), 2, threshold=0.5)
    )
    expected = np_confusion(y_true, (y_pred > 0.5).astype(np.int32), 2)
    np.testing.assert_allclose(got, expected)


def test_mean_iou_accumulation(rng_np):
    state = mean_iou_init(2)
    cms = np.zeros((2, 2))
    for _ in range(3):
        y_true = (rng_np.rand(2, 8, 8, 1) > 0.5).astype(np.float32)
        y_pred = (rng_np.rand(2, 8, 8, 1) > 0.3).astype(np.float32)
        state = mean_iou_update(state, jnp.asarray(y_true), jnp.asarray(y_pred), 0.5)
        cms += np_confusion(y_true, y_pred, 2)
    tp = np.diag(cms)
    denom = cms.sum(0) + cms.sum(1) - tp
    expected = np.mean(tp[denom > 0] / denom[denom > 0])
    assert float(mean_iou_result(state)) == pytest.approx(expected, rel=1e-6)


def test_mean_iou_ignores_absent_classes():
    cm = jnp.asarray([[10.0, 0.0], [0.0, 0.0]])
    assert float(mean_iou_from_cm(cm)) == pytest.approx(1.0)
    per_class = np.asarray(per_class_iou_from_cm(cm))
    np.testing.assert_allclose(per_class, [1.0, 0.0])


def test_sample_iou_scalar_and_batched(rng_np):
    a = (rng_np.rand(8, 8) > 0.5).astype(np.float32)
    b = (rng_np.rand(8, 8) > 0.5).astype(np.float32)
    inter = (a * b).sum()
    union = a.sum() + b.sum() - inter
    expected = (inter + SMOOTH) / (union + SMOOTH)
    assert float(sample_iou(a, b)) == pytest.approx(float(expected), rel=1e-6)
    batched = sample_iou(a[None, ..., None], b[None, ..., None])
    assert batched.shape == (1,)
    assert float(batched[0]) == pytest.approx(float(expected), rel=1e-6)
