"""Jittable segmentation metrics.

Semantics match the reference exactly:

* :func:`dice_coef` / :func:`iou_coef` — reference ``utils/metrics.py:6-62``:
  cast to float32, reduce over spatial axes ``[1, 2]`` (per batch x channel),
  smooth with Keras epsilon 1e-7, mean over batch and channels.
* :func:`mean_iou_*` — confusion-matrix MeanIoU equivalent to
  ``tf.keras.metrics.MeanIoU(num_classes=2)`` as compiled into training
  (reference ``scripts/train.py:226-234``) and accumulated in evaluation
  (``scripts/benchmark.py:237,269``).

Keras ``MeanIoU`` **int-casts raw sigmoid probabilities** (flooring anything
< 1.0 to class 0), which makes the training-time curve systematically
pessimistic.  We reproduce that behaviour when ``threshold=None`` (for
comparability with reference training logs) and additionally support a
thresholded variant (``threshold=0.5``) that reflects the real deployed
binarization — the quality number the 0.5%-delta acceptance gate uses.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

# Keras backend epsilon (K.epsilon()), reference utils/metrics.py:4.
SMOOTH = 1e-7


def dice_coef(y_true: jax.Array, y_pred: jax.Array, smooth: float = SMOOTH) -> jax.Array:
    """Mean Dice coefficient over (batch, channels).

    ``(2*I + s) / (|T| + |P| + s)`` with sums over spatial axes [1, 2],
    matching reference ``utils/metrics.py:26-39``.
    """
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    axes = (1, 2)
    intersection = jnp.sum(y_true * y_pred, axis=axes)
    sum_true = jnp.sum(y_true, axis=axes)
    sum_pred = jnp.sum(y_pred, axis=axes)
    dice = (2.0 * intersection + smooth) / (sum_true + sum_pred + smooth)
    return jnp.mean(dice)


def iou_coef(y_true: jax.Array, y_pred: jax.Array, smooth: float = SMOOTH) -> jax.Array:
    """Mean IoU (Jaccard) coefficient; reference ``utils/metrics.py:55-62``."""
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    axes = (1, 2)
    intersection = jnp.sum(y_true * y_pred, axis=axes)
    sum_true = jnp.sum(y_true, axis=axes)
    sum_pred = jnp.sum(y_pred, axis=axes)
    union = sum_true + sum_pred - intersection
    return jnp.mean((intersection + smooth) / (union + smooth))


def confusion_matrix(
    y_true: jax.Array,
    y_pred: jax.Array,
    num_classes: int,
    threshold: Optional[float] = None,
) -> jax.Array:
    """(num_classes, num_classes) confusion matrix, rows = true class.

    ``threshold=None`` reproduces Keras MeanIoU's raw int-cast of
    probabilities (floor); a float threshold binarizes first (the corrected
    deployed semantics).  Implemented as a one-hot matmul so the reduction
    runs on the MXU instead of a scatter.
    """
    if threshold is not None:
        y_pred = (y_pred > threshold).astype(jnp.int32)
        y_true = (y_true > threshold).astype(jnp.int32)
    t = jnp.clip(y_true.astype(jnp.int32).reshape(-1), 0, num_classes - 1)
    p = jnp.clip(y_pred.astype(jnp.int32).reshape(-1), 0, num_classes - 1)
    t1 = jax.nn.one_hot(t, num_classes, dtype=jnp.float32)
    p1 = jax.nn.one_hot(p, num_classes, dtype=jnp.float32)
    return jnp.einsum(
        "ni,nj->ij", t1, p1, preferred_element_type=jnp.float32
    )


def mean_iou_from_cm(cm: jax.Array) -> jax.Array:
    """Keras MeanIoU reduction: mean over classes with nonzero denominator."""
    tp = jnp.diagonal(cm)
    denom = jnp.sum(cm, axis=0) + jnp.sum(cm, axis=1) - tp
    valid = denom > 0
    iou = jnp.where(valid, tp / jnp.where(valid, denom, 1.0), 0.0)
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(iou) / n_valid


def per_class_iou_from_cm(cm: jax.Array) -> jax.Array:
    """Per-class IoU vector (NaN-free; invalid classes report 0)."""
    tp = jnp.diagonal(cm)
    denom = jnp.sum(cm, axis=0) + jnp.sum(cm, axis=1) - tp
    valid = denom > 0
    return jnp.where(valid, tp / jnp.where(valid, denom, 1.0), 0.0)


class MeanIoUState(NamedTuple):
    """Accumulating confusion-matrix state (a pytree; donate/carry in scans)."""

    cm: jax.Array


def mean_iou_init(num_classes: int = 2) -> MeanIoUState:
    return MeanIoUState(cm=jnp.zeros((num_classes, num_classes), jnp.float32))


def mean_iou_update(
    state: MeanIoUState,
    y_true: jax.Array,
    y_pred: jax.Array,
    threshold: Optional[float] = None,
) -> MeanIoUState:
    num_classes = state.cm.shape[0]
    return MeanIoUState(
        cm=state.cm + confusion_matrix(y_true, y_pred, num_classes, threshold)
    )


def mean_iou_result(state: MeanIoUState) -> jax.Array:
    return mean_iou_from_cm(state.cm)


def sample_iou(
    y_true: jax.Array,
    y_pred: jax.Array,
    smooth: float = SMOOTH,
) -> jax.Array:
    """Per-sample scalar IoU on already-binarized masks.

    Matches reference ``scripts/benchmark.py:159-170`` (flatten everything,
    single smoothed ratio). Accepts (H, W) or (B, H, W, ...) — reduces over
    all but the leading batch axis if batched, else to a scalar.
    """
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    if y_true.ndim <= 2:
        axes = None
    else:
        axes = tuple(range(1, y_true.ndim))
    intersection = jnp.sum(y_true * y_pred, axis=axes)
    union = jnp.sum(y_true, axis=axes) + jnp.sum(y_pred, axis=axes) - intersection
    return (intersection + smooth) / (union + smooth)
