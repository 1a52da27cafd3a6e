"""Jittable segmentation losses.

Reference parity (``utils/loss.py``):

* :func:`dice_loss` = ``1 - dice_coef`` (``loss.py:9-29``)
* :func:`iou_loss` = ``1 - iou_coef`` (``loss.py:31-45``) — note the
  reference version crashes with ``NameError`` if ever called because it
  never imports ``iou_coef`` (``loss.py:43``); this implementation is the
  working fix (BASELINE configs[2] exercises IoU loss).
* :data:`jaccard_loss` — alias of :func:`iou_loss` (``loss.py:48``)
* :func:`bce_loss` — binary cross-entropy with Keras-style probability
  clipping, for the BCE-vs-Dice-vs-IoU variant in BASELINE configs[2].
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from unet_image_segmentation_tpu.ops.metrics import SMOOTH, dice_coef, iou_coef


def dice_loss(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    return 1.0 - dice_coef(y_true, y_pred)


def iou_loss(y_true: jax.Array, y_pred: jax.Array, smooth: float = SMOOTH) -> jax.Array:
    return 1.0 - iou_coef(y_true, y_pred, smooth=smooth)


# Alias for Jaccard loss (reference utils/loss.py:48).
jaccard_loss = iou_loss


def bce_loss(y_true: jax.Array, y_pred: jax.Array, eps: float = SMOOTH) -> jax.Array:
    """Binary cross-entropy on probabilities, mean over all elements.

    Matches ``keras.backend.binary_crossentropy`` numerics: predictions are
    clipped to [eps, 1-eps] before the log.
    """
    y_true = y_true.astype(jnp.float32)
    y_pred = jnp.clip(y_pred.astype(jnp.float32), eps, 1.0 - eps)
    ce = -(y_true * jnp.log(y_pred) + (1.0 - y_true) * jnp.log(1.0 - y_pred))
    return jnp.mean(ce)


def categorical_ce_loss(
    y_true: jax.Array, y_pred: jax.Array, eps: float = SMOOTH
) -> jax.Array:
    """Categorical cross-entropy on softmax probabilities.

    ``y_true`` one-hot (B, H, W, C); mean over pixels (Keras
    ``CategoricalCrossentropy`` semantics with probability clipping).
    For the multi-class configs (BASELINE configs[3]).
    """
    y_true = y_true.astype(jnp.float32)
    y_pred = jnp.clip(y_pred.astype(jnp.float32), eps, 1.0)
    per_pixel = -jnp.sum(y_true * jnp.log(y_pred), axis=-1)
    return jnp.mean(per_pixel)


SUMS_LOSSES = ("dice", "iou", "jaccard")
# The multiclass fused head additionally emits a per-sample CCE sum, so
# softmax models can train any of these through the sums contract.
SUMS_LOSSES_MULTICLASS = SUMS_LOSSES + ("cce",)


def sums_loss_supported(name: str, num_classes: int) -> bool:
    """Can ``loss_from_sums`` express this loss for this head?"""
    return name in (
        SUMS_LOSSES_MULTICLASS if num_classes > 1 else SUMS_LOSSES
    )


def loss_from_sums(name: str, sums: dict) -> jax.Array:
    """Loss from the fused head's per-sample reductions.

    ``sums``: the SUM_KEYS dict (``ops.pallas.fused_head``) — ``i`` =
    per-sample intersection, ``p`` = prediction sum, ``t`` = target sum
    (binary head: shape ``(B,)``; multiclass head: ``(B, C)`` per class,
    plus ``cce`` = per-sample sum of clipped cross-entropy).  Same
    formula/order as the composed losses (per-sample[-and-class]
    coefficient, mean, 1 - mean for the dice family; pixel-mean for cce),
    so the fused training path reproduces the composed loss to
    reduction-order noise.
    """
    if name == "cce":
        if "cce" not in sums:
            raise ValueError(
                "loss 'cce' needs the multiclass head sums (key 'cce')"
            )
        # mean over pixels (Keras CategoricalCrossentropy): every valid
        # pixel carries exactly one true class, so sum(t) == H*W
        npix = jnp.sum(sums["t"], axis=-1)
        return jnp.mean(sums["cce"] / jnp.maximum(npix, 1.0))
    i, p, t = sums["i"], sums["p"], sums["t"]
    if name == "dice":
        coef = (2.0 * i + SMOOTH) / (t + p + SMOOTH)
    elif name in ("iou", "jaccard"):
        coef = (i + SMOOTH) / (t + p - i + SMOOTH)
    else:
        raise ValueError(
            f"loss {name!r} is not expressible from the head sums; "
            f"available: {SUMS_LOSSES_MULTICLASS}"
        )
    return 1.0 - jnp.mean(coef)


_LOSSES: dict[str, Callable[..., jax.Array]] = {
    "dice": dice_loss,
    "iou": iou_loss,
    "jaccard": jaccard_loss,
    "bce": bce_loss,
    "cce": categorical_ce_loss,
}


def get_loss(name: str) -> Callable[..., jax.Array]:
    try:
        return _LOSSES[name]
    except KeyError:
        raise ValueError(
            f"Unknown loss {name!r}; available: {sorted(_LOSSES)}"
        ) from None
