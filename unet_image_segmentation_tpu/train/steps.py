"""Jitted train/eval steps (the hot loop).

One fused XLA program per step: forward U-Net -> loss -> backward -> AdamW
update -> metric contributions (reference hot loop, SURVEY.md §3.1).  Under
a ('data', 'spatial') mesh with the batch sharded on 'data', GSPMD inserts
the gradient all-reduce over ICI automatically — the TPU-native replacement
for the reference's (absent) distributed story.

Note on BatchNorm: with a batch sharded over the mesh, the BN batch moments
are computed *globally* (XLA all-reduces the per-device partial sums), i.e.
cross-replica BN. The reference is single-device so its BN is per-replica
by definition; at its default batch of 2 (train.py:72) global stats are the
*better-behaved* choice. Documented per SURVEY.md §7.3 hard-part 3.

Metrics returned per step:
* ``loss`` — batch loss (mean over batch like Keras).
* ``dice`` — dice_coef (reference metric, train.py:231-233).
* ``cm_raw`` — 2x2 confusion matrix with Keras MeanIoU's int-cast
  semantics (pessimistic; for parity with reference logs).
* ``cm_thresh`` — thresholded (>0.5) confusion matrix (deployed
  semantics, used for the acceptance gate).
Confusion matrices are accumulated on host across an epoch and reduced via
:func:`..ops.metrics.mean_iou_from_cm`.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from unet_image_segmentation_tpu.models.unet import UNet
from unet_image_segmentation_tpu.ops.losses import (
    get_loss,
    loss_from_sums,
    sums_loss_supported,
)
from unet_image_segmentation_tpu.ops.metrics import SMOOTH, confusion_matrix, dice_coef
from unet_image_segmentation_tpu.train.state import TrainState

Metrics = Dict[str, jax.Array]


def _psum_replicated_cotangent(x, axis):
    """``psum`` whose transpose is the IDENTITY instead of another psum.

    With ``check_vma=False`` shard_map cannot track replication, so the
    transpose of ``lax.psum`` is defined as ``psum`` — which double-counts
    when the cotangent is replicated (here: the loss is computed
    identically on every spatial shard from the psum'd sums, so the true
    per-shard partial is exactly the replicated cotangent, once).  The
    stop_gradient construction keeps the forward value and routes the
    backward straight through."""
    return jax.tree_util.tree_map(
        lambda v: v + jax.lax.stop_gradient(jax.lax.psum(v, axis) - v), x
    )


def _reduce_metrics(metrics: Metrics, axis: str) -> Metrics:
    """Collapse per-shard metrics to their global-batch values.

    Confusion matrices are per-shard COUNTS (psum); scalar metrics are
    per-shard means over equal shards (pmean == global mean)."""
    return {
        k: jax.lax.psum(v, axis) if k.startswith("cm_") else jax.lax.pmean(v, axis)
        for k, v in metrics.items()
    }


def _prep_masks(masks: jax.Array, num_classes: int) -> jax.Array:
    """Loss-ready masks: binary passthrough; class-id -> one-hot (C > 1)."""
    if num_classes <= 1:
        return masks
    if masks.ndim == 4 and masks.shape[-1] == num_classes:
        return masks  # already one-hot
    labels = masks[..., 0] if masks.ndim == 4 else masks
    return jax.nn.one_hot(labels.astype(jnp.int32), num_classes, dtype=jnp.float32)


def _metric_bundle_sums(
    sums: Metrics, masks: jax.Array, npix_scale: int = 1
) -> Metrics:
    """The binary metric bundle computed from the fused head's per-sample
    reductions — same values as :func:`_metric_bundle` on materialized
    probabilities (TP = intersection count, FP = P - I, FN = T - I,
    TN = pixels - TP - FP - FN), without re-reading the activation.
    ``npix_scale``: with image rows sharded over a spatial mesh axis the
    local ``masks`` shard holds 1/n of each sample's pixels while ``sums``
    are already spatial-global — scale the pixel count back up."""
    s = SMOOTH
    dice = jnp.mean((2.0 * sums["i"] + s) / (sums["t"] + sums["p"] + s))
    npix = jnp.float32(
        masks.shape[0] * masks.shape[1] * masks.shape[2] * npix_scale
    )

    def cm(ik: str, pk: str, tk: str) -> jax.Array:
        i = jnp.sum(sums[ik])
        p = jnp.sum(sums[pk])
        t = jnp.sum(sums[tk])
        return jnp.stack(
            [
                jnp.stack([npix - p - t + i, p - i]),
                jnp.stack([t - i, i]),
            ]
        )

    return {
        "dice": dice,
        "cm_raw": cm("ir", "pr", "tr"),
        "cm_thresh": cm("it", "pt", "tt"),
    }


def _metric_bundle_sums_mc(sums: Metrics) -> Metrics:
    """Multiclass metric bundle from the fused softmax head's reductions —
    same values as :func:`_metric_bundle` with ``num_classes > 1``: mean
    per-class dice from the (B, C) sums, and the argmax confusion matrix
    (identical raw/thresholded semantics for a softmax head)."""
    s = SMOOTH
    dice = jnp.mean((2.0 * sums["i"] + s) / (sums["t"] + sums["p"] + s))
    cm = jnp.sum(sums["cm"], axis=0)
    return {"dice": dice, "cm_raw": cm, "cm_thresh": cm}


def _metric_bundle(masks: jax.Array, preds: jax.Array, num_classes: int) -> Metrics:
    nc = max(num_classes, 2)
    if num_classes > 1:
        # softmax head: argmax class map vs integer class-id mask
        pred_cls = jnp.argmax(preds, axis=-1)
        true_cls = masks[..., 0] if masks.ndim == preds.ndim else masks
        cm_raw = confusion_matrix(true_cls, pred_cls, nc)
        cm_thresh = cm_raw
        dice = dice_coef(_prep_masks(masks, num_classes), preds)
    else:
        cm_raw = confusion_matrix(masks, preds, nc, threshold=None)
        cm_thresh = confusion_matrix(masks, preds, nc, threshold=0.5)
        dice = dice_coef(masks, preds)
    return {
        "dice": dice,
        "cm_raw": cm_raw,
        "cm_thresh": cm_thresh,
    }


def make_train_step(
    model: UNet,
    loss_name: str = "dice",
    donate: bool = True,
    mesh: Optional[Mesh] = None,
) -> Callable[[TrainState, jax.Array, jax.Array], Tuple[TrainState, Metrics]]:
    """Build the jitted train step for ``model``.

    With ``mesh=None`` (default) the step is a plain ``jit`` — on a sharded
    batch GSPMD partitions it and inserts the gradient all-reduce itself.

    With a ``mesh``, the step is wrapped in ``shard_map`` over the mesh's
    'data' axis instead: each device runs the WHOLE step on its local batch
    shard, gradients/loss are ``pmean``-ed and BatchNorm batch moments ride
    the model's ``bn_axis_name`` psums, so numerics match the single-device
    step (equal shards).  This is the composition path for the fused Pallas
    training chains — ``pallas_call`` cannot be partitioned by GSPMD, but
    inside ``shard_map`` every kernel sees ordinary local shapes.  The model
    must have been built with ``bn_axis_name='data'``.  Dropout keys fold in
    the device's axis index so masks decorrelate across shards.
    """
    loss_fn_core = get_loss(loss_name)
    has_bn = model.use_batch_norm
    needs_dropout = model.dropout_rate > 0.0
    spatial = mesh is not None and mesh.shape.get("spatial", 1) > 1
    axis = model.bn_axis_name if mesh is not None else None
    if mesh is not None and model.bn_axis_name is None:
        raise ValueError(
            "shard_map train step needs the model built with "
            "bn_axis_name='data' (BatchNorm moments must psum over shards)"
        )
    if spatial:
        # rows sharded over 'spatial': per-sample loss/metric sums are
        # partial per shard and MUST be psum'd before any nonlinear use
        # (dice is a ratio of sums), so the spatial step requires the
        # sums-form contract
        if not sums_loss_supported(loss_name, model.num_classes):
            raise ValueError(
                "the spatially-sharded fused train step needs a "
                f"sums-form loss for this head (got "
                f"num_classes={model.num_classes}, loss={loss_name!r})"
            )
        if model.spatial_axis_name != "spatial" or not (
            isinstance(axis, (tuple, list)) and "spatial" in tuple(axis)
        ):
            raise ValueError(
                "spatial step needs the model built with "
                "spatial_axis_name='spatial' and bn_axis_name "
                "('data', 'spatial')"
            )
    n_spatial = mesh.shape.get("spatial", 1) if mesh is not None else 1
    # Fused segmentation head: for sums-form losses on a Pallas model
    # (dice family; + cce for the softmax head), the model returns the
    # loss/metric SUMS directly (the last decoder stage + head +
    # reductions are one kernel pair and the probability tensor never
    # reaches HBM — ops/pallas/fused_head.py); loss and the metric bundle
    # come from the sums.  Numerics match the composed path to reduction
    # order (pinned in tests/test_fused_head.py).
    use_head_sums = spatial or (
        model.use_pallas
        and model.use_batch_norm
        and model.conv_type == "separable"
        and sums_loss_supported(loss_name, model.num_classes)
    )

    def step_fn(
        state: TrainState, images: jax.Array, masks: jax.Array
    ) -> Tuple[TrainState, Metrics]:
        dropout_rng = jax.random.fold_in(state.rng, state.step)
        if axis is not None:
            dropout_rng = jax.random.fold_in(
                dropout_rng, jax.lax.axis_index("data")
            )
        if spatial:
            dropout_rng = jax.random.fold_in(
                dropout_rng, jax.lax.axis_index("spatial")
            )

        def loss_fn(params):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
            rngs = {"dropout": dropout_rng} if needs_dropout else None
            kwargs = {"head_targets": masks} if use_head_sums else {}
            if has_bn:
                out, mutated = state.apply_fn(
                    variables, images, train=True, mutable=["batch_stats"],
                    rngs=rngs, **kwargs,
                )
                new_stats = mutated["batch_stats"]
            else:
                out = state.apply_fn(
                    variables, images, train=True, rngs=rngs, **kwargs
                )
                new_stats = state.batch_stats
            if use_head_sums:
                if spatial:
                    # per-sample sums are partial per row shard — global
                    # sums before the (nonlinear) loss ratio; replicated-
                    # cotangent psum so grads don't double-count
                    out = _psum_replicated_cotangent(out, "spatial")
                loss = loss_from_sums(loss_name, out)
            else:
                loss = loss_fn_core(_prep_masks(masks, model.num_classes), out)
            return loss, (out, new_stats)

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if spatial:
            # each device holds a (batch-shard x row-shard) tile: the row
            # shards' partial param grads SUM to the batch shard's grad,
            # equal batch shards pmean to the global-batch grad
            grads = jax.lax.psum(grads, "spatial")
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, ("data", "spatial"))
        elif axis is not None:
            # global-batch gradient: mean of equal-shard means == global
            # mean, so pmean reproduces the GSPMD/single-device numerics
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)
        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        if use_head_sums:
            bundle = (
                _metric_bundle_sums_mc(out)
                if model.num_classes > 1
                else _metric_bundle_sums(out, masks, npix_scale=n_spatial)
            )
        else:
            bundle = _metric_bundle(masks, out, model.num_classes)
        metrics = {"loss": loss, **bundle}
        if spatial:
            # sums (hence cm/dice) are already spatial-global and equal
            # across 'spatial' members — reduce over 'data' only
            metrics = _reduce_metrics(metrics, "data")
        elif axis is not None:
            metrics = _reduce_metrics(metrics, axis)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=donate_argnums)
    batch_spec = P("data", "spatial") if spatial else P("data")
    smapped = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), batch_spec, batch_spec),
        out_specs=(P(), P()),
        check_vma=False,  # pallas_call has no replication rule
    )
    return jax.jit(smapped, donate_argnums=donate_argnums)


def make_eval_step(
    model: UNet, loss_name: str = "dice", mesh: Optional[Mesh] = None
) -> Callable[[TrainState, jax.Array, jax.Array], Metrics]:
    """Jitted validation step (BN running stats, no dropout).

    ``mesh``: like :func:`make_train_step` — shard_map the step over the
    'data' axis (the Pallas inference kernels run per-shard; only the
    metric reductions cross devices)."""
    loss_fn_core = get_loss(loss_name)
    has_bn = model.use_batch_norm
    axis = "data" if mesh is not None else None

    def eval_fn(state: TrainState, images: jax.Array, masks: jax.Array) -> Metrics:
        variables = {"params": state.params}
        if has_bn:
            variables["batch_stats"] = state.batch_stats
        # model.apply, NOT state.apply_fn: the eval model may differ from
        # the train model (e.g. the spatial fused path evaluates through
        # the XLA module under GSPMD, which inserts conv halos itself)
        preds = model.apply(variables, images, train=False)
        loss = loss_fn_core(_prep_masks(masks, model.num_classes), preds)
        metrics = {"loss": loss, **_metric_bundle(masks, preds, model.num_classes)}
        if axis is not None:
            metrics = _reduce_metrics(metrics, axis)
        return metrics

    if mesh is None:
        return jax.jit(eval_fn)
    smapped = jax.shard_map(
        eval_fn,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(smapped)


def make_predict_fn(
    model: UNet,
    params: Any,
    batch_stats: Optional[Any] = None,
) -> Callable[[jax.Array], jax.Array]:
    """Jitted pure forward (inference) closure over fixed variables."""
    variables = {"params": params}
    if batch_stats is not None and model.use_batch_norm:
        variables["batch_stats"] = batch_stats

    @jax.jit
    def predict(images: jax.Array) -> jax.Array:
        return model.apply(variables, images, train=False)

    return predict
