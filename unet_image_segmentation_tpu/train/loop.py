"""The training loop — reference ``model.fit`` rebuilt around a pjit step.

Per epoch: prefetched host batches -> device (sharded over the mesh's
'data' axis) -> one fused XLA train step -> device-side metric accumulation
(scalar + confusion-matrix sums stay on device; ONE fetch per epoch, so the
hot loop never host-syncs) -> validation pass -> callbacks
(best checkpoint / early stop / LR plateau / TensorBoard) — the same
observable behaviour as reference ``scripts/train.py:308-331``, plus true
resume, which the reference lacks (SURVEY.md §5 checkpoint/resume).

Metric names mirror Keras logs: ``loss``, ``dice_coef``, ``mean_io_u``
(Keras int-cast semantics — pessimistic, see ops.metrics), ``val_*``
variants, plus the corrected ``mean_io_u_thresh`` pair.
"""

from __future__ import annotations

import json
import os
import signal
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from unet_image_segmentation_tpu.config import Config
from unet_image_segmentation_tpu.data.loader import DirectoryDataset, Prefetcher, make_loaders
from unet_image_segmentation_tpu.models.unet import build_unet
from unet_image_segmentation_tpu.ops.metrics import mean_iou_from_cm, per_class_iou_from_cm
from unet_image_segmentation_tpu.parallel.mesh import batch_sharding, create_mesh
from unet_image_segmentation_tpu.train import checkpoint as ckpt_lib
from unet_image_segmentation_tpu.train.callbacks import (
    BestCheckpoint,
    CallbackList,
    EarlyStopping,
    ReduceLROnPlateau,
    TensorBoardLogger,
)
from unet_image_segmentation_tpu.train.state import TrainState, create_train_state
from unet_image_segmentation_tpu.train.steps import make_eval_step, make_train_step
from unet_image_segmentation_tpu.utils.profiling import StepTimer, trace


import contextlib


def _null_ctx():
    return contextlib.nullcontext()


@dataclass
class FitResult:
    state: TrainState
    history: Dict[str, List[float]] = field(default_factory=dict)
    best_score: float = float("nan")
    best_epoch: int = -1
    stopped_epoch: int = -1
    epochs_run: int = 0


@jax.jit
def _tree_add(a, b):
    return jax.tree_util.tree_map(jax.numpy.add, a, b)


class _EpochMetrics:
    """Device-side accumulator: per-step sums stay on device.

    ``update`` only dispatches an async tree-add (no host sync in the hot
    loop — the round-1 per-step ``device_get`` cost real throughput);
    everything is fetched ONCE in :meth:`result` at epoch end.
    """

    def __init__(self) -> None:
        self._dev: Optional[Dict[str, jax.Array]] = None
        self.n = 0

    def update(self, metrics: Dict[str, jax.Array]) -> None:
        self._dev = metrics if self._dev is None else _tree_add(self._dev, metrics)
        self.n += 1

    def result(self, prefix: str = "") -> Dict[str, float]:
        if self._dev is None:
            return {}
        host = jax.device_get(self._dev)  # the epoch's single sync point
        sums = {k: np.asarray(v) for k, v in host.items()}
        out = {
            prefix + k: float(v) / max(self.n, 1)
            for k, v in sums.items()
            if not k.startswith("cm_")
        }
        if "cm_raw" in sums:
            out[prefix + "mean_io_u"] = float(
                mean_iou_from_cm(jax.numpy.asarray(sums["cm_raw"]))
            )
        if "cm_thresh" in sums:
            cm = jax.numpy.asarray(sums["cm_thresh"])
            out[prefix + "mean_io_u_thresh"] = float(mean_iou_from_cm(cm))
            if cm.shape[0] > 2:  # multi-class: per-class IoU breakdown
                for i, v in enumerate(per_class_iou_from_cm(cm)):
                    out[prefix + f"iou_class_{i}"] = float(v)
        if prefix + "dice" in out:
            out[prefix + "dice_coef"] = out.pop(prefix + "dice")
        return out


def fit(
    cfg: Config,
    train_ds: Optional[DirectoryDataset] = None,
    val_ds: Optional[DirectoryDataset] = None,
    mesh=None,
    state: Optional[TrainState] = None,
    callbacks: Optional[List[Any]] = None,
    verbose: bool = True,
) -> FitResult:
    tcfg = cfg.train
    # tcfg.rng_impl is honored via typed keys (state.make_root_key) — no
    # process-global jax_default_prng_impl mutation, which leaked into
    # unrelated code in the same process.
    if train_ds is None or val_ds is None:
        train_ds, val_ds = make_loaders(cfg)
    if cfg.data.auto_pack:
        # Directory datasets pack themselves on the first epoch and serve
        # every later epoch from the mmap'd packed reader (data/autopack.py)
        # — the reference directory contract stops being loader-bound
        # without user action.  Non-directory datasets pass through.
        from unet_image_segmentation_tpu.data.autopack import maybe_autopack

        train_ds = maybe_autopack(
            train_ds,
            pack_dir=cfg.data.pack_dir,
            fallback_dir=tcfg.model_out,
            verbose=verbose,
        )
        val_ds = maybe_autopack(
            val_ds,
            pack_dir=cfg.data.pack_dir,
            fallback_dir=tcfg.model_out,
            verbose=verbose,
        )
    if mesh is None:
        mcfg = cfg.mesh
        if mcfg.spatial_axis != 1 or mcfg.data_axis != -1:
            # explicit mesh from config (``--mesh`` / mesh section): build
            # what was asked for, clamping the spatial axis to the devices
            # actually present (presets ship multi-chip layouts — e.g.
            # highres_1024 asks for spatial=2 — but must still run on one
            # chip)
            import jax as _jax

            spatial_req = mcfg.spatial_axis
            n_dev = _jax.device_count()
            spatial_eff = spatial_req
            while spatial_eff > 1 and n_dev % spatial_eff:
                spatial_eff -= 1
            if spatial_eff != spatial_req and verbose:
                print(
                    f"Note: mesh spatial={spatial_req} clamped to "
                    f"{spatial_eff} ({n_dev} device(s) present)."
                )
            mesh = create_mesh(data=mcfg.data_axis, spatial=spatial_eff)
        else:
            # default: largest DP degree that divides the batch (the
            # reference default batch is 2; users shouldn't have to size
            # the mesh by hand)
            import jax as _jax

            n_dev = _jax.device_count()
            dp = 1
            for d in range(min(n_dev, tcfg.batch_size), 0, -1):
                if tcfg.batch_size % d == 0:
                    dp = d
                    break
            mesh = create_mesh(data=dp, devices=_jax.devices()[:dp])
            if dp < n_dev and verbose:
                print(
                    f"Note: batch {tcfg.batch_size} uses {dp}/{n_dev} devices "
                    f"(data-parallel degree must divide the batch)."
                )

    # --- training-path selection (Pallas chains x the mesh) ---
    import dataclasses as _dc

    from unet_image_segmentation_tpu.ops.losses import sums_loss_supported

    n_spatial = mesh.shape.get("spatial", 1)
    n_data = mesh.shape["data"]
    model_cfg = cfg.model
    depth = len(model_cfg.filters)
    spatial_fused = False
    if model_cfg.use_pallas and n_spatial > 1:
        # Spatially-sharded fused chains (rows on 'spatial', 1-row
        # z-space halo exchange per link over ICI — ops/pallas/
        # fused_train.py spatial section) need the sums-form loss
        # contract and pool-aligned shard heights; anything else drops
        # to the GSPMD-XLA step, loudly.
        spatial_fused = (
            model_cfg.conv_type == "separable"
            and model_cfg.use_batch_norm
            and sums_loss_supported(tcfg.loss, model_cfg.num_classes)
            and model_cfg.image_height % (n_spatial * 2**depth) == 0
        )
        if not spatial_fused:
            print(
                "WARNING: the spatially-sharded fused train step needs "
                "conv_type='separable', use_batch_norm, a sums-form loss "
                "(dice family; + cce for a softmax head) and "
                f"image_height % {n_spatial * 2**depth} == 0; this "
                f"configuration (conv_type={model_cfg.conv_type!r}, "
                f"num_classes={model_cfg.num_classes}, loss={tcfg.loss!r}, "
                f"H={model_cfg.image_height}) trains on the GSPMD-XLA "
                "path."
            )
            model_cfg = _dc.replace(model_cfg, use_pallas=False)
    use_smap = model_cfg.use_pallas and (n_data * n_spatial) > 1
    if model_cfg.use_pallas and not (
        model_cfg.conv_type == "separable" and model_cfg.use_batch_norm
    ):
        print(
            "WARNING: the fused Pallas training chain needs "
            "conv_type='separable' and use_batch_norm=True; this "
            f"configuration (conv_type={model_cfg.conv_type!r}, "
            f"use_batch_norm={model_cfg.use_batch_norm}) trains on the "
            "XLA path."
        )
    if spatial_fused:
        bn_axis = ("data", "spatial")
    elif use_smap:
        bn_axis = "data"
    else:
        bn_axis = None
    model = build_unet(
        model_cfg,
        bn_axis_name=bn_axis,
        spatial_axis_name="spatial" if spatial_fused else None,
    )
    if state is None:
        state = create_train_state(cfg, model=model)
    else:
        # external states (tests, resume chains) must run through THIS
        # mesh-aware model, not whatever model they were created with
        state = state.replace(apply_fn=model.apply)

    model_kwargs = dict(
        num_classes=cfg.model.num_classes,
        filters=list(cfg.model.filters),
        dropout_rate=cfg.model.dropout_rate,
        use_batch_norm=cfg.model.use_batch_norm,
        conv_type=cfg.model.conv_type,
        image_height=cfg.model.image_height,
        image_width=cfg.model.image_width,
        image_channels=cfg.model.image_channels,
    )

    if callbacks is None:
        log_dir = os.path.join(tcfg.log_dir, time.strftime("%Y%m%d_%H%M%S"))
        callbacks = [
            BestCheckpoint(
                tcfg.model_out,
                monitor=tcfg.monitor,
                mode=tcfg.monitor_mode,
                model_kwargs=model_kwargs,
                verbose=verbose,
            ),
            EarlyStopping(
                monitor=tcfg.monitor,
                mode=tcfg.monitor_mode,
                patience=tcfg.early_stop_patience,
                restore_best_weights=tcfg.restore_best_weights,
                verbose=verbose,
            ),
            ReduceLROnPlateau(
                monitor=tcfg.monitor,
                mode=tcfg.monitor_mode,
                factor=tcfg.reduce_lr_factor,
                patience=tcfg.reduce_lr_patience,
                min_lr=tcfg.min_lr,
                verbose=verbose,
            ),
            TensorBoardLogger(log_dir, histogram_freq=tcfg.histogram_freq),
        ]
    cb_list = CallbackList(callbacks)

    start_epoch = 0
    if tcfg.resume:
        meta = ckpt_lib.read_meta(tcfg.model_out)
        last = os.path.join(os.path.abspath(tcfg.model_out), "last")
        if meta is not None and os.path.isdir(last):
            state = ckpt_lib.restore_state(last, state)
            start_epoch = int(meta.get("epoch", -1)) + 1
            cb_list.load_state_dict(meta.get("callbacks", {}))
            if "learning_rate" in meta:
                state = state.set_learning_rate(float(meta["learning_rate"]))
            if verbose:
                print(f"Resumed from {last} at epoch {start_epoch}")

    train_step = make_train_step(model, tcfg.loss, mesh=mesh if use_smap else None)
    if spatial_fused:
        # validation through the XLA module under GSPMD (running stats,
        # no batch moments, halos inserted by the partitioner) — the
        # fused inference kernels are not row-shardable module-side
        eval_model = build_unet(_dc.replace(model_cfg, use_pallas=False))
        eval_step = make_eval_step(eval_model, tcfg.loss, mesh=None)
    else:
        eval_step = make_eval_step(
            model, tcfg.loss, mesh=mesh if use_smap else None
        )
    data_sharding = batch_sharding(mesh, spatial=n_spatial > 1)

    def put(batch):
        return tuple(jax.device_put(np.asarray(x), data_sharding) for x in batch)

    steps_per_epoch = max(1, len(train_ds) // tcfg.batch_size)
    val_steps = max(1, len(val_ds) // tcfg.batch_size)
    history: Dict[str, List[float]] = {}
    result = FitResult(state=state, history=history)

    if tcfg.batch_size % n_data:
        raise ValueError(
            f"batch_size {tcfg.batch_size} not divisible by data-parallel "
            f"degree {n_data}"
        )
    if n_spatial > 1 and cfg.model.image_height % n_spatial:
        raise ValueError(
            f"image_height {cfg.model.image_height} not divisible by "
            f"spatial degree {n_spatial}"
        )

    # Preemption safety (SURVEY §5 failure detection): on SIGTERM/SIGINT a
    # flag is set and training stops at the next epoch boundary with the
    # rolling 'last' checkpoint + meta already on disk, so --resume
    # continues cleanly. Handlers only attach on the main thread.
    stop_requested = {"flag": False}
    old_handlers = {}
    if threading.current_thread() is threading.main_thread():
        def _request_stop(signum, frame):
            print(f"\nSignal {signum} received: finishing epoch, "
                  f"checkpointing to {tcfg.model_out}/last, then stopping.")
            stop_requested["flag"] = True
        for sig in (signal.SIGTERM,):
            old_handlers[sig] = signal.signal(sig, _request_stop)

    # effective config dump for reproducibility
    out_dir_early = os.path.abspath(tcfg.model_out)
    os.makedirs(out_dir_early, exist_ok=True)
    with open(os.path.join(out_dir_early, "config.json"), "w") as f:
        f.write(cfg.to_json(indent=2))

    for epoch in range(start_epoch, tcfg.epochs):
        t0 = time.perf_counter()
        acc = _EpochMetrics()
        batches = Prefetcher(
            train_ds.batches(
                tcfg.batch_size,
                epoch=epoch,
                steps=steps_per_epoch,
                num_workers=cfg.data.num_workers,
            ),
            depth=cfg.data.prefetch,
        )
        timer = StepTimer(sync_every=32)
        timer.start()
        profiling = (
            tcfg.profile_dir is not None and epoch == start_epoch
        )
        profile_ctx = (
            trace(tcfg.profile_dir) if profiling else _null_ctx()
        )
        step_in_epoch = 0
        with profile_ctx:
            for images, masks in batches:
                images, masks = put((images, masks))
                state, metrics = train_step(state, images, masks)
                acc.update(metrics)  # async device-side sum, no host sync
                timer.lap(metrics)  # syncs once per 32-step window
                step_in_epoch += 1
                if profiling and step_in_epoch >= tcfg.profile_steps:
                    break
        if profiling:  # finish the epoch outside the trace
            for images, masks in batches:
                images, masks = put((images, masks))
                state, metrics = train_step(state, images, masks)
                acc.update(metrics)
                timer.lap(metrics)
        logs = acc.result()
        logs.update({f"step_{k}": v for k, v in timer.summary().items()})

        vacc = _EpochMetrics()
        vbatches = Prefetcher(
            val_ds.batches(
                tcfg.batch_size,
                epoch=0,
                steps=val_steps,
                num_workers=cfg.data.num_workers,
            ),
            depth=cfg.data.prefetch,
        )
        for images, masks in vbatches:
            images, masks = put((images, masks))
            vacc.update(eval_step(state, images, masks))
        logs.update(vacc.result(prefix="val_"))
        logs["epoch_time_sec"] = time.perf_counter() - t0

        state = cb_list.on_epoch_end(epoch, logs, state)

        for k, v in logs.items():
            history.setdefault(k, []).append(float(v))
        if verbose:
            msg = " - ".join(
                f"{k}: {v:.4f}"
                for k, v in logs.items()
                if k in (
                    "loss", "dice_coef", "mean_io_u", "val_loss",
                    "val_dice_coef", "val_mean_io_u", "val_mean_io_u_thresh",
                )
            )
            print(f"Epoch {epoch + 1}/{tcfg.epochs} "
                  f"[{logs['epoch_time_sec']:.1f}s] {msg}")

        # persist resume metadata alongside the rolling 'last' checkpoint
        meta = {
            "epoch": epoch,
            "monitor": tcfg.monitor,
            "mode": tcfg.monitor_mode,
            "callbacks": cb_list.state_dict(),
            "learning_rate": float(jax.device_get(state.learning_rate)),
            "config": cfg.to_dict(),
        }
        out_dir = os.path.abspath(tcfg.model_out)
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=float)

        result.epochs_run = epoch + 1
        if cb_list.should_stop:
            result.stopped_epoch = epoch
            break
        if stop_requested["flag"]:
            result.stopped_epoch = epoch
            break

    for sig, handler in old_handlers.items():
        signal.signal(sig, handler)
    for cb in cb_list.callbacks:
        if isinstance(cb, BestCheckpoint):
            result.best_score = cb.best
            result.best_epoch = cb.best_epoch
        if isinstance(cb, EarlyStopping) and cb.stopped_epoch >= 0:
            result.stopped_epoch = cb.stopped_epoch
    result.state = state
    return result
