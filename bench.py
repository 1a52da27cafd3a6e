#!/usr/bin/env python3
"""Headline benchmark: U-Net train-step throughput at 256x256 (images/sec/chip).

The reference publishes no numbers (BASELINE.md), so the denominator is
self-measured: the reference TF/Keras stack's train-step throughput on CPU
at its own defaults (256x256, dice loss, AdamW — reference
``scripts/train.py:71-90``), cached in ``BASELINE_MEASURED.json`` after the
first run.  ``vs_baseline`` is our TPU images/sec/chip over that number
(north star: >= 10x).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "BASELINE_MEASURED.json")

HW = 256
WARMUP = 3
STEPS = 20


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def measure_ours(batch_size: int = 32, compute_dtype: str = "bfloat16") -> dict:
    import jax

    sys.path.insert(0, REPO)
    from unet_image_segmentation_tpu.config import Config
    from unet_image_segmentation_tpu.models.unet import build_unet
    from unet_image_segmentation_tpu.train.state import create_train_state
    from unet_image_segmentation_tpu.train.steps import make_train_step

    cfg = Config().override(
        model__image_height=HW,
        model__image_width=HW,
        model__compute_dtype=compute_dtype,
        model__use_pallas=os.environ.get("BENCH_PALLAS", "1") == "1",
        train__batch_size=batch_size,
    )
    model = build_unet(cfg.model)
    state = create_train_state(cfg)
    train_step = make_train_step(model, cfg.train.loss, donate=True)

    rng = np.random.RandomState(0)
    images = jax.device_put(rng.rand(batch_size, HW, HW, 3).astype(np.float32))
    masks = jax.device_put(
        (rng.rand(batch_size, HW, HW, 1) > 0.5).astype(np.float32)
    )

    _log(f"compiling train step (batch={batch_size}, {compute_dtype}) ...")
    for _ in range(WARMUP):
        state, metrics = train_step(state, images, masks)
    # NOTE: hard sync via scalar device_get — on tunneled backends
    # block_until_ready can return before execution completes.
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss), f"non-finite warmup loss {loss}"

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = train_step(state, images, masks)
    loss = float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), f"non-finite loss {loss}"

    ips = STEPS * batch_size / dt
    _log(f"ours: {ips:.1f} images/sec ({dt / STEPS * 1e3:.1f} ms/step)")
    return {
        "images_per_sec": ips,
        "ms_per_step": dt / STEPS * 1e3,
        "batch_size": batch_size,
        "compute_dtype": compute_dtype,
        "device": str(jax.devices()[0]),
    }


def measure_tf_baseline(batch_size: int = 2, steps: int = 8) -> float:
    """Reference stack throughput on CPU at its own defaults (batch 2)."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        _log(f"using cached TF baseline: {cached['images_per_sec']:.2f} img/s")
        return float(cached["images_per_sec"])

    _log("measuring TF reference baseline on CPU (first run only) ...")
    os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"
    os.environ["CUDA_VISIBLE_DEVICES"] = "-1"
    import tensorflow as tf

    ref = "/root/reference"
    if os.path.isdir(ref):
        sys.path.insert(0, ref)
        from model.u_net import U_NET
        from utils.loss import dice_loss

        model = U_NET(input_size=(HW, HW, 3), num_classes=1)
        loss = dice_loss
    else:  # fall back: equivalent keras graph is required for the denominator
        raise RuntimeError("reference checkout unavailable; cannot measure baseline")

    model.compile(
        optimizer=tf.keras.optimizers.AdamW(learning_rate=2e-3, weight_decay=1e-4),
        loss=loss,
    )
    rng = np.random.RandomState(0)
    x = rng.rand(batch_size, HW, HW, 3).astype(np.float32)
    y = (rng.rand(batch_size, HW, HW, 1) > 0.5).astype(np.float32)
    model.train_on_batch(x, y)  # build + first step
    model.train_on_batch(x, y)
    t0 = time.perf_counter()
    for _ in range(steps):
        model.train_on_batch(x, y)
    dt = time.perf_counter() - t0
    ips = steps * batch_size / dt
    _log(f"TF reference baseline: {ips:.2f} images/sec (batch {batch_size}, CPU)")
    with open(BASELINE_CACHE, "w") as f:
        json.dump(
            {
                "images_per_sec": ips,
                "batch_size": batch_size,
                "ms_per_step": dt / steps * 1e3,
                "hardware": "cpu",
                "what": "reference TF U-Net train_on_batch at 256x256, defaults",
            },
            f,
            indent=2,
        )
    return ips


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    try:
        ours = measure_ours(batch_size=batch, compute_dtype=dtype)
    except Exception as e:  # retry smaller on OOM
        _log(f"batch {batch} failed ({type(e).__name__}: {e}); retrying batch 8")
        ours = measure_ours(batch_size=8, compute_dtype=dtype)
    try:
        baseline = measure_tf_baseline()
        vs = ours["images_per_sec"] / baseline
    except Exception as e:
        _log(f"baseline measurement failed: {e}")
        vs = float("nan")
    print(
        json.dumps(
            {
                "metric": "unet256_train_images_per_sec_per_chip",
                "value": round(ours["images_per_sec"], 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(vs, 2) if vs == vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
