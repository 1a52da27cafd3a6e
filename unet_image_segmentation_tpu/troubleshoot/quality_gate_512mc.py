"""512px 3-class trained-quality gate vs the TF reference (VERDICT r4 item 5).

BASELINE configs[3] is the multi-class story (softmax head, per-class
MeanIoU — reference ``model/u_net.py:105-112``), but until round 5 the
quality head-to-head existed only for binary 256px.  This leg runs the
same PAIRED protocol as ``quality_gate_256`` at 512x512 with 3 classes
on hard scenes and reports per-class IoU for both stacks.

Cost note: the TF half runs ~4x slower per step than 256px on this CPU.
12 epochs measured as undertrained (both-stack background collapse at
512px — a gate that cannot discriminate), so the leg runs the full
768-step schedule (24 epochs, the 256-leg protocol) and bounds the TF
cost with ``--seeds`` (the committed artifact pairs 1 seed for TF and
records that).  Losses: ours ``cce``; TF ``SparseCategoricalCrossentropy``
on the softmax head — the same clipped-CE semantics pinned in
``tests/test_multiclass.py``.

Stages::

    python -m unet_image_segmentation_tpu.troubleshoot.quality_gate_512mc \
        --workdir /tmp/q512 --stage data
    ... --stage tf    # TF-CPU (slow; background it)
    ... --stage jax   # our stack on the chip
    ... --stage report
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

HW = 512
BATCH = 2
N_CLASSES = 3
N_TRAIN, N_VAL = 64, 64
STEPS_PER_EPOCH = N_TRAIN // BATCH
EPOCHS = 24  # 768 BN updates (0.99^768 ~ 4e-4 residual)
SEEDS = (2301, 7)

# Measured on this 1-CPU host: the TF half costs ~12 s/step at 512px
# (387 s/epoch -> ~2.6 h for the 768-step schedule) — infeasible inside
# one round.  ``--hw 256`` runs the same paired 3-class protocol at
# 256px (~3 s/step TF), which isolates the multiclass/softmax-head
# quality question from the resolution one; the binary 256/512 gates
# and the 512px-jax-half artifact cover the rest.


def _per_class_iou(y_true_ids: np.ndarray, y_pred_ids: np.ndarray, n: int):
    ious = []
    for c in range(n):
        t = y_true_ids == c
        p = y_pred_ids == c
        inter = float(np.logical_and(t, p).sum())
        union = float(np.logical_or(t, p).sum())
        ious.append((inter + 1e-7) / (union + 1e-7))
    return ious


def _load_arrays(root: str):
    from unet_image_segmentation_tpu.data.loader import DirectoryDataset

    def load(split):
        ds = DirectoryDataset(
            frames_dir=os.path.join(root, f"{split}_frames", "image"),
            masks_dir=os.path.join(root, f"{split}_masks", "image"),
            image_size=(HW, HW),
            shuffle=False,
            mask_mode="class_id",
        )
        imgs, masks = [], []
        for i in range(len(ds)):
            im, mk = ds.load_sample(i)
            imgs.append(im)
            masks.append(mk)
        return np.stack(imgs), np.stack(masks)

    return load("train"), load("val")


def stage_data(workdir: str) -> None:
    from unet_image_segmentation_tpu.data.synthetic import (
        write_synthetic_multiclass_dataset,
    )

    root = os.path.join(workdir, "ds")
    write_synthetic_multiclass_dataset(
        root, n_train=N_TRAIN, n_val=N_VAL, image_size=(HW, HW),
        num_classes=N_CLASSES, style="hard",
    )
    print(f"synthetic 512px 3-class hard dataset at {root}")


def stage_tf(workdir: str) -> None:
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    import tensorflow as tf

    ref = "/root/reference"
    if ref not in sys.path:
        sys.path.insert(0, ref)
    from model.u_net import U_NET  # reference model/u_net.py:28

    (xtr, ytr), (xva, yva) = _load_arrays(os.path.join(workdir, "ds"))
    results = {}
    for seed in SEEDS:
        tf.keras.utils.set_random_seed(seed)
        m = U_NET(
            input_size=(HW, HW, 3), num_classes=N_CLASSES,
            dropout_rate=0.0, use_batch_norm=True,
        )
        m.compile(
            optimizer=tf.keras.optimizers.AdamW(
                learning_rate=2e-3, weight_decay=1e-4
            ),
            loss=tf.keras.losses.SparseCategoricalCrossentropy(),
        )
        m.fit(xtr, ytr, batch_size=BATCH, epochs=EPOCHS, verbose=2)
        pred = np.argmax(m.predict(xva, batch_size=4, verbose=0), axis=-1)
        ious = _per_class_iou(yva[..., 0].astype(np.int32), pred, N_CLASSES)
        results[str(seed)] = ious
        print(f"TF seed {seed}: per-class IoU {ious}", flush=True)
        with open(os.path.join(workdir, "tf_results.json"), "w") as f:
            json.dump(results, f, indent=2)


def stage_jax(workdir: str) -> None:
    from unet_image_segmentation_tpu.config import Config
    from unet_image_segmentation_tpu.models.unet import build_unet
    from unet_image_segmentation_tpu.train.loop import fit
    from unet_image_segmentation_tpu.train.steps import make_predict_fn

    (xtr, ytr), (xva, yva) = _load_arrays(os.path.join(workdir, "ds"))
    results = {}
    for seed in SEEDS:
        cfg = Config().override(
            model__image_height=HW, model__image_width=HW,
            model__num_classes=N_CLASSES,
            model__use_batch_norm=True, model__dropout_rate=0.0,
            model__use_pallas=True,  # the product training path
            data__root=os.path.join(workdir, "ds"),
            data__mask_mode="class_id",
            data__num_workers=4, data__horizontal_flip=False,
            train__loss="cce",
            train__epochs=EPOCHS, train__batch_size=BATCH, train__seed=seed,
            train__model_out=os.path.join(workdir, f"model{seed}"),
            train__log_dir=os.path.join(workdir, f"logs{seed}"),
            train__early_stop_patience=1000,
            train__reduce_lr_patience=1000,
        )
        result = fit(cfg, verbose=False)
        model = build_unet(cfg.model)
        predict = make_predict_fn(
            model, result.state.params, result.state.batch_stats
        )
        preds = []
        for i in range(0, len(xva), 4):
            preds.append(np.argmax(np.asarray(predict(xva[i : i + 4])), -1))
        pred = np.concatenate(preds)
        ious = _per_class_iou(yva[..., 0].astype(np.int32), pred, N_CLASSES)
        results[str(seed)] = ious
        print(f"JAX seed {seed}: per-class IoU {ious}", flush=True)
        with open(os.path.join(workdir, "jax_results.json"), "w") as f:
            json.dump(results, f, indent=2)


def stage_report(workdir: str, out: str) -> None:
    with open(os.path.join(workdir, "tf_results.json")) as f:
        tf_res = json.load(f)
    with open(os.path.join(workdir, "jax_results.json")) as f:
        jax_res = json.load(f)
    seeds = sorted(set(tf_res) & set(jax_res), key=int)
    tf_per_seed = {s: tf_res[s] for s in seeds}
    jax_per_seed = {s: jax_res[s] for s in seeds}
    mean_tf = [float(np.mean([tf_per_seed[s][c] for s in seeds]))
               for c in range(N_CLASSES)]
    mean_jax = [float(np.mean([jax_per_seed[s][c] for s in seeds]))
                for c in range(N_CLASSES)]
    miou_tf = float(np.mean(mean_tf))
    miou_jax = float(np.mean(mean_jax))
    deltas = [
        float(np.mean(jax_per_seed[s]) - np.mean(tf_per_seed[s]))
        for s in seeds
    ]
    artifact = {
        "setup": {
            "image_size": HW, "num_classes": N_CLASSES, "epochs": EPOCHS,
            "batch": BATCH, "n_train": N_TRAIN, "n_val": N_VAL,
            "bn": True, "dropout": 0.0,
            "bn_updates": EPOCHS * STEPS_PER_EPOCH,
            "seeds": [int(s) for s in seeds],
            "scene_style": "hard",
            "loss": "cce (ours) / SparseCategoricalCrossentropy (TF)",
            "jax_path": "use_pallas=True (fused training chains)",
            "gate": "reference scripts/benchmark.py:277-279, 0.5% MeanIoU",
        },
        "per_class_iou_tf": [round(v, 4) for v in mean_tf],
        "per_class_iou_jax": [round(v, 4) for v in mean_jax],
        "per_seed_tf": tf_per_seed,
        "per_seed_jax": jax_per_seed,
        "mean_iou_tf": round(miou_tf, 4),
        "mean_iou_jax": round(miou_jax, 4),
        "delta": round(miou_jax - miou_tf, 4),
        "delta_per_seed": [round(d, 4) for d in deltas],
        "within_gate": bool(miou_jax >= miou_tf - 0.005),
    }
    with open(out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact, indent=2))


def main(argv=None) -> int:
    global SEEDS, HW, EPOCHS
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--workdir", required=True)
    p.add_argument(
        "--stage", required=True,
        choices=["data", "tf", "jax", "report", "all"],
    )
    p.add_argument(
        "--seeds", type=int, default=len(SEEDS),
        help="run only the first N seeds of the paired list (TF-CPU "
        "cost control; report pairs the intersection)",
    )
    p.add_argument(
        "--hw", type=int, default=HW,
        help="image side; 256 runs the same paired 3-class protocol "
        "at the TF-feasible resolution (see module docstring)",
    )
    p.add_argument(
        "--epochs", type=int, default=EPOCHS,
        help="override the 24-epoch (768-step) schedule",
    )
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    HW, EPOCHS = args.hw, args.epochs
    if args.out is None:
        args.out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            f"QUALITY_{HW}_MC.json",
        )
    SEEDS = SEEDS[: args.seeds]
    os.makedirs(args.workdir, exist_ok=True)
    stages = (
        ["data", "tf", "jax", "report"] if args.stage == "all" else [args.stage]
    )
    for stage in stages:
        if stage == "data":
            stage_data(args.workdir)
        elif stage == "tf":
            stage_tf(args.workdir)
        elif stage == "jax":
            stage_jax(args.workdir)
        else:
            stage_report(args.workdir, args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
