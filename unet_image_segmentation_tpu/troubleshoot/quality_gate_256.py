"""256px trained-quality gate vs the TF reference stack (VERDICT r2 item 4).

BASELINE.json's north star is "MeanIoU within 0.5% of the TF reference" at
the configuration users actually train — 256x256 (reference
``scripts/train.py:84-88``).  The round-2 artifact (QUALITY_BN.json) pinned
the head-to-head at 32x32 only; this tool runs the SAME protocol at 256px
on identical synthetic document data and records ``QUALITY_256.json``.

Protocol (mirrors tests/test_quality_parity.py's BN-on head-to-head):

* identical synthetic 256px scenes for both stacks (``data/synthetic.py``),
* reference hyperparameters: AdamW(2e-3, wd 1e-4), dice loss, batch 2
  (the reference default batch, ``train.py:72``), BN on, dropout 0
  (removes the one per-framework RNG difference),
* >= 768 BN running-stat updates per run (momentum 0.99 -> residual
  0.99^768 ~ 4e-4; the round-2 lesson: fewer updates measures warmup),
* eval-mode thresholded IoU on held-out val images, averaged over seeds,
* our side trains the PRODUCT path: ``use_pallas=True`` on TPU (falls back
  to interpret mode on CPU — very slow; run the jax stage on the chip).

``--style hard`` (the round-4 default artifact) renders cluttered,
occluded, perspective-distorted scenes (``data/synthetic.py:
render_sample_hard``) tuned so the TF reference lands well below IoU 1.0
— the round-3 verdict: a gate both stacks saturate cannot detect a 0.4%
regression, so the easy-scene artifact had no discriminating power.

Stages are separable so the ~45min/seed TF-CPU half can run in the
background while the TPU is used for other work:

  python -m unet_image_segmentation_tpu.troubleshoot.quality_gate_256 \
      --workdir /tmp/q256 --stage data
  python -m ... --stage tf      # TF-CPU training, writes tf_results.json
  python -m ... --stage jax     # our stack on the attached device
  python -m ... --stage report  # combines -> QUALITY_256.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

HW = 256
BATCH = 2  # the reference default (scripts/train.py:72)
# Round-5 power-up (VERDICT r4 item 5): the hard-scene TF spread across
# seeds measured 4.6 IoU points — nine gate widths — so 2 seeds / 16 val
# scenes could not resolve the 0.5% threshold it claims.  4 PAIRED seeds
# (same scenes, same seed list on both stacks, per-seed deltas reported)
# and a 128-scene val set bring the paired-delta standard error near the
# gate width; the report records the spread so the artifact shows its
# own resolution.
N_TRAIN, N_VAL = 64, 128
STEPS_PER_EPOCH = N_TRAIN // BATCH  # 32
EPOCHS = 24  # 24 * 32 = 768 BN updates
SEEDS = (2301, 7, 23, 42)


def _thresholded_iou(y_true: np.ndarray, y_prob: np.ndarray, thr: float = 0.5) -> float:
    p = (y_prob > thr).astype(np.float32)
    t = (y_true > 0.5).astype(np.float32)
    inter = (p * t).sum()
    union = p.sum() + t.sum() - inter
    return float((inter + 1e-7) / (union + 1e-7))


def _load_arrays(root: str):
    from unet_image_segmentation_tpu.data.loader import DirectoryDataset

    def load(split):
        ds = DirectoryDataset(
            frames_dir=os.path.join(root, f"{split}_frames", "image"),
            masks_dir=os.path.join(root, f"{split}_masks", "image"),
            image_size=(HW, HW),
            shuffle=False,
        )
        imgs, masks = [], []
        for i in range(len(ds)):
            im, mk = ds.load_sample(i)
            imgs.append(im)
            masks.append(mk)
        return np.stack(imgs), np.stack(masks)

    return load("train"), load("val")


def stage_data(workdir: str, style: str = "easy") -> None:
    from unet_image_segmentation_tpu.data.synthetic import write_synthetic_dataset

    root = os.path.join(workdir, "ds")
    write_synthetic_dataset(
        root, n_train=N_TRAIN, n_val=N_VAL, image_size=(HW, HW), style=style
    )
    print(
        f"synthetic 256px {style} dataset at {root} "
        f"({N_TRAIN} train / {N_VAL} val)"
    )


def stage_tf(workdir: str) -> None:
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    import tensorflow as tf

    ref = "/root/reference"
    if ref not in sys.path:
        sys.path.insert(0, ref)
    from model.u_net import U_NET  # reference model/u_net.py:28
    from utils.loss import dice_loss as tf_dice_loss

    (xtr, ytr), (xva, yva) = _load_arrays(os.path.join(workdir, "ds"))
    results = {}
    for seed in SEEDS:
        tf.keras.utils.set_random_seed(seed)
        m = U_NET(
            input_size=(HW, HW, 3), num_classes=1,
            dropout_rate=0.0, use_batch_norm=True,
        )
        m.compile(
            optimizer=tf.keras.optimizers.AdamW(
                learning_rate=2e-3, weight_decay=1e-4
            ),
            loss=tf_dice_loss,
        )
        m.fit(xtr, ytr, batch_size=BATCH, epochs=EPOCHS, verbose=2)
        iou = _thresholded_iou(yva, m.predict(xva, verbose=0))
        results[str(seed)] = iou
        print(f"TF seed {seed}: val IoU {iou:.4f}", flush=True)
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
            model__use_batch_norm=True, model__dropout_rate=0.0,
            model__use_pallas=True,  # the product training path
            data__root=os.path.join(workdir, "ds"),
            data__num_workers=4, data__horizontal_flip=False,
            train__epochs=EPOCHS, train__batch_size=BATCH, train__seed=seed,
            train__model_out=os.path.join(workdir, f"model{seed}"),
            train__log_dir=os.path.join(workdir, f"logs{seed}"),
            train__early_stop_patience=1000,
            train__reduce_lr_patience=1000,  # bare-Keras run: no LR schedule
        )
        result = fit(cfg, verbose=False)
        model = build_unet(cfg.model)
        predict = make_predict_fn(
            model, result.state.params, result.state.batch_stats
        )
        preds = []
        for i in range(0, len(xva), 8):
            preds.append(np.asarray(predict(xva[i : i + 8])))
        iou = _thresholded_iou(yva, np.concatenate(preds))
        results[str(seed)] = iou
        print(f"JAX seed {seed}: val IoU {iou:.4f}", flush=True)
        with open(os.path.join(workdir, "jax_results.json"), "w") as f:
            json.dump(results, f, indent=2)


def stage_report(workdir: str, out: str, style: str = "easy") -> None:
    with open(os.path.join(workdir, "tf_results.json")) as f:
        tf_res = json.load(f)
    with open(os.path.join(workdir, "jax_results.json")) as f:
        jax_res = json.load(f)
    seeds = sorted(set(tf_res) & set(jax_res), key=int)
    ious_tf = [tf_res[s] for s in seeds]
    ious_jax = [jax_res[s] for s in seeds]
    mean_tf, mean_jax = float(np.mean(ious_tf)), float(np.mean(ious_jax))
    # PAIRED design: both stacks train on identical scenes with the same
    # seed list, so the per-seed delta cancels the (large) scene/seed
    # variance; the gate question is about the mean paired delta and its
    # standard error, not the raw per-stack spread.
    deltas = [j - t for j, t in zip(ious_jax, ious_tf)]
    delta_std = float(np.std(deltas, ddof=1)) if len(deltas) > 1 else None
    delta_sem = (
        delta_std / float(np.sqrt(len(deltas))) if delta_std is not None else None
    )
    artifact = {
        "setup": {
            "image_size": HW, "epochs": EPOCHS, "batch": BATCH,
            "n_train": N_TRAIN, "n_val": N_VAL, "bn": True, "dropout": 0.0,
            "bn_updates": EPOCHS * STEPS_PER_EPOCH,
            "seeds": [int(s) for s in seeds],
            "scene_style": style,
            "jax_path": "use_pallas=True (fused training chains)",
            "gate": "reference scripts/benchmark.py:277-279, 0.5% MeanIoU",
        },
        "val_iou_tf_per_seed": [round(v, 4) for v in ious_tf],
        "val_iou_jax_per_seed": [round(v, 4) for v in ious_jax],
        "val_iou_tf_mean": round(mean_tf, 4),
        "val_iou_jax_mean": round(mean_jax, 4),
        "delta": round(mean_jax - mean_tf, 4),
        "delta_per_seed": [round(d, 4) for d in deltas],
        "delta_std": round(delta_std, 4) if delta_std is not None else None,
        "delta_sem": round(delta_sem, 4) if delta_sem is not None else None,
        "tf_seed_spread": round(max(ious_tf) - min(ious_tf), 4),
        "jax_seed_spread": round(max(ious_jax) - min(ious_jax), 4),
        "within_gate": bool(mean_jax >= mean_tf - 0.005),
    }
    with open(out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact, indent=2))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--workdir", required=True)
    p.add_argument(
        "--stage", required=True, choices=["data", "tf", "jax", "report", "all"]
    )
    p.add_argument(
        "--style", default="easy", choices=["easy", "hard"],
        help="scene difficulty; 'hard' de-saturates the gate (clutter, "
        "occlusion, perspective — both stacks land well below IoU 1.0 so "
        "the 0.5%% gate can discriminate)",
    )
    p.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            "QUALITY_256.json",
        ),
    )
    args = p.parse_args(argv)
    os.makedirs(args.workdir, exist_ok=True)
    stages = (
        ["data", "tf", "jax", "report"] if args.stage == "all" else [args.stage]
    )
    for stage in stages:
        if stage == "data":
            stage_data(args.workdir, style=args.style)
        elif stage == "tf":
            stage_tf(args.workdir)
        elif stage == "jax":
            stage_jax(args.workdir)
        else:
            stage_report(args.workdir, args.out, style=args.style)
    return 0


if __name__ == "__main__":
    sys.exit(main())
