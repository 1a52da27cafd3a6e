"""Dataset-level evaluation (batched MeanIoU benchmark).

Behaviour parity with reference ``scripts/benchmark.py`` (SURVEY.md §3.3),
but **batched**: the reference predicts one image at a time (batch=1 per
``model.predict`` call, ``benchmark.py:254``), pure throughput waste on an
accelerator; here decode/rasterize run in host threads while the device
consumes fixed-shape batches.

Preserved semantics:

* pairs ``<dir>/images/**/<glob>`` with ``<dir>/ground_truth/<relpath>.json``
  (``benchmark.py:211-235``); glob defaults to ``*.tif`` (MIDV) but is
  configurable — the reference hard-codes tif (noted in SURVEY.md §7.4).
* ground truth: JSON ``"quad"`` polygon rasterized FILLED at the original
  image dims (probing companion .tif/.png/.jpg, else the 2048x2048
  fallback), nearest-resized to model size, binarized > 128
  (``benchmark.py:112-150``).
* per-sample smoothed IoU on binarized predictions (``benchmark.py:159-170``)
  with below-threshold logging + CSV, plus the dataset-level
  confusion-matrix MeanIoU accumulator (``benchmark.py:237,269``).
"""

from __future__ import annotations

import glob as globlib
import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from unet_image_segmentation_tpu.inference import Predictor
from unet_image_segmentation_tpu.ops.metrics import (
    mean_iou_from_cm,
    confusion_matrix,
    sample_iou,
)


def find_pairs(
    input_dir: str, image_glob: str = "*.tif"
) -> List[Dict[str, str]]:
    images_root = os.path.join(input_dir, "images")
    gt_root = os.path.join(input_dir, "ground_truth")
    files = sorted(
        globlib.glob(os.path.join(images_root, "**", image_glob), recursive=True)
    )
    pairs = []
    for img_path in files:
        rel = os.path.relpath(img_path, images_root)
        base = os.path.splitext(rel)[0]
        json_path = os.path.join(gt_root, base + ".json")
        if os.path.isfile(json_path):
            pairs.append({"image": img_path, "json": json_path, "id": base})
    return pairs


def rasterize_quad_mask(
    json_path: str,
    target_hw: Tuple[int, int],
    default_size: Tuple[int, int] = (2048, 2048),
) -> np.ndarray:
    """JSON 'quad' -> (H, W) uint8 {0,1} mask at model resolution."""
    import cv2

    with open(json_path) as f:
        quad = json.load(f).get("quad", [])

    # Probe the companion image for the original canvas dims.
    orig_h = orig_w = -1
    img_base = json_path.replace(
        os.sep + "ground_truth" + os.sep, os.sep + "images" + os.sep
    )[: -len(".json")]
    for ext in (".tif", ".png", ".jpg"):
        candidate = img_base + ext
        if os.path.exists(candidate):
            probe = cv2.imread(candidate, cv2.IMREAD_UNCHANGED)
            if probe is not None:
                orig_h, orig_w = probe.shape[:2]
                break
    if orig_h <= 0 or orig_w <= 0:
        orig_h, orig_w = default_size

    canvas = np.zeros((orig_h, orig_w), np.uint8)
    if quad:
        pts = np.asarray(quad, np.int32).reshape(-1, 1, 2)
        cv2.drawContours(canvas, [pts], -1, color=255, thickness=cv2.FILLED)
    th, tw = target_hw
    resized = cv2.resize(canvas, (tw, th), interpolation=cv2.INTER_NEAREST)
    return (resized > 128).astype(np.uint8)


def load_eval_image(img_path: str, target_hw: Tuple[int, int]) -> np.ndarray:
    """BGR -> /255 -> bilinear resize (reference benchmark.py:95-107)."""
    import cv2

    img = cv2.imread(img_path, cv2.IMREAD_COLOR)
    if img is None:
        raise IOError(f"cannot read {img_path}")
    img = img.astype(np.float32) / 255.0
    th, tw = target_hw
    if img.shape[:2] != (th, tw):
        img = cv2.resize(img, (tw, th), interpolation=cv2.INTER_LINEAR)
    return img


@dataclass
class EvalResult:
    mean_iou: float
    per_sample: List[Tuple[str, float]] = field(default_factory=list)
    low_iou: List[Tuple[str, float]] = field(default_factory=list)
    n_evaluated: int = 0
    elapsed_sec: float = 0.0
    images_per_sec: float = 0.0


def evaluate(
    predictor: Predictor,
    input_dir: str,
    iou_threshold: float = 0.9,
    pred_threshold: float = 0.5,
    batch_size: int = 8,
    image_glob: str = "*.tif",
    num_workers: int = 8,
    low_score_log: Optional[str] = None,
    verbose: bool = True,
) -> EvalResult:
    pairs = find_pairs(input_dir, image_glob)
    if not pairs:
        raise FileNotFoundError(
            f"no image/JSON pairs under {input_dir} (glob {image_glob!r})"
        )
    target_hw = predictor.image_size
    t0 = time.perf_counter()

    def load_pair(pair):
        img = load_eval_image(pair["image"], target_hw)
        mask = rasterize_quad_mask(pair["json"], target_hw)
        return img, mask

    cm_total = np.zeros((2, 2), np.float64)
    per_sample: List[Tuple[str, float]] = []

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        for start in range(0, len(pairs), batch_size):
            chunk = pairs[start : start + batch_size]
            loaded = list(pool.map(load_pair, chunk))
            imgs = np.stack([im for im, _ in loaded])
            masks = np.stack([mk for _, mk in loaded])[..., None]
            pad = batch_size - len(chunk)
            if pad:  # static shapes for the jitted forward
                imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)])
            probs = predictor.predict(imgs)[: len(chunk)]
            preds = (probs > pred_threshold).astype(np.uint8)
            ious = np.asarray(sample_iou(jnp.asarray(masks), jnp.asarray(preds)))
            cm = confusion_matrix(jnp.asarray(masks), jnp.asarray(preds), 2)
            cm_total += np.asarray(cm)
            for pair, iou in zip(chunk, ious):
                per_sample.append((pair["id"], float(iou)))
            if verbose:
                done = min(start + batch_size, len(pairs))
                print(f"\rEvaluating [{done}/{len(pairs)}]", end="")
    if verbose:
        print()

    elapsed = time.perf_counter() - t0
    low = sorted(
        [(i, s) for i, s in per_sample if s < iou_threshold], key=lambda t: t[1]
    )
    overall = float(mean_iou_from_cm(jnp.asarray(cm_total)))
    result = EvalResult(
        mean_iou=overall,
        per_sample=per_sample,
        low_iou=low,
        n_evaluated=len(per_sample),
        elapsed_sec=elapsed,
        images_per_sec=len(per_sample) / elapsed if elapsed > 0 else 0.0,
    )
    if low_score_log:
        log_dir = os.path.dirname(low_score_log)
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
        with open(low_score_log, "w") as f:
            f.write("FileID,MeanIoU_Score\n")
            for file_id, score in low:
                f.write(f"{file_id},{score:.4f}\n")
    return result
