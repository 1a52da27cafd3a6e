"""MIDV dataset tooling tests (offline — no FTP; synthetic archives)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from unet_image_segmentation_tpu.data.midv import (
    MIDV2019_EXTRA_LINKS,
    MIDV500_LINKS,
    build_dataset,
    extract_dataset_dir,
    process_pair,
    quad_to_mask,
    train_validation_split,
)
from unet_image_segmentation_tpu.data.prepare import (
    augment_dataset,
    quad_from_mask,
    read_annotated_image,
)
from unet_image_segmentation_tpu.data.synthetic import render_sample


def test_link_registry():
    assert len(MIDV500_LINKS) == 50
    assert len(MIDV2019_EXTRA_LINKS) == 3
    assert MIDV500_LINKS[0].endswith("01_alb_id.zip")
    assert all(u.startswith("ftp://smartengines.com/midv-500/") for u in MIDV500_LINKS)


def test_quad_to_mask():
    quad = [[10, 10], [50, 12], [48, 40], [8, 38]]
    mask = quad_to_mask(quad, (64, 64))
    assert mask.dtype == np.uint8
    assert set(np.unique(mask)).issubset({0, 255})
    assert mask[25, 30] == 255 and mask[5, 5] == 0
    assert quad_to_mask([], (16, 16)).sum() == 0


def _write_archive_dir(root, sub="CA", n=3, hw=64):
    """Extracted-archive layout: <root>/{images,ground_truth}/<sub>/..."""
    rng = np.random.RandomState(7)
    img_dir = os.path.join(root, "images", sub)
    gt_dir = os.path.join(root, "ground_truth", sub)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    for i in range(n):
        img, _, quad = render_sample(rng, hw, hw)
        cv2.imwrite(os.path.join(img_dir, f"f{i}.tif"), img[..., ::-1])
        with open(os.path.join(gt_dir, f"f{i}.json"), "w") as f:
            json.dump({"quad": quad.astype(int).tolist()}, f)
    return root


def test_process_pair_downsamples(tmp_path):
    root = _write_archive_dir(str(tmp_path), n=1, hw=64)
    img_path = os.path.join(root, "images", "CA", "f0.tif")
    json_path = os.path.join(root, "ground_truth", "CA", "f0.json")
    out = process_pair(img_path, json_path)
    assert out is not None
    image, mask = out
    assert image.shape[:2] == (32, 32)  # 2x downsample
    assert mask.shape[:2] == (32, 32)
    assert set(np.unique(mask)).issubset({0, 255})
    assert mask.sum() > 0


def test_extract_and_split(tmp_path):
    archive = _write_archive_dir(str(tmp_path / "arch"), n=10)
    temp = str(tmp_path / "temp")
    os.makedirs(os.path.join(temp, "image"))
    os.makedirs(os.path.join(temp, "mask"))
    nxt = extract_dataset_dir(
        archive, os.path.join(temp, "image"), os.path.join(temp, "mask"), 1
    )
    assert nxt == 11
    assert sorted(os.listdir(os.path.join(temp, "image")))[0] == "image1.png"

    out = str(tmp_path / "train")
    train_validation_split(temp, out, seed=230)
    n_train = len(os.listdir(os.path.join(out, "train_frames", "image")))
    n_val = len(os.listdir(os.path.join(out, "val_frames", "image")))
    n_test = len(os.listdir(os.path.join(out, "test_frames", "image")))
    assert (n_train, n_val, n_test) == (7, 2, 1)  # 70/20/10 of 10
    # masks paired with frames by filename
    assert sorted(os.listdir(os.path.join(out, "train_frames", "image"))) == sorted(
        os.listdir(os.path.join(out, "train_masks", "image"))
    )
    # seeded split is deterministic
    out2 = str(tmp_path / "train2")
    train_validation_split(temp, out2, seed=230)
    assert sorted(os.listdir(os.path.join(out2, "train_frames", "image"))) == sorted(
        os.listdir(os.path.join(out, "train_frames", "image"))
    )


def test_build_dataset_from_dir(tmp_path):
    """Offline end-to-end: extracted dirs -> temp pairs -> split layout."""
    src = str(tmp_path / "downloads")
    _write_archive_dir(os.path.join(src, "01_alb_id"), n=6)
    build_dataset(dataset_root=str(tmp_path / "dataset"), from_dir=src)
    train_dir = os.path.join(str(tmp_path / "dataset"), "train")
    for sub in ("train_frames", "train_masks", "val_frames", "val_masks",
                "test_frames", "test_masks"):
        assert os.path.isdir(os.path.join(train_dir, sub, "image")), sub
    total = sum(
        len(os.listdir(os.path.join(train_dir, f"{s}_frames", "image")))
        for s in ("train", "val", "test")
    )
    assert total == 6


def test_augment_dataset_16x(tmp_path):
    root = _write_archive_dir(str(tmp_path), n=2)
    img_out = str(tmp_path / "aug_images")
    ann_out = str(tmp_path / "aug_annotations")
    n = augment_dataset(
        os.path.join(root, "images", "CA", "*.tif"),
        os.path.join(root, "ground_truth", "CA", "*.json"),
        img_out, ann_out,
    )
    assert n == 2 * 16
    per_input = os.listdir(os.path.join(img_out, "f0"))
    assert len(per_input) == 16
    assert all(f.endswith(".tif") for f in per_input)
    # re-derived quad annotations exist and contain 4 points
    ann = json.load(open(os.path.join(ann_out, "f0", "f0_0_1_0.json")))
    assert len(ann["quad"]) == 4


def test_quad_from_mask_rederivation():
    mask = np.zeros((64, 64), np.uint8)
    cv2.rectangle(mask, (10, 20), (50, 44), 255, -1)
    quad = quad_from_mask(mask)["quad"]
    assert len(quad) == 4
    xs = sorted(p[0] for p in quad)
    ys = sorted(p[1] for p in quad)
    assert abs(xs[0] - 10) <= 2 and abs(xs[-1] - 50) <= 2
    assert abs(ys[0] - 20) <= 2 and abs(ys[-1] - 44) <= 2


def test_read_annotated_image(tmp_path):
    root = _write_archive_dir(str(tmp_path), n=1)
    img, mask, quad = read_annotated_image(
        os.path.join(root, "images", "CA", "f0.tif"),
        os.path.join(root, "ground_truth", "CA", "f0.json"),
    )
    assert img is not None and mask is not None
    assert mask.shape == img.shape[:2]
    assert len(quad) == 4
