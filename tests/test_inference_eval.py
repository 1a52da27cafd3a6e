"""End-to-end inference + evaluation pipeline tests (SURVEY §3.2/§3.3)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from unet_image_segmentation_tpu.config import Config
from unet_image_segmentation_tpu.data.synthetic import (
    render_sample,
    write_synthetic_dataset,
)
from unet_image_segmentation_tpu.evaluation import (
    evaluate,
    find_pairs,
    rasterize_quad_mask,
)
from unet_image_segmentation_tpu.inference import (
    Predictor,
    postprocess_mask,
    preprocess_image,
    run_inference,
)
from unet_image_segmentation_tpu.train.loop import fit

HW = 32


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train a tiny model once; reused across inference/eval tests."""
    d = str(tmp_path_factory.mktemp("inf"))
    write_synthetic_dataset(
        os.path.join(d, "ds"), n_train=16, n_val=4, image_size=(HW, HW)
    )
    cfg = Config().override(
        model__image_height=HW,
        model__image_width=HW,
        model__filters=(8, 16),
        model__dropout_rate=0.0,
        data__root=os.path.join(d, "ds"),
        data__num_workers=2,
        train__epochs=4,
        train__batch_size=8,
        train__model_out=os.path.join(d, "model"),
        train__log_dir=os.path.join(d, "logs"),
    )
    fit(cfg, verbose=False)
    return d, cfg


def test_preprocess_normalize_then_resize():
    img = (np.arange(24 * 20 * 3).reshape(24, 20, 3) % 255).astype(np.uint8)
    out = preprocess_image(img, (16, 16))
    assert out.shape == (1, 16, 16, 3)
    # reference order: normalize BEFORE resize (inference.py:107-109)
    expected = cv2.resize(
        img.astype(np.float32) / 255.0, (16, 16), interpolation=cv2.INTER_LINEAR
    )
    np.testing.assert_allclose(out[0], expected, atol=1e-6)


def test_postprocess_resize_then_threshold():
    prob = np.zeros((8, 8, 1), np.float32)
    prob[2:6, 2:6] = 0.9
    mask = postprocess_mask(prob, (16, 16), threshold=0.5)
    assert mask.shape == (16, 16)
    assert set(np.unique(mask)).issubset({0, 255})
    # thresholding happened after upsampling: boundary interpolation visible
    prob_up = cv2.resize(prob[..., 0], (16, 16), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(mask, (prob_up > 0.5).astype(np.uint8) * 255)


def test_run_inference_end_to_end(trained, tmp_path):
    d, cfg = trained
    rng = np.random.RandomState(5)
    # non-model-sized input exercises both resize paths
    img, mask, _ = render_sample(rng, 48, 40)
    in_path = str(tmp_path / "doc.png")
    cv2.imwrite(in_path, img[..., ::-1])

    predictor = Predictor(cfg.train.model_out, image_size=(HW, HW))
    out_mask = str(tmp_path / "out" / "mask.png")
    out_crop = str(tmp_path / "out" / "crop.png")
    result = run_inference(
        predictor, in_path, out_mask, out_crop, verbose=False,
        min_contour_area=20.0,
    )
    saved_mask = cv2.imread(out_mask, cv2.IMREAD_GRAYSCALE)
    assert saved_mask is not None
    assert saved_mask.shape == (48, 40)  # original resolution restored
    assert set(np.unique(saved_mask)).issubset({0, 255})
    if result["bbox"] is not None:
        x, y, w, h = result["bbox"]
        crop = cv2.imread(out_crop)
        assert crop.shape[:2] == (h, w)


def test_warp_crop_mode(trained, tmp_path):
    d, cfg = trained
    rng = np.random.RandomState(6)
    img, mask, _ = render_sample(rng, 64, 64)
    in_path = str(tmp_path / "doc2.png")
    cv2.imwrite(in_path, img[..., ::-1])
    predictor = Predictor(cfg.train.model_out, image_size=(HW, HW))
    result = run_inference(
        predictor, in_path,
        str(tmp_path / "m.png"), str(tmp_path / "c.png"),
        crop_mode="warp", min_contour_area=20.0, verbose=False,
    )
    assert os.path.exists(result["mask_path"])


@pytest.fixture(scope="module")
def eval_tree(tmp_path_factory):
    """images/**/*.tif + ground_truth/**/*.json benchmark layout."""
    root = str(tmp_path_factory.mktemp("evalds"))
    rng = np.random.RandomState(9)
    for sub in ("alpha", "beta"):
        os.makedirs(os.path.join(root, "images", sub), exist_ok=True)
        os.makedirs(os.path.join(root, "ground_truth", sub), exist_ok=True)
        for i in range(3):
            img, mask, quad = render_sample(rng, 64, 64)
            cv2.imwrite(
                os.path.join(root, "images", sub, f"s{i}.tif"), img[..., ::-1]
            )
            with open(
                os.path.join(root, "ground_truth", sub, f"s{i}.json"), "w"
            ) as f:
                json.dump({"quad": quad.astype(int).tolist()}, f)
    return root


def test_find_pairs_and_rasterize(eval_tree):
    pairs = find_pairs(eval_tree, "*.tif")
    assert len(pairs) == 6
    mask = rasterize_quad_mask(pairs[0]["json"], (HW, HW))
    assert mask.shape == (HW, HW)
    assert set(np.unique(mask)).issubset({0, 1})
    assert mask.sum() > 0


def test_rasterize_fallback_canvas(tmp_path):
    # no companion image -> 2048x2048 default canvas (benchmark.py:131-133)
    p = tmp_path / "ground_truth" / "x.json"
    os.makedirs(p.parent, exist_ok=True)
    with open(p, "w") as f:
        json.dump({"quad": [[0, 0], [1024, 0], [1024, 1024], [0, 1024]]}, f)
    mask = rasterize_quad_mask(str(p), (32, 32))
    # quad covers top-left quarter of the 2048 canvas
    assert mask[:15, :15].mean() > 0.9
    assert mask[20:, 20:].mean() < 0.1


def test_evaluate_batched(trained, eval_tree, tmp_path):
    d, cfg = trained
    predictor = Predictor(cfg.train.model_out, image_size=(HW, HW))
    csv_path = str(tmp_path / "low.csv")
    result = evaluate(
        predictor, eval_tree,
        iou_threshold=1.0,  # force everything into the low list
        batch_size=4,       # exercises padding (6 images, batches of 4)
        low_score_log=csv_path,
        verbose=False,
    )
    assert result.n_evaluated == 6
    assert 0.0 <= result.mean_iou <= 1.0
    assert len(result.per_sample) == 6
    assert len(result.low_iou) == 6  # all below 1.0
    assert sorted(s for _, s in result.low_iou) == [s for _, s in result.low_iou]
    with open(csv_path) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "FileID,MeanIoU_Score"
    assert len(lines) == 7


def test_cli_smoke(trained, tmp_path):
    """Exercise the argparse surfaces end to end."""
    d, cfg = trained
    from unet_image_segmentation_tpu.cli.inference import main as infer_main

    rng = np.random.RandomState(3)
    img, _, _ = render_sample(rng, 40, 40)
    in_path = str(tmp_path / "cli_doc.png")
    cv2.imwrite(in_path, img[..., ::-1])
    rc = infer_main([
        in_path,
        "--model", cfg.train.model_out,
        "--output_mask", str(tmp_path / "cli_mask.png"),
        "--output_cropped", str(tmp_path / "cli_crop.png"),
        "--image-size", str(HW),
    ])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "cli_mask.png"))


def test_predictor_bucketed_batch(trained):
    # Ragged batches pad to the next power-of-two compile bucket; results
    # must equal the unpadded forward on the same rows.
    d, cfg = trained
    predictor = Predictor(cfg.train.model_out, image_size=(HW, HW))
    rng = np.random.RandomState(3)
    imgs = rng.rand(3, HW, HW, 3).astype(np.float32)
    out3 = predictor.predict(imgs)
    assert out3.shape[0] == 3
    out4 = predictor.predict(np.concatenate([imgs, imgs[:1]], axis=0))
    np.testing.assert_allclose(out3, out4[:3], rtol=0, atol=1e-6)


def test_predictor_pallas_fallback_warns(trained, monkeypatch):
    # A failing fused serving graph must degrade LOUDLY, not silently.
    d, cfg = trained
    import unet_image_segmentation_tpu.serving as serving

    def boom(*a, **k):
        raise ValueError("forced for test")

    monkeypatch.setattr(serving, "build_serving_forward_chained", boom)
    with pytest.warns(RuntimeWarning, match="falling back"):
        predictor = Predictor(
            cfg.train.model_out, image_size=(HW, HW), use_pallas=True
        )
    # fallback path still functional
    out = predictor.predict(np.zeros((1, HW, HW, 3), np.float32))
    assert out.shape == (1, HW, HW, 1)
