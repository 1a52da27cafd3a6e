"""Contour/warp post-processing tests (reference utils/image.py parity)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from unet_image_segmentation_tpu.utils.image import (
    binarize_mask,
    extract_object_from_mask,
    four_point_transform,
    largest_contour_bbox,
    order_points,
)


def test_order_points():
    pts = np.array([[90, 10], [10, 10], [10, 80], [90, 80]], np.float32)
    ordered = order_points(pts)
    np.testing.assert_array_equal(
        ordered, [[10, 10], [90, 10], [90, 80], [10, 80]]
    )


def test_order_points_rejects_bad_shape():
    with pytest.raises(ValueError):
        order_points(np.zeros((3, 2)))


def test_four_point_transform_axis_aligned():
    img = np.zeros((100, 120, 3), np.uint8)
    img[20:60, 30:90] = (0, 255, 0)
    quad = np.array([[30, 20], [89, 20], [89, 59], [30, 59]], np.float32)
    warped = four_point_transform(img, quad)
    assert warped is not None
    # output sized by max edge lengths
    assert warped.shape[0] in (39, 40) and warped.shape[1] in (59, 60)
    # interior is the green region
    assert (warped[5:-5, 5:-5, 1] == 255).all()


def test_binarize_mask_variants():
    f = np.array([[0.2, 0.7]], np.float32)
    np.testing.assert_array_equal(binarize_mask(f, 0.5), [[0, 255]])
    b = np.array([[True, False]])
    np.testing.assert_array_equal(binarize_mask(b), [[255, 0]])
    u = np.array([[0, 255]], np.uint8)
    np.testing.assert_array_equal(binarize_mask(u), [[0, 255]])


def test_extract_object_from_mask_quad():
    h, w = 120, 160
    image = np.full((h, w, 3), 30, np.uint8)
    quad = np.array([[30, 20], [130, 28], [125, 100], [25, 90]], np.int32)
    cv2.fillPoly(image, [quad], (10, 200, 50))
    mask = np.zeros((h, w), np.float32)
    cv2.fillPoly(mask, [quad], 1.0)
    warped = extract_object_from_mask(mask, image)
    assert warped is not None
    # warped output is RGB: fill color (B=10, G=200, R=50) -> RGB (50, 200, 10)
    center = warped[warped.shape[0] // 2, warped.shape[1] // 2]
    np.testing.assert_array_equal(center, [50, 200, 10])


def test_extract_object_returns_none_for_empty():
    mask = np.zeros((64, 64), np.float32)
    image = np.zeros((64, 64, 3), np.uint8)
    assert extract_object_from_mask(mask, image) is None


def test_extract_object_size_mismatch_raises():
    with pytest.raises(ValueError):
        extract_object_from_mask(
            np.zeros((32, 32), np.float32), np.zeros((64, 64, 3), np.uint8)
        )


def test_largest_contour_bbox():
    mask = np.zeros((64, 64), np.uint8)
    mask[10:30, 20:50] = 255  # area 600
    mask[40:43, 5:8] = 255  # small blob, area 9
    bbox = largest_contour_bbox(mask, min_contour_area=100)
    assert bbox == (20, 10, 30, 20)
    assert largest_contour_bbox(np.zeros((8, 8), np.uint8)) is None
    assert largest_contour_bbox(mask, min_contour_area=10_000) is None
