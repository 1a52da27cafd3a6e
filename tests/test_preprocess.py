"""Device-side preprocessing vs OpenCV oracles (mask-parity requirement)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from unet_image_segmentation_tpu.ops.preprocess import (  # noqa: E402
    postprocess_probs,
    preprocess_frames,
    resize_bilinear,
    resize_nearest,
)


@pytest.mark.parametrize("src,dst", [((64, 48), (32, 32)), ((32, 32), (50, 70)),
                                     ((40, 40), (40, 40))])
def test_resize_bilinear_matches_cv2(rng_np, src, dst):
    img = rng_np.rand(*src, 3).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(img), dst))
    expected = cv2.resize(img, (dst[1], dst[0]), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, expected, atol=2e-3)


def test_resize_bilinear_batched(rng_np):
    imgs = rng_np.rand(4, 24, 24, 3).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(imgs), (16, 16)))
    for i in range(4):
        expected = cv2.resize(imgs[i], (16, 16), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(got[i], expected, atol=2e-3)


def test_resize_nearest_matches_cv2(rng_np):
    mask = (rng_np.rand(64, 64, 1) > 0.5).astype(np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(mask), (32, 32)))
    expected = cv2.resize(mask[..., 0], (32, 32), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(got[..., 0], expected)


def test_preprocess_frames_fused(rng_np):
    frames = (rng_np.rand(2, 40, 56, 3) * 255).astype(np.uint8)
    out = np.asarray(preprocess_frames(jnp.asarray(frames), (32, 32)))
    assert out.shape == (2, 32, 32, 3)
    expected = np.stack([
        cv2.resize(f.astype(np.float32) / 255.0, (32, 32),
                   interpolation=cv2.INTER_LINEAR)
        for f in frames
    ])
    np.testing.assert_allclose(out, expected, atol=2e-3)


def test_preprocess_pad_to():
    frames = np.zeros((1, 20, 20, 3), np.uint8) + 255
    out = np.asarray(
        preprocess_frames(jnp.asarray(frames), (24, 24), pad_to=(32, 32))
    )
    assert out.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(out[0, :24, :24], 1.0)
    assert (out[0, 24:, :] == 0).all() and (out[0, :, 24:] == 0).all()


def test_postprocess_probs_roundtrip(rng_np):
    probs = rng_np.rand(1, 16, 16, 1).astype(np.float32)
    up = np.asarray(postprocess_probs(jnp.asarray(probs), (48, 48)))
    expected = cv2.resize(probs[0, ..., 0], (48, 48), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(up[0, ..., 0], expected, atol=2e-3)
