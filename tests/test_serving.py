"""Hand-scheduled serving forward vs the Flax module path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_image_segmentation_tpu.config import ModelConfig
from unet_image_segmentation_tpu.models.unet import build_unet, init_unet
from unet_image_segmentation_tpu.serving import build_serving_forward

HW = 32


@pytest.mark.parametrize("filters,num_classes", [((8, 16), 1), ((8, 16), 3)])
def test_serving_matches_module_path(rng_np, filters, num_classes):
    cfg = ModelConfig(
        image_height=HW, image_width=HW, filters=filters,
        num_classes=num_classes, dropout_rate=0.0,
    )
    model = build_unet(cfg)
    variables = init_unet(model, jax.random.PRNGKey(0), cfg.input_shape)
    forward = build_serving_forward(
        variables, num_classes=num_classes, depth=len(filters),
        compute_dtype=jnp.float32,
    )
    x = rng_np.rand(2, HW, HW, 3).astype(np.float32)
    got = np.asarray(forward(jnp.asarray(x)))
    expected = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)


def test_serving_full_ladder_small_input(rng_np):
    """Full 64..1024 filter ladder (lane-packing hits every branch)."""
    cfg = ModelConfig(image_height=32, image_width=32, dropout_rate=0.0)
    model = build_unet(cfg)
    variables = init_unet(model, jax.random.PRNGKey(1), cfg.input_shape)
    forward = build_serving_forward(variables, compute_dtype=jnp.float32)
    x = rng_np.rand(1, 32, 32, 3).astype(np.float32)
    got = np.asarray(forward(jnp.asarray(x)))
    expected = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)
