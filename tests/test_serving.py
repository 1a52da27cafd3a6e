"""Hand-scheduled serving forward vs the Flax module path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_image_segmentation_tpu.config import ModelConfig
from unet_image_segmentation_tpu.models.unet import build_unet, init_unet
from unet_image_segmentation_tpu.serving import (
    build_serving_forward,
    build_serving_forward_chained,
)

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


@pytest.mark.parametrize(
    "filters,num_classes", [((8, 16), 1), ((8, 16), 3), ((64, 128), 1)]
)
def test_chained_serving_matches_module_path(rng_np, filters, num_classes):
    """The chained-packed graph (Predictor default): packed stage
    threading, pair kernels with fused pool tails, two-stream decoder
    concat.  (64, 128) covers the default-width pack regime (pack-8
    stage 1 with a non-p//2 repack, p_dec=2 two-stream decoder)."""
    hw = 32 if filters == (8, 16) else 16
    cfg = ModelConfig(
        image_height=hw, image_width=hw, filters=filters,
        num_classes=num_classes, dropout_rate=0.0,
    )
    model = build_unet(cfg)
    variables = init_unet(model, jax.random.PRNGKey(0), cfg.input_shape)
    forward = build_serving_forward_chained(
        variables, num_classes=num_classes, depth=len(filters),
        compute_dtype=jnp.float32,
    )
    x = rng_np.rand(2, hw, hw, 3).astype(np.float32)
    got = np.asarray(forward(jnp.asarray(x)))
    expected = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)


def test_chained_serving_full_ladder(rng_np):
    cfg = ModelConfig(image_height=32, image_width=32, dropout_rate=0.0)
    model = build_unet(cfg)
    variables = init_unet(model, jax.random.PRNGKey(1), cfg.input_shape)
    forward = build_serving_forward_chained(variables, compute_dtype=jnp.float32)
    x = rng_np.rand(1, 32, 32, 3).astype(np.float32)
    got = np.asarray(forward(jnp.asarray(x)))
    expected = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
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


def test_sharded_serving_matches_unsharded(rng_np):
    """Spatially-sharded Pallas serving graph == the unsharded graph.

    Mesh (data=2, spatial=4): batch on 'data', image rows on 'spatial'
    with explicit 2-row halo exchange around every fused block pair.
    """
    from unet_image_segmentation_tpu.parallel.mesh import create_mesh
    from unet_image_segmentation_tpu.serving import (
        build_serving_forward_sharded,
    )

    hw = 64
    cfg = ModelConfig(
        image_height=hw, image_width=hw, filters=(8, 16), dropout_rate=0.0
    )
    model = build_unet(cfg)
    variables = init_unet(model, jax.random.PRNGKey(2), cfg.input_shape)
    mesh = create_mesh(data=2, spatial=4)
    fwd_sharded = build_serving_forward_sharded(
        variables, mesh, num_classes=1, depth=2, compute_dtype=jnp.float32
    )
    fwd_single = build_serving_forward(
        variables, num_classes=1, depth=2, compute_dtype=jnp.float32
    )
    x = jnp.asarray(rng_np.rand(4, hw, hw, 3).astype(np.float32))
    got = np.asarray(fwd_sharded(x))
    want = np.asarray(fwd_single(x))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_sharded_streaming_predictor_matches(rng_np, tmp_path):
    """StreamingPredictor(mesh=...) with a Pallas predictor: sharded
    uint8-in/mask-out pipeline equals the single-device pipeline."""
    from unet_image_segmentation_tpu.inference import Predictor
    from unet_image_segmentation_tpu.parallel.mesh import create_mesh
    from unet_image_segmentation_tpu.streaming import StreamingPredictor
    from unet_image_segmentation_tpu.train.checkpoint import (
        save_inference_variables,
    )

    hw = 64
    cfg = ModelConfig(
        image_height=hw, image_width=hw, filters=(8, 16), dropout_rate=0.0
    )
    model = build_unet(cfg)
    variables = init_unet(model, jax.random.PRNGKey(3), cfg.input_shape)
    model_kwargs = dict(
        num_classes=1, filters=(8, 16), dropout_rate=0.0,
        use_batch_norm=True, conv_type="separable",
    )
    ckpt = str(tmp_path / "m")
    save_inference_variables(
        ckpt,
        variables["params"],
        batch_stats=variables.get("batch_stats"),
        model_kwargs=model_kwargs,
    )

    predictor = Predictor(
        ckpt, image_size=(hw, hw), compute_dtype="float32", use_pallas=True
    )
    assert predictor.serving_kwargs is not None
    mesh = create_mesh(data=2, spatial=4)
    frames = (rng_np.rand(4, 96, 96, 3) * 255).astype(np.uint8)
    sharded = StreamingPredictor(
        predictor, frame_hw=(96, 96), batch_size=4, mesh=mesh
    )
    single = StreamingPredictor(predictor, frame_hw=(96, 96), batch_size=4)
    np.testing.assert_array_equal(sharded(frames), single(frames))
