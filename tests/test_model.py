"""U-Net shape/dtype tests against the SURVEY.md §3.4 shape trace."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_image_segmentation_tpu.config import ModelConfig
from unet_image_segmentation_tpu.models.unet import build_unet, init_unet
from unet_image_segmentation_tpu.ops import conv as conv_ops


def _make(cfg_kwargs=None, hw=32):
    cfg = ModelConfig(image_height=hw, image_width=hw, **(cfg_kwargs or {}))
    model = build_unet(cfg)
    variables = init_unet(model, jax.random.PRNGKey(0), cfg.input_shape)
    return cfg, model, variables


def test_forward_shape_binary():
    cfg, model, variables = _make()
    x = jnp.zeros((2, 32, 32, 3))
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 32, 32, 1)
    assert y.dtype == jnp.float32
    vals = np.asarray(y)
    assert (vals >= 0).all() and (vals <= 1).all()


def test_forward_shape_multiclass_softmax():
    cfg, model, variables = _make({"num_classes": 3})
    x = jnp.zeros((1, 32, 32, 3))
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0, rtol=1e-5)


def test_full_conv_variant():
    cfg, model, variables = _make({"conv_type": "full"})
    params = variables["params"]
    assert "kernel" in params["enc1_block1"]["conv"]
    assert params["enc1_block1"]["conv"]["kernel"].shape == (3, 3, 3, 64)
    y = model.apply(variables, jnp.zeros((1, 32, 32, 3)), train=False)
    assert y.shape == (1, 32, 32, 1)


def test_param_tree_structure_matches_reference_names():
    _, _, variables = _make()
    params = variables["params"]
    expected = {f"enc{s}_block{b}" for s in range(1, 5) for b in (1, 2)}
    expected |= {"bneck_block1", "bneck_block2"}
    expected |= {f"dec{s}_block{b}" for s in range(1, 5) for b in (1, 2)}
    expected |= {f"dec{s}_upsample" for s in range(1, 5)}
    expected |= {"output_mask"}
    assert set(params.keys()) == expected
    # use_bias = not use_batch_norm (reference u_net.py:18): no conv bias.
    assert "bias" not in params["enc1_block1"]["sepconv"]
    # Filter ladder 64..1024 (reference u_net.py:57-78).
    assert params["enc1_block1"]["sepconv"]["pointwise_kernel"].shape == (1, 1, 3, 64)
    assert params["bneck_block1"]["sepconv"]["pointwise_kernel"].shape == (1, 1, 512, 1024)
    # Decoder concat doubles channels: dec4 block1 sees 512(up)+512(skip).
    assert params["dec4_block1"]["sepconv"]["depthwise_kernel"].shape == (3, 3, 1024, 1)
    # Transpose kernels have Keras layout (2,2,out,in) and bias.
    assert params["dec4_upsample"]["kernel"].shape == (2, 2, 512, 1024)
    assert params["dec4_upsample"]["bias"].shape == (512,)
    # Head: 1x1 conv with bias.
    assert params["output_mask"]["kernel"].shape == (1, 1, 64, 1)
    assert "bias" in params["output_mask"]
    # Batch stats exist for every block.
    assert "batch_stats" in variables
    assert variables["batch_stats"]["enc1_block1"]["bn"]["mean"].shape == (64,)


def test_no_batch_norm_has_conv_bias():
    _, _, variables = _make({"use_batch_norm": False})
    params = variables["params"]
    assert "bias" in params["enc1_block1"]["sepconv"]
    assert "batch_stats" not in variables


def test_train_mode_mutates_batch_stats_and_uses_dropout():
    cfg, model, variables = _make()
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    y1, mut = model.apply(
        variables,
        x,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    # batch stats moved away from init (mean 0 / var 1)
    new_mean = mut["batch_stats"]["enc1_block1"]["bn"]["mean"]
    assert not np.allclose(np.asarray(new_mean), 0.0)
    # different dropout rng -> different output
    y2, _ = model.apply(
        variables,
        x,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    # eval mode is deterministic
    e1 = model.apply(variables, x, train=False)
    e2 = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))


def test_rejects_bad_spatial_dims():
    cfg, model, variables = _make()
    with pytest.raises(ValueError):
        model.apply(variables, jnp.zeros((1, 60, 60, 3)), train=False)


# ---- op-level oracles vs jax.lax reference implementations ----


def test_conv_transpose_2x2_matches_keras_semantics(rng_np):
    # Keras Conv2DTranspose(k=2, s=2, 'same') semantics, verified against
    # tf.keras directly (see tests/test_tf_parity.py for the live check):
    # y[b, 2h+i, 2w+j, f] = sum_c x[b, h, w, c] * K[i, j, f, c] + bias[f]
    x = rng_np.randn(2, 4, 4, 6).astype(np.float32)
    kernel = rng_np.randn(2, 2, 3, 6).astype(np.float32)  # (2,2,F,C)
    bias = rng_np.randn(3).astype(np.float32)
    got = np.asarray(
        conv_ops.conv_transpose_2x2(jnp.asarray(x), jnp.asarray(kernel), jnp.asarray(bias))
    )
    expected = np.zeros((2, 8, 8, 3), np.float32)
    for h in range(4):
        for w in range(4):
            for i in range(2):
                for j in range(2):
                    expected[:, 2 * h + i, 2 * w + j, :] = (
                        x[:, h, w, :] @ kernel[i, j].T
                    )
    expected += bias
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_max_pool_2x2_matches_reduce_window(rng_np):
    x = jnp.asarray(rng_np.randn(2, 8, 8, 3).astype(np.float32))
    got = conv_ops.max_pool_2x2(x)
    expected = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected))


def test_separable_conv_matches_composed_lax(rng_np):
    x = jnp.asarray(rng_np.randn(1, 8, 8, 6).astype(np.float32))
    dw = jnp.asarray(rng_np.randn(3, 3, 6, 1).astype(np.float32))
    pw = jnp.asarray(rng_np.randn(1, 1, 6, 4).astype(np.float32))
    bias = jnp.asarray(rng_np.randn(4).astype(np.float32))
    got = conv_ops.separable_conv2d(x, dw, pw, bias)
    # Oracle: per-channel 2D convolution then dense 1x1.
    mid = np.zeros((1, 8, 8, 6), np.float32)
    xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    for c in range(6):
        for i in range(8):
            for j in range(8):
                mid[0, i, j, c] = (
                    xp[0, i : i + 3, j : j + 3, c] * np.asarray(dw)[:, :, c, 0]
                ).sum()
    expected = mid @ np.asarray(pw)[0, 0] + np.asarray(bias)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-3)
