"""Pallas fused kernels vs jax.lax oracles (interpreter mode on CPU).

Shapes chosen to exercise each wrapper mode:
* C=128, F=128 -> direct kernel (pack p=1)
* C=64,  F=64  -> lane-packed kernel (p=2), the stage-1/2 hot case
* C=8,   F=12  -> no valid packing -> XLA fallback
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_image_segmentation_tpu.ops import conv as conv_ops
from unet_image_segmentation_tpu.ops.pallas import fused_sepconv as fs
from unet_image_segmentation_tpu.ops.pallas.fused_sepconv import (
    fused_sepconv_bn_relu,
    sepconv_apply,
)


def _random_inputs(rng, b=2, h=8, w=8, c=128, f=128):
    x = rng.randn(b, h, w, c).astype(np.float32)
    dw = rng.randn(3, 3, c, 1).astype(np.float32) * 0.3
    pw = rng.randn(1, 1, c, f).astype(np.float32) * 0.1
    bias = rng.randn(f).astype(np.float32)
    return x, dw, pw, bias


def _oracle(x, dw, pw, bias=None):
    return conv_ops.separable_conv2d(
        jnp.asarray(x), jnp.asarray(dw), jnp.asarray(pw),
        jnp.asarray(bias) if bias is not None else None,
    )


def test_pick_pack():
    assert fs._pick_pack(128, 128, 256) == 1
    assert fs._pick_pack(64, 64, 256) == 2
    assert fs._pick_pack(64, 128, 256) == 2
    assert fs._pick_pack(128, 64, 256) == 2
    assert fs._pick_pack(1024, 512, 16) == 1
    assert fs._pick_pack(3, 64, 256) is None  # input block -> XLA fallback
    assert fs._pick_pack(64, 64, 3) is None   # odd W cannot pack


@pytest.mark.parametrize("c,f", [(128, 128), (64, 64), (64, 128), (8, 12)])
def test_sepconv_matches_xla(rng_np, c, f):
    x, dw, pw, bias = _random_inputs(rng_np, c=c, f=f)
    got = np.asarray(
        sepconv_apply(jnp.asarray(x), jnp.asarray(dw), jnp.asarray(pw), jnp.asarray(bias))
    )
    expected = np.asarray(_oracle(x, dw, pw, bias))
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-4)


def test_sepconv_no_bias(rng_np):
    x, dw, pw, _ = _random_inputs(rng_np, h=4, w=16, c=64, f=64)
    got = np.asarray(sepconv_apply(jnp.asarray(x), jnp.asarray(dw), jnp.asarray(pw)))
    expected = np.asarray(_oracle(x, dw, pw))
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-4)


def test_fused_bn_relu_matches_composition(rng_np):
    x, dw, pw, bias = _random_inputs(rng_np, b=1, h=8, w=4, c=64, f=64)
    f = 64
    gamma = rng_np.rand(f).astype(np.float32) + 0.5
    beta = rng_np.randn(f).astype(np.float32)
    mean = rng_np.randn(f).astype(np.float32) * 0.1
    var = rng_np.rand(f).astype(np.float32) + 0.5
    eps = 1e-3
    got = np.asarray(
        fused_sepconv_bn_relu(
            jnp.asarray(x), jnp.asarray(dw), jnp.asarray(pw), None,
            bn_scale=jnp.asarray(gamma), bn_offset=jnp.asarray(beta),
            bn_mean=jnp.asarray(mean), bn_var=jnp.asarray(var), eps=eps,
        )
    )
    y = np.asarray(_oracle(x, dw, pw))
    y = (y - mean) / np.sqrt(var + eps) * gamma + beta
    expected = np.maximum(y, 0.0)
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-4)


def test_sepconv_single_row_tiles(rng_np):
    # h=2 exercises both-edges-adjacent halo handling
    x, dw, pw, bias = _random_inputs(rng_np, b=1, h=2, w=8, c=64, f=64)
    got = np.asarray(
        sepconv_apply(jnp.asarray(x), jnp.asarray(dw), jnp.asarray(pw), jnp.asarray(bias))
    )
    expected = np.asarray(_oracle(x, dw, pw, bias))
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-4)


@pytest.mark.parametrize("c,f", [(64, 64), (128, 128)])
def test_sepconv_gradients_match_xla(rng_np, c, f):
    x, dw, pw, bias = _random_inputs(rng_np, b=1, h=4, w=4, c=c, f=f)

    def loss_fused(x, dw, pw, bias):
        return jnp.sum(sepconv_apply(x, dw, pw, bias) ** 2)

    def loss_xla(x, dw, pw, bias):
        return jnp.sum(_oracle(x, dw, pw, bias) ** 2)

    args = tuple(map(jnp.asarray, (x, dw, pw, bias)))
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*args)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g_fused, g_xla):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-2, rtol=1e-3
        )


def test_sepconv_jit_and_shapes(rng_np):
    x, dw, pw, bias = _random_inputs(rng_np, b=3, h=16, w=8, c=64, f=64)
    fn = jax.jit(lambda *a: sepconv_apply(*a))
    out = fn(*map(jnp.asarray, (x, dw, pw, bias)))
    assert out.shape == (3, 16, 8, 64)
    assert out.dtype == jnp.float32
