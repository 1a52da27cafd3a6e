"""Fused decoder feed (ops/pallas/fused_upconcat.py) vs the composed-XLA
oracle: Conv2DTranspose(2x2, s2) + [up | skip] concat, packed p=2.

Forward must be bit-exact (the kernel's matmuls use the same operand
dtypes and f32 accumulation as the oracle's einsum on fp32 inputs, and
every interleave is an exact 0/1 selection), and all four gradients
(x, kernel, bias, skip) must match.  Covers the three lane paths:
permutation-matmul (F=64 chunks), aligned slices (F>=128), and the
K=p_s/2 block-diagonal regroup for wider skip packs (the fused encoder
emits enc1's skip at p=8).  Rebuilds reference model/u_net.py:91-99.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_image_segmentation_tpu.ops.pallas.fused_upconcat import (
    fused_upconcat,
    upconcat_reference,
)


def _check(B, H, W, C, F, p_s):
    rng = np.random.RandomState(C + F + p_s)
    x = jnp.asarray(rng.rand(B, H, W, C), jnp.float32)
    k = jnp.asarray(rng.randn(2, 2, F, C) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.randn(F) * 0.1, jnp.float32)
    skip_un = jnp.asarray(rng.rand(B, 2 * H, 2 * W, F), jnp.float32)
    skip_p = skip_un.reshape(B, 2 * H, (2 * W) // p_s, p_s * F)

    def loss_f(x, k, bias, skip_p):
        cat = fused_upconcat(x, k, bias, skip_p, p_s)
        assert cat is not None, "config should be supported"
        return jnp.sum(cat * jnp.sin(cat)), cat

    def loss_r(x, k, bias, skip_p):
        cat = upconcat_reference(
            x, k, bias, skip_p.reshape(B, 2 * H, 2 * W, F)
        )
        return jnp.sum(cat * jnp.sin(cat)), cat

    (_, cf), gf = jax.value_and_grad(
        loss_f, argnums=(0, 1, 2, 3), has_aux=True
    )(x, k, bias, skip_p)
    (_, cr), gr = jax.value_and_grad(
        loss_r, argnums=(0, 1, 2, 3), has_aux=True
    )(x, k, bias, skip_p)
    np.testing.assert_array_equal(np.asarray(cf), np.asarray(cr))
    for name, a, b in zip("x kernel bias skip".split(), gf, gr):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4 * scale, rtol=1e-5,
            err_msg=f"grad {name}",
        )


def test_perm_path_f64():
    _check(2, 8, 16, 128, 64, 2)


def test_dec1_regime_skip_pack8():
    # enc1's native skip pack: K=4 regroup matmuls + lane permutation
    _check(2, 8, 16, 128, 64, 8)


def test_aligned_path_f128():
    _check(2, 4, 16, 256, 128, 2)


def test_k2_regroup():
    _check(1, 8, 32, 128, 64, 4)


def test_unsupported_returns_none():
    x = jnp.zeros((1, 8, 16, 128), jnp.float32)
    k = jnp.zeros((2, 2, 64, 128), jnp.float32)
    b = jnp.zeros((64,), jnp.float32)
    # p_skip == 1 (unpacked skip): composed path required
    skip = jnp.zeros((1, 16, 32, 64), jnp.float32)
    assert fused_upconcat(x, k, b, skip, 1) is None
    # channel count below a lane tile
    x2 = jnp.zeros((1, 8, 16, 64), jnp.float32)
    k2 = jnp.zeros((2, 2, 32, 64), jnp.float32)
    skip2 = jnp.zeros((1, 16, 16, 64), jnp.float32)
    assert fused_upconcat(x2, k2, jnp.zeros((32,)), skip2, 2) is None


def test_bfloat16_inputs():
    B, H, W, C, F = 1, 4, 16, 128, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, C), jnp.bfloat16)
    k = jnp.asarray(rng.randn(2, 2, F, C) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.randn(F) * 0.1, jnp.float32)
    skip = jnp.asarray(rng.rand(B, 2 * H, W, 2 * F), jnp.bfloat16)
    cat = fused_upconcat(x, k, bias, skip, 2)
    assert cat is not None and cat.dtype == jnp.bfloat16
    ref = upconcat_reference(
        x, k, bias, skip.reshape(B, 2 * H, 2 * W, F)
    )
    np.testing.assert_allclose(
        np.asarray(cat, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )
