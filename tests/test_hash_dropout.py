"""Position-hash dropout (ops/hash_dropout.py): the stateless mask that the
fused training chains regenerate in VMEM from absolute coordinates.

Properties pinned here:
* bit-exact match with a NumPy murmur3-fmix32 oracle (the kernel and the
  jnp path share the same integer arithmetic — verified on real TPU via
  Mosaic in round 3's bring-up);
* packed-layout invariance: the mask of a ``(B, H, W/p, p*C)`` packed
  tensor equals the unpacked NHWC mask (this is what lets differently
  tiled forward/backward kernels regenerate identical keep decisions);
* Bernoulli(1-rate) marginal keep statistics + mean preservation;
* seed sensitivity (masks decorrelate across seeds).

Replaces the reference's stateful ``tf.keras.layers.Dropout``
(reference model/u_net.py:75-99) inside the fused chains.
"""

import jax
import jax.numpy as jnp
import numpy as np

from unet_image_segmentation_tpu.ops import hash_dropout as hd


def _np_mix(idx: np.ndarray, seed: int) -> np.ndarray:
    h = idx.astype(np.uint32) ^ np.uint32(seed)
    h ^= h >> np.uint32(16)
    h = (h * np.uint32(0x85EBCA6B)) & np.uint32(0xFFFFFFFF)
    h ^= h >> np.uint32(13)
    h = (h * np.uint32(0xC2B2AE35)) & np.uint32(0xFFFFFFFF)
    h ^= h >> np.uint32(16)
    return h.astype(np.int32)


def test_mix_hash_matches_numpy_oracle():
    idx = np.arange(4096, dtype=np.int32) - 1024  # include negatives
    got = np.asarray(hd.mix_hash(jnp.asarray(idx), jnp.int32(987654321)))
    np.testing.assert_array_equal(got, _np_mix(idx, 987654321))


def test_packed_mask_equals_unpacked_mask():
    b, h, w, c = 2, 16, 32, 64
    seed = jnp.int32(9)
    thr = hd.keep_threshold(0.3)
    k_un = hd.array_keep_mask((b, h, w, c), 1, c, seed, thr)
    for p in (2, 4):
        k_p = hd.array_keep_mask((b, h, w // p, p * c), p, c, seed, thr)
        assert bool(jnp.all(k_un == k_p.reshape(b, h, w, c))), f"p={p}"


def test_slab_mask_is_a_window_of_the_array_mask():
    b, h, wp, pc, p, c = 3, 32, 8, 128, 4, 32
    seed = jnp.int32(77)
    thr = hd.keep_threshold(0.25)
    full = hd.array_keep_mask((b, h, wp, pc), p, c, seed, thr)
    slab = hd.slab_keep_mask(
        jnp.int32(1), jnp.int32(8), 10, wp, pc, h, p, c, seed, thr
    )
    assert bool(jnp.all(slab == full[1, 8:18]))


def test_keep_rate_and_mean_preservation():
    rate = 0.2
    x = jnp.ones((4, 64, 64, 32), jnp.float32)
    y = hd.hash_dropout(x, jnp.int32(3), rate)
    kept = float(jnp.mean((y > 0).astype(jnp.float32)))
    assert abs(kept - (1.0 - rate)) < 0.01
    # inverted-scaling: E[y] == E[x]
    assert abs(float(jnp.mean(y)) - 1.0) < 0.02
    # kept elements are scaled by exactly 1/(1-rate)
    vals = np.unique(np.asarray(y))
    np.testing.assert_allclose(
        vals[vals > 0], 1.0 / (1.0 - rate), rtol=1e-6
    )


def test_masks_decorrelate_across_seeds():
    shape = (2, 32, 32, 16)
    thr = hd.keep_threshold(0.5)
    k1 = hd.array_keep_mask(shape, 1, 16, jnp.int32(1), thr)
    k2 = hd.array_keep_mask(shape, 1, 16, jnp.int32(2), thr)
    agree = float(jnp.mean((k1 == k2).astype(jnp.float32)))
    assert 0.45 < agree < 0.55  # independent fair coins agree ~50%


def test_hash_dropout_is_differentiable():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 4), jnp.float32)
    seed = jnp.int32(5)

    def f(x):
        return jnp.sum(hd.hash_dropout(x, seed, 0.25) ** 2)

    g = jax.grad(f)(x)
    y = hd.hash_dropout(x, seed, 0.25)
    # d/dx sum(y^2) = 2*y*inv_keep on kept elements, 0 on dropped
    expect = 2.0 * y / (1.0 - 0.25) * (y > 0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(expect), rtol=1e-5)


def test_rate_zero_is_identity():
    x = jnp.asarray(np.random.RandomState(1).rand(2, 4, 4, 8), jnp.float32)
    assert bool(jnp.all(hd.hash_dropout(x, jnp.int32(0), 0.0) == x))
