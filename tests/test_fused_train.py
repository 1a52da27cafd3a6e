"""Fused train-chain kernels vs the composed-XLA autodiff oracle.

The whole-stage fused training path (ops/pallas/fused_train.py) must
reproduce ``chain_reference`` — sepconv -> BatchNorm(batch stats) -> ReLU
per block — for outputs, batch moments, AND all gradients (input + every
weight), in interpret mode on the CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_image_segmentation_tpu.ops.pallas.fused_train import (
    chain_reference,
    fused_chain_train,
)

HW = 32


def _params(rng, c, f):
    return (
        jnp.asarray(rng.randn(3, 3, c, 1) * 0.4, jnp.float32),
        jnp.asarray(rng.randn(1, 1, c, f) * 0.4, jnp.float32),
        jnp.asarray(1.0 + 0.1 * rng.randn(f), jnp.float32),
        jnp.asarray(0.05 * rng.randn(f), jnp.float32),
    )


def _check_chain(channels, batch=2, hw=HW, atol=2e-4):
    rng = np.random.RandomState(7 + channels[-1])
    x = jnp.asarray(rng.rand(batch, hw, hw, channels[0]), jnp.float32)
    blocks = []
    c = channels[0]
    for f in channels[1:]:
        blocks.append(_params(rng, c, f))
        c = f

    def loss_fused(x, blocks):
        z, stats = fused_chain_train(x, blocks)
        return jnp.sum(z * z) + 0.0 * sum(
            jnp.sum(m) + jnp.sum(v) for (m, v) in stats
        ), (z, stats)

    def loss_ref(x, blocks):
        z, stats = chain_reference(x, blocks)
        return jnp.sum(z * z) + 0.0 * sum(
            jnp.sum(m) + jnp.sum(v) for (m, v) in stats
        ), (z, stats)

    (lf, (zf, sf)), gf = jax.value_and_grad(loss_fused, argnums=(0, 1), has_aux=True)(
        x, blocks
    )
    (lr, (zr, sr)), gr = jax.value_and_grad(loss_ref, argnums=(0, 1), has_aux=True)(
        x, blocks
    )

    np.testing.assert_allclose(np.asarray(zf), np.asarray(zr), atol=atol, rtol=1e-4)
    for (mf, vf), (mr, vr) in zip(sf, sr):
        np.testing.assert_allclose(np.asarray(mf), np.asarray(mr), atol=atol, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vr), atol=atol, rtol=1e-4)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5)

    flat_f, _ = jax.tree_util.tree_flatten(gf)
    flat_r, _ = jax.tree_util.tree_flatten(gr)
    assert len(flat_f) == len(flat_r)
    for a, b in zip(flat_f, flat_r):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-3 * scale, rtol=2e-3
        )


def test_single_block_packable():
    _check_chain((8, 8))


def test_pair_packable():
    _check_chain((8, 8, 16))


def test_pair_unpackable_first_block():
    # 3-channel input: block 1 falls back to composed XLA, block 2 fuses.
    _check_chain((3, 8, 8))


def test_pair_fully_unpackable():
    # odd widths defeat packing entirely -> full XLA fallback path
    rngs = np.random.RandomState(0)
    x = jnp.asarray(rngs.rand(2, 12, 12, 4), jnp.float32)
    blocks = [_params(rngs, 4, 4), _params(rngs, 4, 4)]
    zf, sf = fused_chain_train(x, blocks)
    zr, sr = chain_reference(x, blocks)
    np.testing.assert_allclose(np.asarray(zf), np.asarray(zr), atol=2e-4, rtol=1e-4)


def test_chain_under_shard_map_matches_global():
    """Batch-sharded chain with axis_name == unsharded full-batch chain."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(8, HW, HW, 8), jnp.float32)
    blocks = [_params(rng, 8, 8)]
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("data",))

    def local_fn(x_local, blocks):
        z, stats = fused_chain_train(x_local, blocks, axis_name="data")
        return z, stats

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P("data", None, None, None), P()),
        out_specs=(P("data", None, None, None), P()),
        check_vma=False,
    )
    z_s, stats_s = sharded(x, blocks)
    z_g, stats_g = fused_chain_train(x, blocks)
    np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_g), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(stats_s[0][0]), np.asarray(stats_g[0][0]), atol=1e-5, rtol=1e-5
    )


def _check_chain_dropout(channels, rate=0.25, seed=12345, batch=2, hw=HW):
    """Fused chain with fused input dropout vs the XLA oracle: the
    position-hash mask (ops/hash_dropout.py) is a pure function of
    logical coordinates + seed, so outputs AND all gradients must match
    the reference chain fed the same hash-dropped input."""
    rng = np.random.RandomState(11 + channels[-1])
    x = jnp.asarray(rng.rand(batch, hw, hw, channels[0]), jnp.float32)
    blocks = []
    c = channels[0]
    for f in channels[1:]:
        blocks.append(_params(rng, c, f))
        c = f
    sd = jnp.int32(seed)

    def loss_fused(x, blocks):
        z, stats = fused_chain_train(x, blocks, drop_rate=rate, drop_seed=sd)
        return jnp.sum(z * z), z

    def loss_ref(x, blocks):
        z, stats = chain_reference(x, blocks, drop_rate=rate, drop_seed=sd)
        return jnp.sum(z * z), z

    (lf, zf), gf = jax.value_and_grad(loss_fused, argnums=(0, 1), has_aux=True)(
        x, blocks
    )
    (lr, zr), gr = jax.value_and_grad(loss_ref, argnums=(0, 1), has_aux=True)(
        x, blocks
    )
    np.testing.assert_allclose(np.asarray(zf), np.asarray(zr), atol=2e-4, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gr)):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-3 * scale, rtol=2e-3
        )
    # and the mask actually dropped something (not a no-op)
    z_nodrop, _ = fused_chain_train(x, blocks)
    assert float(jnp.max(jnp.abs(zf - z_nodrop))) > 1e-3


def test_chain_input_dropout_packed():
    # packed chain path: kernels regenerate the mask from packed coords
    _check_chain_dropout((8, 8, 16))


def test_chain_input_dropout_unpackable():
    # XLA-fallback chain path: the jnp oracle mask applies instead
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(2, 12, 12, 4), jnp.float32)
    blocks = [_params(rng, 4, 4), _params(rng, 4, 4)]
    sd = jnp.int32(777)
    zf, _ = fused_chain_train(x, blocks, drop_rate=0.3, drop_seed=sd)
    zr, _ = chain_reference(x, blocks, drop_rate=0.3, drop_seed=sd)
    np.testing.assert_allclose(np.asarray(zf), np.asarray(zr), atol=2e-4, rtol=1e-4)


def test_chain_input_dropout_padded_channels():
    # 3-channel first block: channel padding would shift packed coords,
    # so the chain applies the (identical) mask outside the kernel
    _check_chain_dropout((3, 8, 8))


def test_chain_dropout_seed_changes_mask():
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.rand(2, HW, HW, 8), jnp.float32)
    blocks = [_params(rng, 8, 8)]
    z1, _ = fused_chain_train(x, blocks, drop_rate=0.4, drop_seed=jnp.int32(1))
    z2, _ = fused_chain_train(x, blocks, drop_rate=0.4, drop_seed=jnp.int32(2))
    assert float(jnp.max(jnp.abs(z1 - z2))) > 1e-3


def test_chain_bwd_phase_bf16(monkeypatch):
    """UNET_TPU_BWD_PHASE=bf16 (shift dm/z slabs in bf16) perturbs the
    gradients only within bf16 rounding of the default f32 phase."""
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.rand(2, HW, HW, 64), jnp.float32)
    blocks = [_params(rng, 64, 64), _params(rng, 64, 64)]

    def loss(x, blocks):
        z, stats = fused_chain_train(x, blocks)
        return jnp.sum(z * z) + 0.0 * sum(
            jnp.sum(m) + jnp.sum(v) for (m, v) in stats
        )

    monkeypatch.setenv("UNET_TPU_BWD_PHASE", "f32")
    g32 = jax.grad(loss, argnums=(0, 1))(x, blocks)
    monkeypatch.setenv("UNET_TPU_BWD_PHASE", "bf16")
    g16 = jax.grad(loss, argnums=(0, 1))(x, blocks)
    flat32, _ = jax.tree_util.tree_flatten(g32)
    flat16, _ = jax.tree_util.tree_flatten(g16)
    changed = False
    for a, b in zip(flat32, flat16):
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-2 * scale, rtol=1e-2
        )
        changed = changed or bool(jnp.any(a != b))
    assert changed, "bf16 phase did not engage (grads bit-identical)"


# ---------------------------------------------------------------------------
# Streamed pool-tail kernels: at 1024px-class shapes the whole-batch-item
# pooled block no longer fits VMEM and the tail used to fall back to
# composed XLA; the stream variants DMA the pooled tensor per tile instead.
# The math is identical — stream vs resident must be bit-exact.
# ---------------------------------------------------------------------------


def _tail_fixture(rng, B=1, H=64, WP=32, P=4, F=64):
    y = jnp.asarray(rng.randn(B, H, WP, P * F), jnp.float32)
    a = jnp.asarray(1.0 + 0.1 * rng.randn(F), jnp.float32)
    b = jnp.asarray(0.05 * rng.randn(F), jnp.float32)
    return y, a, b


def test_tail_pool_stream_matches_resident(monkeypatch):
    from unet_image_segmentation_tpu.ops.pallas import fused_sepconv as fs
    from unet_image_segmentation_tpu.ops.pallas import fused_train as ft

    rng = np.random.RandomState(3)
    B, H, WP, P, F = 1, 64, 32, 4, 64  # pf=256, pf//2=128 (streamable)
    y, a, b = _tail_fixture(rng, B, H, WP, P, F)

    assert ft._pick_tile_h_tail(H, WP, P * F, bwd=False) is not None
    z_res, p_res = ft._tail_pool_packed(y, a, b, P, F)

    # a budget where the resident pooled block can't fit but the
    # streamed per-tile slab can
    monkeypatch.setattr(fs, "VMEM_SCALE", 0.07)
    assert ft._pick_tile_h_tail(H, WP, P * F, bwd=False) is None
    assert ft._pick_tile_h_tail(H, WP, P * F, bwd=False, stream=True) is not None
    out = ft._tail_pool_packed(y, a, b, P, F)
    assert out is not None
    z_st, p_st = out
    np.testing.assert_array_equal(np.asarray(z_st), np.asarray(z_res))
    np.testing.assert_array_equal(np.asarray(p_st), np.asarray(p_res))


def test_tail_pool_bwd_stream_matches_resident(monkeypatch):
    from unet_image_segmentation_tpu.ops.pallas import fused_sepconv as fs
    from unet_image_segmentation_tpu.ops.pallas import fused_train as ft

    rng = np.random.RandomState(4)
    B, H, WP, P, F = 1, 64, 32, 4, 64
    y, a, b = _tail_fixture(rng, B, H, WP, P, F)
    gs = jnp.asarray(rng.randn(B, H, WP, P * F), jnp.float32)
    gp = jnp.asarray(rng.randn(B, H // 2, WP, P * F // 2), jnp.float32)
    mean = jnp.asarray(0.1 * rng.randn(F), jnp.float32)
    rstd = jnp.asarray(1.0 + 0.1 * rng.rand(F), jnp.float32)
    aff4 = jnp.stack([a, b, mean, rstd])

    assert ft._pick_tile_h_tail(H, WP, P * F, bwd=True) is not None
    d_res, st_res = ft._tail_pool_bwd_packed(y, gs, gp, aff4, P, F)

    monkeypatch.setattr(fs, "VMEM_SCALE", 0.1)
    assert ft._pick_tile_h_tail(H, WP, P * F, bwd=True) is None
    assert ft._pick_tile_h_tail(H, WP, P * F, bwd=True, stream=True) is not None
    out = ft._tail_pool_bwd_packed(y, gs, gp, aff4, P, F)
    assert out is not None
    d_st, st_st = out
    # dzt is elementwise — bit-exact; the S/T column sums accumulate in a
    # different tile order (stream picks a smaller tile), so f32 only
    np.testing.assert_array_equal(np.asarray(d_st), np.asarray(d_res))
    np.testing.assert_allclose(
        np.asarray(st_st), np.asarray(st_res), rtol=1e-5, atol=1e-4
    )


def test_tail_pool_sub_lane_shapes_still_fall_back(monkeypatch):
    """pf//2 < LANE can't ride the streamed DMA (Mosaic lane tiling):
    when the resident block doesn't fit either, the tail returns None
    (the chain composes the boundary in XLA) instead of crashing."""
    from unet_image_segmentation_tpu.ops.pallas import fused_sepconv as fs
    from unet_image_segmentation_tpu.ops.pallas import fused_train as ft

    rng = np.random.RandomState(5)
    y, a, b = _tail_fixture(rng, B=1, H=64, WP=32, P=2, F=64)  # pf//2 = 64
    monkeypatch.setattr(fs, "VMEM_SCALE", 0.01)
    assert ft._tail_pool_packed(y, a, b, 2, 64) is None
