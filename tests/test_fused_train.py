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
