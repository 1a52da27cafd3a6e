"""Spatially-sharded fused-chain TRAINING parity (CPU 8-device mesh).

The fused Pallas training chains run with image rows sharded over a
'spatial' mesh axis (1-row z-space halo exchange per link over ICI —
``ops/pallas/fused_train.py`` spatial section).  These tests pin the
sharded chain — forward, BN batch moments, and the full gradient tree
(params AND input cotangent, including the cross-shard halo-gradient
flows) — against the unsharded chain run on the gathered input, which is
itself pinned against ``chain_reference``/``jax.vjp`` elsewhere
(``tests/test_fused_train.py``).

Scales the capability the reference caps by host-resizing everything to
256px (reference ``scripts/train.py:84-88``, SURVEY §5 long-context
analog).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from unet_image_segmentation_tpu.ops.pallas.fused_train import (
    fused_chain_train,
    fused_chain_train_pool,
)
from unet_image_segmentation_tpu.parallel.mesh import create_mesh


def _make_blocks(rng, chans):
    """Per-link (depthwise (3,3,C), pointwise (C,F), gamma (F,), beta (F,))."""
    blocks = []
    for c, f in zip(chans[:-1], chans[1:]):
        blocks.append(
            (
                jnp.asarray(rng.randn(3, 3, c) * 0.3, jnp.float32),
                jnp.asarray(rng.randn(c, f) * 0.2, jnp.float32),
                jnp.asarray(1.0 + 0.1 * rng.randn(f), jnp.float32),
                jnp.asarray(0.1 * rng.randn(f), jnp.float32),
            )
        )
    return blocks


def _flat(blocks):
    return [t for blk in blocks for t in blk]


def _unflat(flat):
    return [tuple(flat[i : i + 4]) for i in range(0, len(flat), 4)]


def _spatial_chain_case(rng_np, chans, shape, n_spatial, pool=False):
    """Run the sharded chain + grads and the unsharded oracle; compare."""
    b, h, w, _ = shape
    x = jnp.asarray(rng_np.randn(*shape) * 0.5, jnp.float32)
    blocks = _make_blocks(rng_np, chans)
    mesh = create_mesh(data=1, spatial=n_spatial,
                       devices=jax.devices()[:n_spatial])

    def run(chain_fn, x_in, flat_params, **kw):
        z_and_rest = chain_fn(x_in, _unflat(flat_params), **kw)
        return z_and_rest

    def loss_of(outs, pool_mode):
        if pool_mode:
            z_p, _p, pooled, stats = outs
            val = jnp.sum(z_p.astype(jnp.float32) ** 2) + jnp.sum(
                jnp.sin(pooled.astype(jnp.float32))
            )
        else:
            z, stats = outs
            val = jnp.sum(z.astype(jnp.float32) ** 2)
        return val, stats

    # ---- unsharded oracle ----
    def oracle_fn(x_in, *flat_params):
        kw = dict(pool_to_pack=2) if pool else {}
        outs = run(
            fused_chain_train_pool if pool else fused_chain_train,
            x_in, list(flat_params), **kw,
        )
        val, stats = loss_of(outs, pool)
        return val, (outs, stats)

    (ref_loss, (ref_outs, ref_stats)), ref_grads = jax.value_and_grad(
        oracle_fn, argnums=tuple(range(1 + len(_flat(blocks)))), has_aux=True
    )(x, *_flat(blocks))

    # ---- sharded run: rows on 'spatial' ----
    def local_fn(x_loc, *flat_params):
        def lf(args):
            x_l, fp = args
            kw = dict(
                axis_name="spatial", spatial_axis="spatial",
            )
            if pool:
                kw["pool_to_pack"] = 2
            outs = run(
                fused_chain_train_pool if pool else fused_chain_train,
                x_l, list(fp), **kw,
            )
            val, stats = loss_of(outs, pool)
            return val, (outs, stats)

        (val, (outs, stats)), grads = jax.value_and_grad(
            lf, has_aux=True
        )((x_loc, list(flat_params)))
        dx, dparams = grads
        # loss and param grads: sums of per-shard partials
        val = jax.lax.psum(val, "spatial")
        dparams = jax.lax.psum(dparams, "spatial")
        if pool:
            z_p, _p, pooled, _ = outs
            return val, z_p, pooled, stats, dx, dparams
        z, _ = outs
        return val, z, stats, dx, dparams

    spec_x = P(None, "spatial", None, None)
    n_out = 6 if pool else 5
    out_specs = (
        (P(), spec_x, spec_x, P(), spec_x, P())
        if pool
        else (P(), spec_x, P(), spec_x, P())
    )
    sharded = jax.jit(
        shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(spec_x,) + (P(),) * len(_flat(blocks)),
            out_specs=out_specs,
            check_vma=False,
        )
    )
    res = sharded(x, *_flat(blocks))
    assert len(res) == n_out

    if pool:
        s_loss, s_zp, s_pooled, s_stats, s_dx, s_dparams = res
        ref_zp, _rp, ref_pooled, _ = ref_outs
        np.testing.assert_allclose(
            np.asarray(s_pooled), np.asarray(ref_pooled), atol=2e-4, rtol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(s_zp), np.asarray(ref_zp), atol=2e-4, rtol=2e-4
        )
    else:
        s_loss, s_z, s_stats, s_dx, s_dparams = res
        ref_z, _ = ref_outs
        np.testing.assert_allclose(
            np.asarray(s_z), np.asarray(ref_z), atol=2e-4, rtol=2e-4
        )

    np.testing.assert_allclose(
        float(s_loss), float(ref_loss), rtol=1e-5
    )
    for (sm, sv), (rm, rv) in zip(s_stats, ref_stats):
        np.testing.assert_allclose(np.asarray(sm), np.asarray(rm), atol=1e-5)
        np.testing.assert_allclose(np.asarray(sv), np.asarray(rv), atol=1e-5)
    # input cotangent: includes the reverse-ppermuted halo gradients
    np.testing.assert_allclose(
        np.asarray(s_dx), np.asarray(ref_grads[0]), atol=3e-4, rtol=3e-4
    )
    # parameter gradients: psum of per-shard partials == unsharded grads
    for sg, rg in zip(s_dparams, ref_grads[1:]):
        np.testing.assert_allclose(
            np.asarray(sg), np.asarray(rg), atol=3e-4, rtol=3e-4,
            err_msg=f"param grad shape {np.shape(rg)}",
        )


def test_spatial_chain_packed_matches_unsharded(rng_np):
    """Packed chain (p=2 lanes), 4 spatial shards: forward + moments +
    full grads equal the unsharded chain."""
    _spatial_chain_case(rng_np, [64, 64, 64], (2, 16, 16, 64), 4)


def test_spatial_chain_narrow_input_fallback(rng_np):
    """3-channel first link (the XLA-fallback + channel-pad path) with
    halo-augmented slabs."""
    _spatial_chain_case(rng_np, [3, 8, 8], (2, 16, 12, 3), 4)


def test_spatial_chain_two_shards(rng_np):
    _spatial_chain_case(rng_np, [64, 64, 64], (1, 8, 16, 64), 2)


def test_spatial_pool_chain_matches_unsharded(rng_np):
    """Encoder pool variant: packed skip + pooled output + grads."""
    _spatial_chain_case(rng_np, [64, 64, 64], (2, 16, 16, 64), 4, pool=True)


def test_spatial_chain_production_ladder(rng_np):
    """VERDICT r3 item 6: a production-ladder stage pair (64 -> 128
    channels, F >= 128 lane packing) under shard_map on the CPU mesh —
    the packing regime the real model runs at."""
    _spatial_chain_case(rng_np, [64, 128, 128], (1, 8, 16, 64), 2)
