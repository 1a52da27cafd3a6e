"""Mesh / sharding / halo-exchange tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from unet_image_segmentation_tpu.config import Config
from unet_image_segmentation_tpu.models.unet import build_unet
from unet_image_segmentation_tpu.ops.conv import conv2d
from unet_image_segmentation_tpu.parallel.halo import (
    halo_exchange,
    sharded_conv3x3_rows,
    spatial_sharded_forward,
)
from unet_image_segmentation_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    pad_batch_to_devices,
    replicated,
    shard_batch,
)
from unet_image_segmentation_tpu.train.state import create_train_state
from unet_image_segmentation_tpu.train.steps import make_train_step


def test_create_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["spatial"] == 1
    mesh2 = create_mesh(data=4, spatial=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["spatial"] == 2
    with pytest.raises(ValueError):
        create_mesh(data=16, spatial=1)


def test_shard_batch_and_padding():
    mesh = create_mesh()
    x = np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(8, 4, 4, 3)
    sharded = shard_batch({"image": x}, mesh)
    assert sharded["image"].sharding.spec == P("data")
    y, pad = pad_batch_to_devices(x[:5], 8)
    assert y.shape[0] == 8 and pad == 3
    np.testing.assert_array_equal(y[5], y[4])


def test_halo_exchange_matches_gather(rng_np):
    mesh = create_mesh(data=1, spatial=8)
    from jax import shard_map

    x = rng_np.rand(2, 32, 8, 4).astype(np.float32)  # 32 rows over 8 shards

    fn = shard_map(
        lambda xl: halo_exchange(xl, "spatial", 1),
        mesh=mesh,
        in_specs=P(None, "spatial", None, None),
        out_specs=P(None, "spatial", None, None),
        check_vma=False,
    )
    out = np.asarray(fn(jnp.asarray(x)))  # (2, 8*(4+2), 8, 4)
    out = out.reshape(2, 8, 6, 8, 4)
    for shard in range(8):
        lo = shard * 4
        np.testing.assert_array_equal(out[:, shard, 1:5], x[:, lo : lo + 4])
        if shard > 0:
            np.testing.assert_array_equal(out[:, shard, 0], x[:, lo - 1])
        else:
            assert (out[:, shard, 0] == 0).all()
        if shard < 7:
            np.testing.assert_array_equal(out[:, shard, 5], x[:, lo + 4])
        else:
            assert (out[:, shard, 5] == 0).all()


def test_sharded_conv_matches_single_device(rng_np):
    mesh = create_mesh(data=1, spatial=8)
    x = rng_np.rand(2, 32, 16, 8).astype(np.float32)
    kernel = (rng_np.randn(3, 3, 8, 8) * 0.2).astype(np.float32)

    sharded = sharded_conv3x3_rows(
        lambda p: conv2d(p, jnp.asarray(kernel)), mesh
    )
    got = np.asarray(sharded(jnp.asarray(x)))
    expected = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(kernel)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_spatial_sharded_unet_forward_matches(rng_np):
    mesh = create_mesh(data=2, spatial=4)
    cfg = Config().override(
        model__image_height=64, model__image_width=64, model__filters=(8, 16),
        model__dropout_rate=0.0,
    )
    model = build_unet(cfg.model)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)), train=False
    )
    x = rng_np.rand(4, 64, 64, 3).astype(np.float32)
    fwd = spatial_sharded_forward(model, variables, mesh)
    got = np.asarray(fwd(jnp.asarray(x)))
    expected = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_dp_train_step_matches_single_device(rng_np):
    """Gradient all-reduce over the mesh == single-device step numerics."""
    cfg = Config().override(
        model__image_height=32, model__image_width=32, model__filters=(8,),
        model__dropout_rate=0.0, train__batch_size=8,
    )
    model = build_unet(cfg.model)
    images = rng_np.rand(8, 32, 32, 3).astype(np.float32)
    masks = (rng_np.rand(8, 32, 32, 1) > 0.5).astype(np.float32)

    # single device
    state1 = create_train_state(cfg)
    step1 = make_train_step(model, donate=False)
    new1, m1 = step1(state1, jnp.asarray(images), jnp.asarray(masks))

    # 8-way DP
    mesh = create_mesh()
    state2 = jax.device_put(create_train_state(cfg), replicated(mesh))
    sharding = batch_sharding(mesh)
    step2 = make_train_step(model, donate=False)
    new2, m2 = step2(
        state2,
        jax.device_put(images, sharding),
        jax.device_put(masks, sharding),
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(new1.params)
    l2 = jax.tree_util.tree_leaves(new2.params)
    for a, b in zip(l1, l2):
        # psum's reduction order differs from the single-device sum, and
        # AdamW's rsqrt can amplify the reordering noise slightly; 1e-4 on
        # O(0.1) params still pins the all-reduce as numerically equivalent.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_sharded_pallas_fused_block_matches(rng_np):
    """The fused Pallas block composes with halo-exchange spatial sharding:
    shard rows, exchange 1-row halos, run the kernel per-shard, trim —
    numerics equal the unsharded kernel (STATUS gap: pallas + multi-chip)."""
    from unet_image_segmentation_tpu.ops.pallas.fused_sepconv import (
        fused_sepconv_bn_relu,
    )

    mesh = create_mesh(data=1, spatial=8)
    c, f = 64, 64
    x = rng_np.rand(2, 32, 16, c).astype(np.float32)
    dw = (rng_np.randn(3, 3, c, 1) * 0.3).astype(np.float32)
    pw = (rng_np.randn(1, 1, c, f) * 0.1).astype(np.float32)
    gamma = rng_np.rand(f).astype(np.float32) + 0.5
    beta = rng_np.randn(f).astype(np.float32)
    mean = rng_np.randn(f).astype(np.float32) * 0.1
    var = rng_np.rand(f).astype(np.float32) + 0.5

    def block(padded):
        return fused_sepconv_bn_relu(
            padded, jnp.asarray(dw), jnp.asarray(pw), None,
            bn_scale=jnp.asarray(gamma), bn_offset=jnp.asarray(beta),
            bn_mean=jnp.asarray(mean), bn_var=jnp.asarray(var),
        )

    sharded = sharded_conv3x3_rows(block, mesh)
    got = np.asarray(sharded(jnp.asarray(x)))
    expected = np.asarray(block(jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-4)


def test_dp_fused_chain_step_matches_single_device(rng_np):
    """VERDICT r2 item 2: the fused Pallas training chains compose with the
    mesh.  A shard_map-wrapped use_pallas train step (batch on 'data',
    bn_axis_name threaded into the chain's psums) must reproduce the
    single-device fused step's numerics — full forward + backward + AdamW,
    not just one block."""
    cfg = Config().override(
        model__image_height=32, model__image_width=32,
        model__filters=(8, 16), model__dropout_rate=0.0,
        model__use_pallas=True, train__batch_size=8,
    )
    images = rng_np.rand(8, 32, 32, 3).astype(np.float32)
    masks = (rng_np.rand(8, 32, 32, 1) > 0.5).astype(np.float32)

    # single device, fused chains under plain jit
    model1 = build_unet(cfg.model)
    state1 = create_train_state(cfg, model=model1)
    step1 = make_train_step(model1, donate=False)
    new1, m1 = step1(state1, jnp.asarray(images), jnp.asarray(masks))

    # 4-way DP via shard_map (2 samples/shard)
    mesh = create_mesh(data=4, devices=jax.devices()[:4])
    model2 = build_unet(cfg.model, bn_axis_name="data")
    state2 = jax.device_put(
        create_train_state(cfg, model=model2), replicated(mesh)
    )
    sharding = batch_sharding(mesh)
    step2 = make_train_step(model2, donate=False, mesh=mesh)
    new2, m2 = step2(
        state2,
        jax.device_put(images, sharding),
        jax.device_put(masks, sharding),
    )

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m1["cm_thresh"]), np.asarray(m2["cm_thresh"]), rtol=0
    )
    # Post-AdamW params: for near-zero gradients Adam's m/sqrt(v)
    # normalization amplifies psum reduction-order noise to a visible
    # fraction of the lr=2e-3 update, so the bound is a fraction of lr —
    # a missing psum would diverge at full update scale across the tree.
    for a, b in zip(
        jax.tree_util.tree_leaves(new1.params),
        jax.tree_util.tree_leaves(new2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4e-4)
    # BN running stats must also match: the chain's moments psum globally.
    # (atol like the params: the psum's reduction order differs from the
    # single-device sum, and var = E[y^2]-E[y]^2 is cancellation-sensitive)
    for a, b in zip(
        jax.tree_util.tree_leaves(new1.batch_stats),
        jax.tree_util.tree_leaves(new2.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_dp_fused_chain_raw_grads_match_single_device(rng_np):
    """RAW gradients (pre-optimizer) of the shard_map fused-chain step must
    equal the single-device gradients per parameter.  The post-AdamW parity
    test above cannot catch per-parameter SCALE errors (Adam's m/sqrt(v) is
    scale-invariant per element) — this pins the exact convention: dgamma/
    dbeta are per-shard partials that the step's pmean aggregates, while
    the psum'd S/T reductions feed only the BN backward combine constants
    (the round-3 fix in _chain_bwd_links)."""
    from unet_image_segmentation_tpu.ops.losses import dice_loss

    cfg = Config().override(
        model__image_height=32, model__image_width=32,
        model__filters=(8,), model__dropout_rate=0.0,
        model__use_pallas=True, train__batch_size=8,
    )
    images = jnp.asarray(rng_np.rand(8, 32, 32, 3).astype(np.float32))
    masks = jnp.asarray(
        (rng_np.rand(8, 32, 32, 1) > 0.5).astype(np.float32)
    )

    m1 = build_unet(cfg.model)
    s1 = create_train_state(cfg, model=m1)
    bstats = s1.batch_stats

    def loss_single(params):
        preds, _ = m1.apply(
            {"params": params, "batch_stats": bstats},
            images, train=True, mutable=["batch_stats"],
        )
        return dice_loss(masks, preds)

    g1 = jax.grad(loss_single)(s1.params)

    mesh = create_mesh(data=4, devices=jax.devices()[:4])
    m2 = build_unet(cfg.model, bn_axis_name="data")

    def local_grads(params, imgs, msks):
        def lf(p):
            preds, _ = m2.apply(
                {"params": p, "batch_stats": bstats},
                imgs, train=True, mutable=["batch_stats"],
            )
            return dice_loss(msks, preds)

        return jax.lax.pmean(jax.grad(lf)(params), "data")

    from jax import shard_map

    g2 = jax.jit(
        shard_map(
            local_grads, mesh=mesh,
            in_specs=(P(), P("data"), P("data")),
            out_specs=P(),
            check_vma=False,
        )
    )(
        jax.device_put(s1.params, replicated(mesh)),
        jax.device_put(images, batch_sharding(mesh)),
        jax.device_put(masks, batch_sharding(mesh)),
    )

    flat2 = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g2)
    )
    for path, v in jax.tree_util.tree_leaves_with_path(g1):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(flat2[key]), np.asarray(v), rtol=1e-3, atol=1e-7,
            err_msg=key,
        )


def test_sharded_eval_step_matches_single_device(rng_np):
    """The shard_map eval step (Pallas inference kernels per-shard) equals
    the plain jit eval on the same state."""
    from unet_image_segmentation_tpu.train.steps import make_eval_step

    cfg = Config().override(
        model__image_height=32, model__image_width=32,
        model__filters=(8, 16), model__dropout_rate=0.0,
        model__use_pallas=True, train__batch_size=8,
    )
    images = rng_np.rand(8, 32, 32, 3).astype(np.float32)
    masks = (rng_np.rand(8, 32, 32, 1) > 0.5).astype(np.float32)

    model = build_unet(cfg.model)
    state = create_train_state(cfg, model=model)
    m1 = make_eval_step(model)(state, jnp.asarray(images), jnp.asarray(masks))

    mesh = create_mesh(data=4, devices=jax.devices()[:4])
    state2 = jax.device_put(state, replicated(mesh))
    sharding = batch_sharding(mesh)
    m2 = make_eval_step(model, mesh=mesh)(
        state2,
        jax.device_put(images, sharding),
        jax.device_put(masks, sharding),
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m1["cm_thresh"]), np.asarray(m2["cm_thresh"]), rtol=0
    )
