"""Pallas-path U-Net vs XLA-path U-Net: identical variables => identical
outputs, batch-stat updates, and gradients (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_image_segmentation_tpu.config import ModelConfig
from unet_image_segmentation_tpu.models.unet import build_unet, init_unet
from unet_image_segmentation_tpu.ops.losses import dice_loss

HW = 32


def _models():
    base = dict(image_height=HW, image_width=HW, filters=(8, 16), dropout_rate=0.0)
    cfg_x = ModelConfig(**base)
    cfg_p = ModelConfig(use_pallas=True, **base)
    m_x, m_p = build_unet(cfg_x), build_unet(cfg_p)
    variables = init_unet(m_x, jax.random.PRNGKey(0), cfg_x.input_shape)
    return m_x, m_p, variables


def test_variable_trees_identical():
    m_x, m_p, variables = _models()
    v_p = init_unet(m_p, jax.random.PRNGKey(0), (HW, HW, 3))
    paths_x = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(variables)
    }
    paths_p = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(v_p)
    }
    assert paths_x == paths_p


def test_eval_forward_parity():
    m_x, m_p, variables = _models()
    x = jnp.asarray(np.random.RandomState(1).rand(2, HW, HW, 3), jnp.float32)
    y_x = np.asarray(m_x.apply(variables, x, train=False))
    y_p = np.asarray(m_p.apply(variables, x, train=False))
    np.testing.assert_allclose(y_p, y_x, atol=1e-4, rtol=1e-4)


def test_train_forward_and_batch_stats_parity():
    m_x, m_p, variables = _models()
    x = jnp.asarray(np.random.RandomState(2).rand(2, HW, HW, 3), jnp.float32)
    y_x, mut_x = m_x.apply(variables, x, train=True, mutable=["batch_stats"])
    y_p, mut_p = m_p.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=1e-4, rtol=1e-4)
    flat_x = jax.tree_util.tree_leaves_with_path(mut_x["batch_stats"])
    flat_p = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(mut_p["batch_stats"])
    )
    for path, v in flat_x:
        np.testing.assert_allclose(
            np.asarray(flat_p[jax.tree_util.keystr(path)]),
            np.asarray(v),
            atol=1e-4,
            rtol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_gradient_parity():
    m_x, m_p, variables = _models()
    x = jnp.asarray(np.random.RandomState(3).rand(2, HW, HW, 3), jnp.float32)
    masks = jnp.asarray(
        (np.random.RandomState(4).rand(2, HW, HW, 1) > 0.5), jnp.float32
    )

    def loss(model):
        def fn(params):
            preds, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return dice_loss(masks, preds)
        return fn

    g_x = jax.grad(loss(m_x))(variables["params"])
    g_p = jax.grad(loss(m_p))(variables["params"])
    flat_p = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g_p)
    )
    for path, v in jax.tree_util.tree_leaves_with_path(g_x):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(flat_p[key]), np.asarray(v), atol=5e-4, rtol=5e-3,
            err_msg=key,
        )


def test_default_width_regime_parity():
    """The reference's default 64-wide filter ladder exercises DIFFERENT
    kernel paths than the small test widths: pack-8 stage-1 chain whose
    pooled output repacks to a non-p//2 factor, pack-2 chains, pack-1
    (unpacked) chains with the fused p1 pool tail, and the packed decoder
    feed at p_dec == 2.  Pin train forward + batch stats + gradients
    against the XLA model in that regime at a small spatial size."""
    hw = 16
    base = dict(image_height=hw, image_width=hw, filters=(64, 128), dropout_rate=0.0)
    m_x = build_unet(ModelConfig(**base))
    m_p = build_unet(ModelConfig(use_pallas=True, **base))
    variables = init_unet(m_x, jax.random.PRNGKey(0), (hw, hw, 3))
    x = jnp.asarray(np.random.RandomState(5).rand(2, hw, hw, 3), jnp.float32)
    y_x, mut_x = m_x.apply(variables, x, train=True, mutable=["batch_stats"])
    y_p, mut_p = m_p.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=1e-4, rtol=1e-4)
    flat_p = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(mut_p["batch_stats"])
    )
    for path, v in jax.tree_util.tree_leaves_with_path(mut_x["batch_stats"]):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(flat_p[key]), np.asarray(v), atol=1e-4, rtol=1e-3,
            err_msg=key,
        )

    masks = jnp.asarray(
        (np.random.RandomState(6).rand(2, hw, hw, 1) > 0.5), jnp.float32
    )

    def loss(model):
        def fn(params):
            preds, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return dice_loss(masks, preds)
        return fn

    g_x = jax.grad(loss(m_x))(variables["params"])
    g_p = jax.grad(loss(m_p))(variables["params"])
    flat_g = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g_p)
    )
    for path, v in jax.tree_util.tree_leaves_with_path(g_x):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(flat_g[key]), np.asarray(v), atol=5e-4, rtol=5e-3,
            err_msg=key,
        )


def test_dropout_on_train_parity_hash_impl():
    """With dropout ON and ``dropout_impl='hash'``, the Pallas chains and
    the XLA model draw the SAME stateless position-hash masks (same
    'dropout' rng => same per-site seeds => bit-identical keep decisions,
    ops/hash_dropout.py), so whole-model train forward AND gradients stay
    pinned — the parity story for fusing the reference's decoder-concat
    Dropout (model/u_net.py:75-99) into the chain kernels."""
    hw = 16
    base = dict(
        image_height=hw, image_width=hw, filters=(64, 128), dropout_rate=0.2
    )
    m_x = build_unet(ModelConfig(dropout_impl="hash", **base))
    m_p = build_unet(ModelConfig(use_pallas=True, **base))  # auto -> hash
    variables = init_unet(m_x, jax.random.PRNGKey(0), (hw, hw, 3))
    x = jnp.asarray(np.random.RandomState(7).rand(2, hw, hw, 3), jnp.float32)
    rngs = {"dropout": jax.random.PRNGKey(42)}
    y_x, _ = m_x.apply(
        variables, x, train=True, mutable=["batch_stats"], rngs=rngs
    )
    y_p, _ = m_p.apply(
        variables, x, train=True, mutable=["batch_stats"], rngs=rngs
    )
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=1e-4, rtol=1e-4)
    # a different dropout key must change the output (dropout is live)
    y_p2, _ = m_p.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(43)},
    )
    assert float(jnp.max(jnp.abs(y_p2 - y_p))) > 1e-5

    masks = jnp.asarray(
        (np.random.RandomState(8).rand(2, hw, hw, 1) > 0.5), jnp.float32
    )

    def loss(model):
        def fn(params):
            preds, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"], rngs=rngs,
            )
            return dice_loss(masks, preds)
        return fn

    g_x = jax.grad(loss(m_x))(variables["params"])
    g_p = jax.grad(loss(m_p))(variables["params"])
    flat_g = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g_p)
    )
    for path, v in jax.tree_util.tree_leaves_with_path(g_x):
        key = jax.tree_util.keystr(path)
        scale = max(1e-3, float(jnp.max(jnp.abs(v))))
        np.testing.assert_allclose(
            np.asarray(flat_g[key]), np.asarray(v),
            atol=5e-3 * scale, rtol=5e-3, err_msg=key,
        )
