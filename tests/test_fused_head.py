"""Fused segmentation head (ops/pallas/fused_head.py): the final decoder
chain + 1x1-conv/sigmoid head + dice-loss/metric reductions as one Pallas
kernel pair, vs the composed-XLA oracle (interpret mode on CPU).

The reference's head is ``Conv2D(1x1) -> sigmoid`` (model/u_net.py:103-106)
followed by the dice loss (utils/loss.py:9-29) and Keras MeanIoU metrics
(scripts/train.py:231-239); these tests pin that the fused path reproduces
the composed numerics — sums, BN stats, every gradient, the full train
step, and the shard_map DP composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_image_segmentation_tpu.config import Config
from unet_image_segmentation_tpu.models.unet import build_unet
from unet_image_segmentation_tpu.ops import conv as conv_ops
from unet_image_segmentation_tpu.ops.losses import dice_loss, loss_from_sums
from unet_image_segmentation_tpu.ops.pallas import fused_head as fh
from unet_image_segmentation_tpu.ops.pallas import fused_train as ft
from unet_image_segmentation_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated,
)
from unet_image_segmentation_tpu.train.state import create_train_state
from unet_image_segmentation_tpu.train.steps import make_train_step

SMOOTH = 1e-7


def _chain_fixture(rng, c0=32, f=64, n=2):
    blocks = []
    c = c0
    for _ in range(n):
        dw = (rng.randn(3, 3, c, 1) * 0.3).astype(np.float32)
        pw = (rng.randn(1, 1, c, f) * 0.1).astype(np.float32)
        gamma = (rng.rand(f) + 0.5).astype(np.float32)
        beta = rng.randn(f).astype(np.float32)
        blocks.append(tuple(map(jnp.asarray, (dw, pw, gamma, beta))))
        c = f
    return blocks


def _oracle_sums(x, t, blocks, w_head, b_head):
    """Composed XLA: chain_reference -> 1x1 conv -> sigmoid -> reductions."""
    z, stats = ft.chain_reference(
        x,
        [
            (d.reshape(3, 3, -1), p.reshape(p.shape[-2], p.shape[-1]), g, b)
            for (d, p, g, b) in blocks
        ],
    )
    logits = conv_ops.pointwise_conv2d(z, w_head, b_head).astype(jnp.float32)
    return fh.head_sums_reference(jax.nn.sigmoid(logits), t), stats


def test_fused_head_matches_oracle_and_grads(rng_np):
    B, H, W, C0, F = 2, 16, 64, 32, 64  # chain [32->64->64], w=64 -> p=2
    blocks = _chain_fixture(rng_np, C0, F)
    w_head = jnp.asarray((rng_np.randn(1, 1, F, 1) * 0.2).astype(np.float32))
    b_head = jnp.asarray(rng_np.randn(1).astype(np.float32))
    x = jnp.asarray(rng_np.rand(B, H, W, C0).astype(np.float32))
    t = jnp.asarray((rng_np.rand(B, H, W, 1) > 0.5).astype(np.float32))

    def loss_oracle(params):
        blks, wh, bh = params
        sums, stats = _oracle_sums(x, t, blks, wh, bh)
        return loss_from_sums("dice", sums), (sums, stats)

    def loss_fused(params):
        blks, wh, bh = params
        out = fh.fused_head_train(x, blks, wh, bh, t)
        assert out is not None, "fused head should be feasible here"
        sums, stats = out
        return loss_from_sums("dice", sums), (sums, stats)

    params = (blocks, w_head, b_head)
    (l1, (s1, st1)), g1 = jax.value_and_grad(loss_oracle, has_aux=True)(params)
    (l2, (s2, st2)), g2 = jax.value_and_grad(loss_fused, has_aux=True)(params)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for k in fh.SUM_KEYS:
        np.testing.assert_allclose(
            np.asarray(s1[k]), np.asarray(s2[k]), rtol=1e-5, err_msg=k
        )
    for (m1, v1), (m2, v2) in zip(st1, st2):
        np.testing.assert_allclose(
            np.asarray(m1), np.asarray(m2), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=1e-3, atol=1e-5
        )
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        )


def test_fused_head_iou_loss(rng_np):
    """The IoU/Jaccard family shares the sums; only the combine differs."""
    B, H, W, C0, F = 1, 8, 32, 16, 32  # p = 4
    blocks = _chain_fixture(rng_np, C0, F)
    w_head = jnp.asarray((rng_np.randn(1, 1, F, 1) * 0.2).astype(np.float32))
    b_head = jnp.asarray(rng_np.randn(1).astype(np.float32))
    x = jnp.asarray(rng_np.rand(B, H, W, C0).astype(np.float32))
    t = jnp.asarray((rng_np.rand(B, H, W, 1) > 0.5).astype(np.float32))

    s_o, _ = _oracle_sums(x, t, blocks, w_head, b_head)
    out = fh.fused_head_train(x, blocks, w_head, b_head, t)
    assert out is not None
    s_f, _ = out
    np.testing.assert_allclose(
        float(loss_from_sums("iou", s_o)),
        float(loss_from_sums("iou", s_f)),
        rtol=1e-6,
    )


def test_fused_head_bf16_rounding_point(rng_np):
    """bf16 models: the kernel's logit rounding must sit exactly where the
    XLA head rounds (conv output cast + same-dtype bias add)."""
    B, H, W, C0, F = 1, 8, 64, 32, 64
    blocks = [
        tuple(jnp.asarray(a) for a in blk) for blk in _chain_fixture(rng_np, C0, F)
    ]
    w_head = jnp.asarray((rng_np.randn(1, 1, F, 1) * 0.2).astype(np.float32))
    b_head = jnp.asarray(rng_np.randn(1).astype(np.float32))
    x = jnp.asarray(rng_np.rand(B, H, W, C0), jnp.bfloat16)
    t = jnp.asarray((rng_np.rand(B, H, W, 1) > 0.5).astype(np.float32))

    # oracle with the same dtype discipline as models/unet.py
    z, _ = ft.chain_reference(
        x,
        [
            (d.reshape(3, 3, -1), p.reshape(p.shape[-2], p.shape[-1]), g, b)
            for (d, p, g, b) in blocks
        ],
    )
    logits = conv_ops.pointwise_conv2d(z, w_head, b_head).astype(jnp.float32)
    s_o = fh.head_sums_reference(jax.nn.sigmoid(logits), t)

    out = fh.fused_head_train(x, blocks, w_head, b_head, t)
    assert out is not None
    s_f, _ = out
    for k in ("i", "p", "t"):
        np.testing.assert_allclose(
            np.asarray(s_o[k]), np.asarray(s_f[k]), rtol=2e-3, err_msg=k
        )


def test_many_class_head_returns_none(rng_np):
    """num_classes > MAX_MC_CLASSES is out of the fused head's contract
    (the multiclass panel holds 3C + 1 + C^2 <= 32 rows)."""
    blocks = _chain_fixture(rng_np, 16, 32)
    nc = fh.MAX_MC_CLASSES + 1
    w_head = jnp.asarray(np.zeros((1, 1, 32, nc), np.float32))
    b_head = jnp.asarray(np.zeros(nc, np.float32))
    x = jnp.asarray(rng_np.rand(1, 8, 32, 16).astype(np.float32))
    t = jnp.asarray(
        rng_np.randint(0, nc, size=(1, 8, 32, 1)).astype(np.float32)
    )
    assert fh.fused_head_train(x, blocks, w_head, b_head, t) is None


def test_default_policy_keeps_multiclass_on_xla_sums_head(rng_np, monkeypatch):
    """ModelConfig.fused_head == 'auto' (the default) engages the head
    kernel for the sigmoid head only: a 3-class Pallas model must compute
    its sums via the XLA reference head (the softmax kernel measured
    slower than the XLA sums head at 512px — DESIGN.md adjudication)."""
    calls = []
    real = fh.fused_head_train
    monkeypatch.setattr(
        fh, "fused_head_train", lambda *a, **k: calls.append(1) or real(*a, **k)
    )
    _, model, state = _step_fixture(
        rng_np, use_pallas=True, model__num_classes=3, train__loss="cce"
    )
    assert model.fused_head == "auto"
    images = jnp.asarray(rng_np.rand(2, 32, 32, 3).astype(np.float32))
    masks = jnp.asarray(
        rng_np.randint(0, 3, size=(2, 32, 32, 1)).astype(np.float32)
    )
    _, metrics = make_train_step(model, "cce", donate=False)(
        state, images, masks
    )
    assert not calls, "softmax head kernel engaged under the 'auto' policy"
    assert np.isfinite(float(metrics["loss"]))


# ---------------------------------------------------------------------------
# Multiclass (softmax + CCE + argmax CM) head
# ---------------------------------------------------------------------------


def _oracle_sums_mc(x, t, blocks, w_head, b_head, nc):
    """Composed XLA: chain_reference -> 1x1 conv -> softmax -> reductions."""
    z, stats = ft.chain_reference(
        x,
        [
            (d.reshape(3, 3, -1), p.reshape(p.shape[-2], p.shape[-1]), g, b)
            for (d, p, g, b) in blocks
        ],
    )
    logits = conv_ops.pointwise_conv2d(z, w_head, b_head).astype(jnp.float32)
    preds = jax.nn.softmax(logits, axis=-1)
    return fh.head_sums_reference_mc(preds, t, nc), stats


MC_KEYS = ("i", "p", "t", "cce", "cm")


def test_fused_head_multiclass_matches_oracle_and_grads(rng_np):
    """Softmax head (3 classes): the fused kernel pair reproduces the
    composed per-class dice sums, the clipped CCE sum, the argmax
    confusion matrix, the BN stats and every gradient of the CCE loss."""
    B, H, W, C0, F, NC = 2, 16, 64, 32, 64, 3  # w=64 -> p=2
    blocks = _chain_fixture(rng_np, C0, F)
    w_head = jnp.asarray((rng_np.randn(1, 1, F, NC) * 0.2).astype(np.float32))
    b_head = jnp.asarray(rng_np.randn(NC).astype(np.float32))
    x = jnp.asarray(rng_np.rand(B, H, W, C0).astype(np.float32))
    t = jnp.asarray(
        rng_np.randint(0, NC, size=(B, H, W, 1)).astype(np.float32)
    )

    def loss_oracle(params):
        blks, wh, bh = params
        sums, stats = _oracle_sums_mc(x, t, blks, wh, bh, NC)
        return loss_from_sums("cce", sums), (sums, stats)

    def loss_fused(params):
        blks, wh, bh = params
        out = fh.fused_head_train(x, blks, wh, bh, t)
        assert out is not None, "multiclass fused head should be feasible"
        sums, stats = out
        return loss_from_sums("cce", sums), (sums, stats)

    params = (blocks, w_head, b_head)
    (l1, (s1, st1)), g1 = jax.value_and_grad(loss_oracle, has_aux=True)(params)
    (l2, (s2, st2)), g2 = jax.value_and_grad(loss_fused, has_aux=True)(params)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for k in MC_KEYS:
        np.testing.assert_allclose(
            np.asarray(s1[k]), np.asarray(s2[k]), rtol=1e-5, atol=1e-4,
            err_msg=k,
        )
    # CM counts are integers — exact
    np.testing.assert_array_equal(np.asarray(s1["cm"]), np.asarray(s2["cm"]))
    for (m1, v1), (m2, v2) in zip(st1, st2):
        np.testing.assert_allclose(
            np.asarray(m1), np.asarray(m2), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=1e-3, atol=1e-5
        )
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        scale = max(float(np.max(np.abs(np.asarray(b)))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5 * scale
        )


def test_fused_head_multiclass_dice_loss(rng_np):
    """The dice family also rides the multiclass sums (per-class (B, C)
    coefficients, mean over batch x classes), including its gradients."""
    B, H, W, C0, F, NC = 1, 8, 32, 16, 32, 4  # p = 4, C = MAX
    blocks = _chain_fixture(rng_np, C0, F)
    w_head = jnp.asarray((rng_np.randn(1, 1, F, NC) * 0.2).astype(np.float32))
    b_head = jnp.asarray(rng_np.randn(NC).astype(np.float32))
    x = jnp.asarray(rng_np.rand(B, H, W, C0).astype(np.float32))
    t = jnp.asarray(
        rng_np.randint(0, NC, size=(B, H, W, 1)).astype(np.float32)
    )

    def loss_oracle(params):
        blks, wh, bh = params
        sums, _ = _oracle_sums_mc(x, t, blks, wh, bh, NC)
        return loss_from_sums("dice", sums)

    def loss_fused(params):
        blks, wh, bh = params
        out = fh.fused_head_train(x, blks, wh, bh, t)
        assert out is not None
        sums, _ = out
        return loss_from_sums("dice", sums)

    params = (blocks, w_head, b_head)
    l1, g1 = jax.value_and_grad(loss_oracle)(params)
    l2, g2 = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        scale = max(float(np.max(np.abs(np.asarray(b)))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5 * scale
        )


def test_multiclass_cce_from_sums_matches_composed_loss(rng_np):
    """loss_from_sums('cce', ...) == categorical_ce_loss on one-hot
    targets (pixel-mean Keras semantics)."""
    from unet_image_segmentation_tpu.ops.losses import categorical_ce_loss

    NC = 3
    logits = jnp.asarray(rng_np.randn(2, 8, 8, NC).astype(np.float32))
    preds = jax.nn.softmax(logits, axis=-1)
    tid = jnp.asarray(
        rng_np.randint(0, NC, size=(2, 8, 8, 1)).astype(np.float32)
    )
    one_hot = jax.nn.one_hot(tid[..., 0].astype(jnp.int32), NC)
    sums = fh.head_sums_reference_mc(preds, tid, NC)
    np.testing.assert_allclose(
        float(loss_from_sums("cce", sums)),
        float(categorical_ce_loss(one_hot, preds)),
        rtol=1e-6,
    )


def test_multiclass_train_step_matches_xla_step(rng_np):
    """The full multiclass fused-head train step (softmax + CCE + argmax
    CM) reproduces the composed XLA step: loss, dice, confusion matrix,
    post-update params and BN running stats."""
    images = rng_np.rand(2, 32, 32, 3).astype(np.float32)
    masks = rng_np.randint(0, 3, size=(2, 32, 32, 1)).astype(np.float32)

    # the softmax kernel is opt-in ('auto' keeps multiclass on the XLA
    # sums head — measured faster at 512px); this test pins the kernel
    over = dict(model__num_classes=3, train__loss="cce")
    _, m_x, s_x = _step_fixture(rng_np, use_pallas=False, **over)
    _, m_p, s_p = _step_fixture(
        rng_np, use_pallas=True, model__fused_head="all", **over
    )
    n_x, met_x = make_train_step(m_x, "cce", donate=False)(
        s_x, jnp.asarray(images), jnp.asarray(masks)
    )
    n_p, met_p = make_train_step(m_p, "cce", donate=False)(
        s_p, jnp.asarray(images), jnp.asarray(masks)
    )

    np.testing.assert_allclose(
        float(met_x["loss"]), float(met_p["loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(met_x["dice"]), float(met_p["dice"]), rtol=1e-4
    )
    for key in ("cm_thresh", "cm_raw"):
        np.testing.assert_allclose(
            np.asarray(met_x[key]), np.asarray(met_p[key]), atol=0.5,
            err_msg=key,
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(n_x.params),
        jax.tree_util.tree_leaves(n_p.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(n_x.batch_stats),
        jax.tree_util.tree_leaves(n_p.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def _step_fixture(rng, use_pallas, **over):
    base = dict(
        model__image_height=32, model__image_width=32, model__filters=(8, 16),
        model__dropout_rate=0.0, train__batch_size=2,
    )
    base.update(over)
    cfg = Config().override(model__use_pallas=use_pallas, **base)
    model = build_unet(cfg.model)
    state = create_train_state(cfg, model=model)
    return cfg, model, state


def test_train_step_head_sums_matches_xla_step(rng_np):
    """The full fused-head train step (forward + backward + AdamW + metric
    bundle) reproduces the XLA step: loss, dice, both confusion matrices,
    post-update params, and BN running stats."""
    images = rng_np.rand(2, 32, 32, 3).astype(np.float32)
    masks = (rng_np.rand(2, 32, 32, 1) > 0.5).astype(np.float32)

    _, m_x, s_x = _step_fixture(rng_np, use_pallas=False)
    _, m_p, s_p = _step_fixture(rng_np, use_pallas=True)
    n_x, met_x = make_train_step(m_x, donate=False)(
        s_x, jnp.asarray(images), jnp.asarray(masks)
    )
    n_p, met_p = make_train_step(m_p, donate=False)(
        s_p, jnp.asarray(images), jnp.asarray(masks)
    )

    np.testing.assert_allclose(
        float(met_x["loss"]), float(met_p["loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(met_x["dice"]), float(met_p["dice"]), rtol=1e-4
    )
    for key in ("cm_thresh", "cm_raw"):
        np.testing.assert_allclose(
            np.asarray(met_x[key]), np.asarray(met_p[key]), atol=0.5,
            err_msg=key,
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(n_x.params),
        jax.tree_util.tree_leaves(n_p.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(n_x.batch_stats),
        jax.tree_util.tree_leaves(n_p.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_dp_head_sums_step_matches_single_device(rng_np):
    """Fused head x the mesh: the shard_map DP step with head sums equals
    the single-device fused-head step (psum'd BN boundary, pmean'd grads)."""
    images = rng_np.rand(8, 32, 32, 3).astype(np.float32)
    masks = (rng_np.rand(8, 32, 32, 1) > 0.5).astype(np.float32)
    cfg = Config().override(
        model__image_height=32, model__image_width=32,
        model__filters=(8, 16), model__dropout_rate=0.0,
        model__use_pallas=True, train__batch_size=8,
    )

    model1 = build_unet(cfg.model)
    state1 = create_train_state(cfg, model=model1)
    new1, m1 = make_train_step(model1, donate=False)(
        state1, jnp.asarray(images), jnp.asarray(masks)
    )

    mesh = create_mesh(data=4, devices=jax.devices()[:4])
    model2 = build_unet(cfg.model, bn_axis_name="data")
    state2 = jax.device_put(
        create_train_state(cfg, model=model2), replicated(mesh)
    )
    sharding = batch_sharding(mesh)
    new2, m2 = make_train_step(model2, donate=False, mesh=mesh)(
        state2,
        jax.device_put(images, sharding),
        jax.device_put(masks, sharding),
    )

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m1["cm_thresh"]), np.asarray(m2["cm_thresh"]), rtol=0
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new1.params),
        jax.tree_util.tree_leaves(new2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=4e-4)


def test_head_sums_contract_on_xla_path(rng_np):
    """head_targets on a non-Pallas model returns the same sums dict,
    computed from materialized probabilities — contract is path-invariant."""
    cfg, model, state = _step_fixture(rng_np, use_pallas=False)
    images = jnp.asarray(rng_np.rand(2, 32, 32, 3).astype(np.float32))
    masks = jnp.asarray((rng_np.rand(2, 32, 32, 1) > 0.5).astype(np.float32))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    preds, _ = model.apply(
        variables, images, train=True, mutable=["batch_stats"]
    )
    sums, _ = model.apply(
        variables, images, train=True, mutable=["batch_stats"],
        head_targets=masks,
    )
    ref = fh.head_sums_reference(preds, masks)
    for k in fh.SUM_KEYS:
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(sums[k]), rtol=1e-6, err_msg=k
        )
    np.testing.assert_allclose(
        float(dice_loss(masks, preds)),
        float(loss_from_sums("dice", sums)),
        rtol=1e-6,
    )


def test_infeasible_head_pack_falls_back_without_crash(rng_np):
    """Shapes where no pack makes the head kernels feasible (e.g. tiny
    filters on a tiny width) must fall through to the composed XLA head —
    previously the head Conv was declared before feasibility was known and
    the composed tail re-declared 'output_mask' (Flax NameInUseError)."""
    from unet_image_segmentation_tpu.models.unet import UNet

    m = UNet(
        num_classes=1, filters=(8, 16), use_pallas=True,
        dropout_rate=0.0, dtype=jnp.float32,
    )
    x = jnp.asarray(rng_np.rand(2, 8, 8, 3).astype(np.float32))
    t = jnp.asarray((rng_np.rand(2, 8, 8, 1) > 0.5).astype(np.float32))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    sums, _ = m.apply(
        v, x, train=True, head_targets=t, mutable=["batch_stats"]
    )
    preds, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    ref = fh.head_sums_reference(preds, t)
    for k in fh.SUM_KEYS:
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(sums[k]), rtol=1e-6, err_msg=k
        )


def test_soft_targets_binarized_identically_on_both_paths(rng_np):
    """Antialiased/soft masks (e.g. a resized 0.8) binarize via the same
    > 0.5 threshold in expand_targets AND head_sums_reference — a plain
    int8 cast silently floored them to zero on the fused path only."""
    B, H, W, C0, F = 2, 16, 64, 32, 64
    blocks = _chain_fixture(rng_np, C0, F)
    w_head = jnp.asarray(rng_np.randn(1, 1, F, 1).astype(np.float32) * 0.3)
    b_head = jnp.asarray(np.zeros(1, np.float32))
    x = jnp.asarray(rng_np.rand(B, H, W, C0).astype(np.float32))
    t_soft = jnp.asarray(rng_np.rand(B, H, W, 1).astype(np.float32))

    # expand_targets must agree with the reference threshold, not floor
    p = 2
    t_exp = fh.expand_targets(t_soft, p)
    manual = (np.asarray(t_soft)[..., 0] > 0.5).astype(np.int8)
    np.testing.assert_array_equal(
        np.asarray(t_exp).reshape(B, H, W // p, -1)[..., :p].reshape(B, H, W),
        manual,
    )

    out = fh.fused_head_train(x, blocks, w_head, b_head, t_soft)
    assert out is not None
    sums, _ = out
    ref, _ = _oracle_sums(x, t_soft, blocks, w_head, b_head)
    for k in fh.SUM_KEYS:
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(sums[k]), rtol=1e-5, err_msg=k
        )
    # soft targets must NOT collapse to zero
    assert float(jnp.sum(sums["t"])) > 0.0
