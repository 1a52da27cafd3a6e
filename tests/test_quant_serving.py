"""Int8-quantized serving graph: kernel exactness + trained mask parity.

The quantization contract (serving_quant.py): power-of-two scales fold
exactly into the float kernels' weights/affines, so with float32 compute
the quantized pair kernel's int8 output must EQUAL quantizing the float
kernel's output on pre-quantized inputs — the only error source is the
activation rounding itself.  The end-to-end gate compares masks from a
trained model (the reference's acceptance currency, cf. reference
``scripts/benchmark.py:277-279``).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_image_segmentation_tpu.ops.pallas.fused_sepconv import (
    fused_sepconv_pair,
)
from unet_image_segmentation_tpu.serving import build_serving_forward_chained
from unet_image_segmentation_tpu.serving_quant import (
    build_serving_forward_quant,
    calibrate_chained,
    dequantize,
    pow2_scale,
    quantize,
)


def _rand_block(rng, c, f, bn=True):
    blk = {
        "depthwise_kernel": jnp.asarray(
            rng.randn(3, 3, c, 1).astype(np.float32) * 0.3
        ),
        "pointwise_kernel": jnp.asarray(
            rng.randn(1, 1, c, f).astype(np.float32) * 0.3
        ),
    }
    if bn:
        blk.update(
            scale=jnp.asarray(rng.rand(f).astype(np.float32) + 0.5),
            offset=jnp.asarray(rng.randn(f).astype(np.float32) * 0.1),
            mean=jnp.asarray(rng.randn(f).astype(np.float32) * 0.1),
            var=jnp.asarray(rng.rand(f).astype(np.float32) + 0.5),
        )
    else:
        blk["bias"] = jnp.asarray(rng.randn(f).astype(np.float32) * 0.1)
    return blk


@pytest.mark.parametrize("bn", [True, False])
def test_pair_quant_exact_vs_float(rng_np, bn):
    """int8 pair == quantize(float pair) on pre-quantized input (f32)."""
    c = f1 = f2 = 64
    h = w = 16
    b1 = _rand_block(rng_np, c, f1, bn)
    b2 = _rand_block(rng_np, f1, f2, bn)
    s_in = 2.0 ** -7
    q = rng_np.randint(0, 128, size=(2, h, w, c)).astype(np.int8)
    xq = jnp.asarray(q)
    xf = dequantize(xq, s_in, jnp.float32)

    yf = fused_sepconv_pair(xf, b1, b2, out_packed=True, pool=True)
    assert yf is not None, "float pair fell back — test dims need fixing"
    zf, p, poolf = yf
    s_out = pow2_scale(float(jnp.max(zf)))

    yq = fused_sepconv_pair(
        xq, b1, b2, out_packed=True, pool=True,
        in_scale=s_in, out_scale=s_out, compute_dtype=jnp.float32,
    )
    assert yq is not None
    zq, pq, poolq = yq
    assert pq == p and zq.dtype == jnp.int8 and poolq.dtype == jnp.int8

    np.testing.assert_array_equal(np.asarray(zq), np.asarray(quantize(zf, s_out)))
    # pool commutes with (monotone) quantization
    np.testing.assert_array_equal(
        np.asarray(poolq), np.asarray(quantize(poolf, s_out))
    )


def test_two_stream_quant_exact(rng_np):
    """Decoder-style two-stream call: per-stream scales fold per-channel."""
    f = 64          # per-stream channels; concat c = 128
    h, w = 16, 16
    b1 = _rand_block(rng_np, 2 * f, f)
    b2 = _rand_block(rng_np, f, f)
    p = 2
    s_up, s_sk = 2.0 ** -6, 2.0 ** -7
    q_up = rng_np.randint(-127, 128, size=(2, h, w // p, p * f)).astype(np.int8)
    q_sk = rng_np.randint(0, 128, size=(2, h, w // p, p * f)).astype(np.int8)
    up_q, sk_q = jnp.asarray(q_up), jnp.asarray(q_sk)
    up_f = dequantize(up_q, s_up, jnp.float32)
    sk_f = dequantize(sk_q, s_sk, jnp.float32)

    zf = fused_sepconv_pair(up_f, b1, b2, in_packed=p, x2=sk_f)
    assert zf is not None, "float two-stream pair fell back"
    s_out = pow2_scale(float(jnp.max(zf)))

    zq = fused_sepconv_pair(
        up_q, b1, b2, in_packed=p, x2=sk_q,
        in_scale=(s_up, s_sk), out_scale=s_out, compute_dtype=jnp.float32,
    )
    assert zq is not None and zq.dtype == jnp.int8
    np.testing.assert_array_equal(
        np.asarray(zq),
        np.asarray(quantize(zf.reshape(zq.shape), s_out)),
    )


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Briefly-trained small model on synthetic document scenes."""
    from unet_image_segmentation_tpu.config import Config
    from unet_image_segmentation_tpu.data.loader import DirectoryDataset
    from unet_image_segmentation_tpu.data.synthetic import write_synthetic_dataset
    from unet_image_segmentation_tpu.train.loop import fit

    hw = 32
    tmp = tmp_path_factory.mktemp("quant")
    root = str(tmp / "ds")
    write_synthetic_dataset(root, n_train=64, n_val=8, image_size=(hw, hw))
    cfg = Config().override(
        model__image_height=hw, model__image_width=hw,
        model__filters=(16, 32), model__use_batch_norm=False,
        model__dropout_rate=0.0,
        data__root=root, data__num_workers=2, data__horizontal_flip=False,
        train__epochs=16, train__batch_size=8,
        train__model_out=str(tmp / "model"),
        train__log_dir=str(tmp / "logs"),
        train__early_stop_patience=1000, train__reduce_lr_patience=1000,
    )
    result = fit(cfg, verbose=False)
    variables = {"params": result.state.params}
    if result.state.batch_stats:
        variables["batch_stats"] = result.state.batch_stats

    ds = DirectoryDataset(
        frames_dir=os.path.join(root, "val_frames", "image"),
        masks_dir=os.path.join(root, "val_masks", "image"),
        image_size=(hw, hw), shuffle=False,
    )
    imgs, masks = zip(*[ds.load_sample(i) for i in range(len(ds))])
    return variables, np.stack(imgs), np.stack(masks)


def _iou(y_true, y_prob, thr=0.5):
    p = (y_prob > thr).astype(np.float32)
    t = (y_true > 0.5).astype(np.float32)
    inter = (p * t).sum()
    return float((inter + 1e-7) / (p.sum() + t.sum() - inter + 1e-7))


def test_quant_graph_trained_mask_parity(trained):
    """The acceptance gate: int8 graph's masks match the float graph's."""
    variables, xva, yva = trained
    kw = dict(num_classes=1, depth=2, compute_dtype=jnp.float32)
    xj = jnp.asarray(xva)
    forward_f = build_serving_forward_chained(variables, **kw)
    scales = calibrate_chained(variables, xj, **kw)
    forward_q = build_serving_forward_quant(variables, scales, **kw)

    pf = np.asarray(forward_f(xj))
    pq = np.asarray(forward_q(xj))

    agree = float(((pf > 0.5) == (pq > 0.5)).mean())
    iou_f, iou_q = _iou(yva, pf), _iou(yva, pq)
    print(f"mask agreement {agree:.4f}; IoU float {iou_f:.4f} int8 {iou_q:.4f}")
    assert agree >= 0.995, agree
    assert abs(iou_f - iou_q) <= 0.01, (iou_f, iou_q)


def test_quant_graph_multiclass(rng_np):
    """3-class (softmax head) int8 graph tracks the float graph closely."""
    from unet_image_segmentation_tpu.config import ModelConfig
    from unet_image_segmentation_tpu.models.unet import build_unet, init_unet

    hw = 32
    cfg = ModelConfig(
        image_height=hw, image_width=hw, filters=(16, 32),
        num_classes=3, dropout_rate=0.0,
    )
    model = build_unet(cfg)
    variables = init_unet(model, jax.random.PRNGKey(3), cfg.input_shape)
    kw = dict(num_classes=3, depth=2, compute_dtype=jnp.float32)
    x = jnp.asarray(rng_np.rand(2, hw, hw, 3).astype(np.float32))
    pf = np.asarray(build_serving_forward_chained(variables, **kw)(x))
    scales = calibrate_chained(variables, x, **kw)
    pq = np.asarray(build_serving_forward_quant(variables, scales, **kw)(x))
    assert pq.shape == pf.shape == (2, hw, hw, 3)
    np.testing.assert_allclose(pq.sum(-1), 1.0, atol=1e-3)  # softmax
    assert np.abs(pq - pf).max() < 5e-3, np.abs(pq - pf).max()


def test_streaming_quant_matches_float(trained, tmp_path):
    """StreamingPredictor picks up a pending int8 quantization lazily and
    its masks agree with the float streaming pipeline."""
    from unet_image_segmentation_tpu.inference import Predictor
    from unet_image_segmentation_tpu.streaming import StreamingPredictor
    from unet_image_segmentation_tpu.train.checkpoint import (
        save_inference_variables,
    )

    variables, xva, _ = trained
    ckpt = str(tmp_path / "m")
    save_inference_variables(
        ckpt,
        variables["params"],
        batch_stats=variables.get("batch_stats"),
        model_kwargs=dict(
            num_classes=1, filters=(16, 32), dropout_rate=0.0,
            use_batch_norm=False, conv_type="separable",
        ),
    )
    frames = (xva[:2, :, :, ::-1] * 255).astype(np.uint8)  # BGR uint8
    frames = np.concatenate([frames, frames], axis=1)      # 64x32 native

    def masks(quant):
        p = Predictor(
            ckpt, image_size=(32, 32), compute_dtype="float32",
            use_pallas=True, quantize="int8" if quant else None,
        )
        s = StreamingPredictor(
            p, frame_hw=frames.shape[1:3], batch_size=2, threshold=0.5,
        )
        if quant:
            assert s._quant_pending
        out = s(frames)
        if quant:
            assert not s._quant_pending and hasattr(s, "quant_scales")
        return out

    mf, mq = masks(False), masks(True)
    agree = float((mf == mq).mean())
    assert agree >= 0.995, agree


def test_quant_graph_p1_stage_no_pool_retry(rng_np):
    """128-aligned stages (p=1) can't fuse the pool (needs p>=2); the
    quant graph must retry the int8 pair WITHOUT the pool and max-pool
    the int8 tensor directly (monotone => exact), not round-trip through
    float."""
    from unet_image_segmentation_tpu.config import ModelConfig
    from unet_image_segmentation_tpu.models.unet import build_unet, init_unet

    hw = 16
    cfg = ModelConfig(
        image_height=hw, image_width=hw, filters=(128, 128),
        num_classes=1, dropout_rate=0.0,
    )
    model = build_unet(cfg)
    variables = init_unet(model, jax.random.PRNGKey(5), cfg.input_shape)
    kw = dict(num_classes=1, depth=2, compute_dtype=jnp.float32)
    x = jnp.asarray(rng_np.rand(1, hw, hw, 3).astype(np.float32))
    pf = np.asarray(build_serving_forward_chained(variables, **kw)(x))
    scales = calibrate_chained(variables, x, **kw)
    pq = np.asarray(build_serving_forward_quant(variables, scales, **kw)(x))
    assert np.abs(pq - pf).max() < 5e-3, np.abs(pq - pf).max()


def test_sharded_quant_matches_single_device(rng_np):
    """Spatially-sharded int8 graph (int8 halos over the mesh) equals the
    single-device run of the same graph, and tracks the float sharded
    graph within quantization error."""
    from unet_image_segmentation_tpu.config import ModelConfig
    from unet_image_segmentation_tpu.models.unet import build_unet, init_unet
    from unet_image_segmentation_tpu.parallel.mesh import create_mesh
    from unet_image_segmentation_tpu.serving import (
        build_serving_forward_sharded,
    )
    from unet_image_segmentation_tpu.serving_quant import (
        build_serving_forward_sharded_quant,
    )

    hw = 64
    cfg = ModelConfig(
        image_height=hw, image_width=hw, filters=(8, 16), dropout_rate=0.0
    )
    model = build_unet(cfg)
    variables = init_unet(model, jax.random.PRNGKey(2), cfg.input_shape)
    kw = dict(num_classes=1, depth=2, compute_dtype=jnp.float32)
    x = jnp.asarray(rng_np.rand(4, hw, hw, 3).astype(np.float32))
    scales = calibrate_chained(variables, x, **kw)

    mesh = create_mesh(data=2, spatial=4)
    mesh1 = create_mesh(data=1, spatial=1)
    got = np.asarray(
        build_serving_forward_sharded_quant(variables, scales, mesh, **kw)(x)
    )
    want = np.asarray(
        build_serving_forward_sharded_quant(variables, scales, mesh1, **kw)(x)
    )
    # XLA may reassociate f32 math differently between the two programs;
    # a value sitting exactly on a rounding tie can then flip one int8
    # quantum.  Allow a <=0.1% tail of single-quantum flips.
    diff = np.abs(got - want)
    assert float((diff > 1e-5).mean()) <= 1e-3, float((diff > 1e-5).mean())
    assert diff.max() < 5e-3, diff.max()

    ref = np.asarray(
        build_serving_forward_sharded(variables, mesh, **kw)(x)
    )
    assert np.abs(got - ref).max() < 5e-3, np.abs(got - ref).max()
