"""Experimental int8-quantized chained serving graph.

The chained serving graph (:mod:`.serving`) is HBM-bandwidth-bound: its
pair kernels run close to their DMA floors, so the remaining lever is
shrinking the bytes themselves.  This module runs the SAME hand-scheduled
graph with every inter-kernel activation stored as **int8**:

* weights, BN affines and all in-VMEM compute stay bf16/f32 — this is
  I/O quantization, not low-precision arithmetic (the MXU is not the
  bottleneck here; accuracy stays close to the float graph);
* every tensor that crosses HBM between kernels (stage outputs, skips,
  pooled tensors, decoder upsamples) is stored as ``q = round(x / s)``
  with a per-tensor **power-of-two** scale ``s`` from a one-batch
  calibration pass.  Power-of-two scales fold exactly (float exponent
  shifts) into the adjacent linear ops — the input scale into the next
  block's depthwise taps, ``1/s_out`` into the producing block's BN
  affine, the decoder input scale into the transpose-conv kernel — so
  the kernels gain only a round+clip on the output write and the
  quantization error is exactly the rounding of the activations, nothing
  else.
* quantization is monotone, so the fused 2x2 max pools commute with it:
  the pooled stream is bit-consistent with quantizing the float pool.

Accuracy contract: post-ReLU activations use int8's positive range
(0..127, ~7 bits); the head input is dequantized and the sigmoid/softmax
head runs fp32 as in the float graphs.  ``tests/test_quant_serving.py``
pins mask agreement and IoU delta against the float serving graph on a
trained model.

This scales the reference's inference capability
(``/root/reference/scripts/inference.py:112-125``) the way its own
commented-out int8 TFLite scaffold gestures at
(``convert_to_tflite.py:142-153``) — but on-device, with the fused
serving kernels.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from unet_image_segmentation_tpu.ops import conv as conv_ops
from unet_image_segmentation_tpu.ops.pallas.fused_sepconv import (
    _fold_affine,
    fused_sepconv_pair,
    pair_pack,
)
from unet_image_segmentation_tpu.serving import _block_dict, _pair


def quantize(x: jax.Array, scale: float) -> jax.Array:
    """Symmetric int8 quantization: ``q = clip(round(x / s), -127, 127)``."""
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) * (1.0 / scale)), -127.0, 127.0
    ).astype(jnp.int8)


def dequantize(q: jax.Array, scale: float, dtype=jnp.bfloat16) -> jax.Array:
    return q.astype(dtype) * jnp.asarray(scale, dtype)


def pow2_scale(max_abs: float) -> float:
    """Smallest power-of-two scale covering ``max_abs`` within int8.

    Power-of-two scales fold into bf16/f32 weights exactly (exponent
    shift), which keeps the quantized kernels bit-consistent with the
    float kernels fed pre-quantized inputs.
    """
    m = float(max_abs)
    if not math.isfinite(m) or m <= 0.0:
        return 1.0
    return 2.0 ** math.ceil(math.log2(m / 127.0))


def _xla_block(x, blk, eps=1e-3):
    """Composed-XLA sepconv+BN+ReLU block (calibration path: no kernels)."""
    c = x.shape[-1]
    f = blk["pointwise_kernel"].shape[-1]
    scale, shift = _fold_affine(
        blk.get("bias"), blk.get("scale"), blk.get("offset"),
        blk.get("mean"), blk.get("var"), f, eps,
    )
    y = conv_ops.depthwise_conv2d(
        x, blk["depthwise_kernel"].reshape(3, 3, c, 1).astype(x.dtype)
    )
    y = conv_ops.pointwise_conv2d(
        y, blk["pointwise_kernel"].reshape(1, 1, c, f).astype(x.dtype)
    )
    y = y.astype(jnp.float32) * scale + shift
    return jnp.maximum(y, 0.0).astype(x.dtype)


def calibrate_chained(
    variables: Dict[str, Any],
    sample: jax.Array,
    num_classes: int = 1,
    depth: int = 4,
    compute_dtype: Any = jnp.bfloat16,
) -> Dict[str, float]:
    """One-batch activation-range calibration for the quantized graph.

    Runs the float forward with composed XLA ops (cheap, no kernel
    compiles) over ``sample`` and returns the per-tensor power-of-two
    scales keyed as the quantized graph expects: ``input``,
    ``enc{1..depth}``, ``bneck``, ``dec{s}_up``/``dec{s}``.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def fwd(x):
        maxes = {"input": jnp.max(jnp.abs(x)).astype(jnp.float32)}
        x = x.astype(compute_dtype)
        skips = []
        for stage in range(1, depth + 1):
            x = _xla_block(x, _block_dict(params, stats, f"enc{stage}_block1"))
            x = _xla_block(x, _block_dict(params, stats, f"enc{stage}_block2"))
            maxes[f"enc{stage}"] = jnp.max(x).astype(jnp.float32)
            skips.append(x)
            x = conv_ops.max_pool_2x2(x)
        x = _xla_block(x, _block_dict(params, stats, "bneck_block1"))
        x = _xla_block(x, _block_dict(params, stats, "bneck_block2"))
        maxes["bneck"] = jnp.max(x).astype(jnp.float32)
        for i, stage in enumerate(range(depth, 0, -1)):
            up = params[f"dec{stage}_upsample"]
            x = conv_ops.conv_transpose_2x2(x, up["kernel"], up["bias"])
            maxes[f"dec{stage}_up"] = jnp.max(jnp.abs(x)).astype(jnp.float32)
            x = jnp.concatenate([x, skips[depth - 1 - i]], axis=-1)
            x = _xla_block(x, _block_dict(params, stats, f"dec{stage}_block1"))
            x = _xla_block(x, _block_dict(params, stats, f"dec{stage}_block2"))
            maxes[f"dec{stage}"] = jnp.max(x).astype(jnp.float32)
        return maxes

    maxes = jax.jit(fwd)(sample)
    return {k: pow2_scale(v) for k, v in maxes.items()}


def _quant_chained_forward(
    variables: Dict[str, Any],
    scales: Dict[str, float],
    num_classes: int,
    depth: int,
    compute_dtype: Any,
) -> Callable[[jax.Array], jax.Array]:
    """Quantized twin of ``serving._chained_forward`` (same control flow,
    int8 tensors + scale threading between the kernels)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def pw_f(name):
        return params[name]["sepconv"]["pointwise_kernel"].shape[-1]

    def forward(x: jax.Array) -> jax.Array:
        bsz, h, w = x.shape[0], x.shape[1], x.shape[2]
        s_cur = scales["input"]
        xq = quantize(x, s_cur)
        skips = []  # (z_q, pack, (h, w, f), scale)
        in_p = 1
        for stage in range(1, depth + 1):
            b1 = _block_dict(params, stats, f"enc{stage}_block1")
            b2 = _block_dict(params, stats, f"enc{stage}_block2")
            f2 = b2["pointwise_kernel"].shape[-1]
            s_out = scales[f"enc{stage}"]
            res = fused_sepconv_pair(
                xq,
                b1,
                b2,
                in_packed=in_p if in_p > 1 else None,
                out_packed=True,
                pool=True,
                in_scale=s_cur,
                out_scale=s_out,
                compute_dtype=compute_dtype,
            )
            if res is not None:
                z_p, p, pooled = res
                nxt = (
                    f"enc{stage + 1}_block1" if stage < depth else "bneck_block1"
                )
                nxt2 = (
                    f"enc{stage + 1}_block2" if stage < depth else "bneck_block2"
                )
                p2 = pair_pack(f2, pw_f(nxt), pw_f(nxt2), w // 2) or 1
                if p2 != p // 2:
                    pooled = pooled.reshape(bsz, h // 2, w // 2, f2).reshape(
                        bsz, h // 2, (w // 2) // p2, p2 * f2
                    )
                skips.append((z_p, p, (h, w, f2), s_out))
                xq, in_p = pooled, p2
            else:
                # pool-fused tile didn't fit (high-res stages): retry the
                # int8 pair WITHOUT the fused pool — quantization is
                # monotone, so a plain int8 2x2 max pool is exact
                z_q = fused_sepconv_pair(
                    xq,
                    b1,
                    b2,
                    in_packed=in_p if in_p > 1 else None,
                    in_scale=s_cur,
                    out_scale=s_out,
                    compute_dtype=compute_dtype,
                )
                if z_q is not None:
                    skips.append((z_q, 1, (h, w, f2), s_out))
                    xq = conv_ops.max_pool_2x2(z_q)
                    in_p = 1
                else:
                    # float fallback, re-quantized at the edges
                    xf = dequantize(xq, s_cur, compute_dtype)
                    if in_p > 1:
                        xf = xf.reshape(bsz, h, w, xf.shape[-1] // in_p)
                    z = _pair(xf, b1, b2)
                    skips.append((quantize(z, s_out), 1, (h, w, f2), s_out))
                    xq = quantize(conv_ops.max_pool_2x2(z), s_out)
                    in_p = 1
            s_cur = s_out
            h, w = h // 2, w // 2

        # --- bottleneck ---
        b1 = _block_dict(params, stats, "bneck_block1")
        b2 = _block_dict(params, stats, "bneck_block2")
        s_b = scales["bneck"]
        pb = pair_pack(
            xq.shape[-1] if in_p == 1 else xq.shape[-1] // in_p,
            b1["pointwise_kernel"].shape[-1],
            b2["pointwise_kernel"].shape[-1],
            w,
        )
        if in_p > 1 and pb != in_p:
            xq = xq.reshape(bsz, h, w, xq.shape[-1] // in_p)
            in_p = 1
        y = fused_sepconv_pair(
            xq,
            b1,
            b2,
            in_packed=in_p if in_p > 1 else None,
            in_scale=s_cur,
            out_scale=s_b,
            compute_dtype=compute_dtype,
        )
        if y is None:
            xf = dequantize(xq, s_cur, compute_dtype)
            if in_p > 1:
                xf = xf.reshape(bsz, h, w, xf.shape[-1] // in_p)
            y = quantize(_pair(xf, b1, b2), s_b)
        xq, s_cur = y, s_b

        # --- decoder ---
        for i, stage in enumerate(range(depth, 0, -1)):
            up = params[f"dec{stage}_upsample"]
            z_skip, p_skip, (sh, sw, sf), s_skip = skips[depth - 1 - i]
            f = up["kernel"].shape[2]
            b1 = _block_dict(params, stats, f"dec{stage}_block1")
            b2 = _block_dict(params, stats, f"dec{stage}_block2")
            s_up = scales[f"dec{stage}_up"]
            s_out = scales[f"dec{stage}"]
            p_dec = pair_pack(
                2 * f,
                b1["pointwise_kernel"].shape[-1],
                b2["pointwise_kernel"].shape[-1],
                2 * w,
            )
            # dequant folds into the (linear) transpose conv: kernel * s
            up_kernel = up["kernel"].astype(jnp.float32) * s_cur
            y = None
            if p_dec and p_dec >= 2:
                up_f = conv_ops.conv_transpose_2x2_packed(
                    xq.astype(compute_dtype),
                    up_kernel.astype(compute_dtype),
                    up["bias"],
                    out_pack=p_dec,
                )
                up_q = quantize(up_f, s_up)
                zs = z_skip
                if p_skip != p_dec:
                    zs = (
                        zs.reshape(bsz, sh, sw, sf) if p_skip > 1 else zs
                    ).reshape(bsz, sh, sw // p_dec, p_dec * sf)
                y = fused_sepconv_pair(
                    up_q,
                    b1,
                    b2,
                    in_packed=p_dec,
                    x2=zs,
                    in_scale=(s_up, s_skip),
                    out_scale=s_out,
                    compute_dtype=compute_dtype,
                )
            if y is None:
                # float fallback decoder stage
                xf = dequantize(xq, s_cur, compute_dtype)
                xu = conv_ops.conv_transpose_2x2(
                    xf, up["kernel"].astype(compute_dtype), up["bias"]
                )
                skip_f = dequantize(
                    z_skip.reshape(bsz, sh, sw, sf) if p_skip > 1 else z_skip,
                    s_skip,
                    compute_dtype,
                )
                y = quantize(
                    _pair(jnp.concatenate([xu, skip_f], axis=-1), b1, b2),
                    s_out,
                )
            xq, s_cur = y, s_out
            h, w = 2 * h, 2 * w

        # --- head: dequant folds into the 1x1 conv kernel; fp32 out ---
        head = params["output_mask"]
        logits = conv_ops.pointwise_conv2d(
            xq.astype(compute_dtype),
            (head["kernel"].astype(jnp.float32) * s_cur).astype(compute_dtype),
            head["bias"],
        )
        logits = logits.astype(jnp.float32)
        if num_classes == 1:
            return jax.nn.sigmoid(logits)
        return jax.nn.softmax(logits, axis=-1)

    return forward


def build_serving_forward_quant(
    variables: Dict[str, Any],
    scales: Dict[str, float],
    num_classes: int = 1,
    depth: int = 4,
    compute_dtype: Any = jnp.bfloat16,
) -> Callable[[jax.Array], jax.Array]:
    """Jitted int8-quantized chained serving forward.

    ``scales`` comes from :func:`calibrate_chained` (or any dict with the
    same keys; values should be powers of two for exact weight folds).
    """
    return jax.jit(
        _quant_chained_forward(
            variables, scales, num_classes, depth, compute_dtype
        )
    )


def build_serving_forward_sharded_quant(
    variables: Dict[str, Any],
    scales: Dict[str, float],
    mesh,
    num_classes: int = 1,
    depth: int = 4,
    compute_dtype: Any = jnp.bfloat16,
    batch_axis: str = "data",
    spatial_axis: str = "spatial",
) -> Callable[[jax.Array], jax.Array]:
    """Spatially-sharded int8 serving graph (shard_map + int8 halos).

    The multi-chip composition of the quantized graph: image rows shard
    on ``spatial_axis`` exactly like ``serving.build_serving_forward_sharded``
    (2-row halos around every fused pair, edge flags at the true image
    edge), but the tensors the halos exchange over ICI are **int8** —
    halving the collective bytes along with the HBM traffic.  The
    symmetric quantization maps 0.0 -> 0, so the zero halo rows at the
    image edge keep the reference's 'same'-padding semantics exactly.

    Encoder/bottleneck stages run int8-in/int8-out with 2x2 pools
    directly on int8 (monotone => exact).  Decoder stages dequantize the
    upsample + skip into the compute dtype for the concat (stream scales
    differ; a shared-scale int8 concat would cost extra precision) and
    re-enter int8 at the pair output.  The head runs fp32 as everywhere.
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from unet_image_segmentation_tpu.parallel.halo import halo_exchange
    from unet_image_segmentation_tpu.serving import _single_block

    if spatial_axis not in mesh.shape:
        raise ValueError(f"mesh has no {spatial_axis!r} axis: {mesh.shape}")
    n_spatial = mesh.shape[spatial_axis]
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def halo_pair_q(x, b1, b2, s_in, s_out):
        """One fused pair with 2-row int8 (or float) halos; int8 out.

        ``s_in`` is None when ``x`` is a float tensor (decoder concat).
        """
        kw = dict(
            in_scale=s_in,
            out_scale=s_out,
            compute_dtype=compute_dtype,
        )
        if n_spatial == 1:
            y = fused_sepconv_pair(x, b1, b2, **kw)
            if y is not None:
                return y
        else:
            idx = jax.lax.axis_index(spatial_axis)
            top_edge = (idx == 0).astype(jnp.int32)
            bot_edge = (idx == n_spatial - 1).astype(jnp.int32)
            xp = halo_exchange(x, spatial_axis, halo=2)
            y = fused_sepconv_pair(
                xp, b1, b2, edge_flags=(top_edge, bot_edge), **kw
            )
            if y is not None:
                return y[:, 2:-2]
        # no packing/tile fit: float per-block halos, requantized output
        xf = x if s_in is None else dequantize(x, s_in, compute_dtype)
        if n_spatial == 1:
            return quantize(_single_block(_single_block(xf, b1), b2), s_out)
        x1 = halo_exchange(xf, spatial_axis, halo=1)
        y1 = _single_block(x1, b1)[:, 1:-1]
        y1p = halo_exchange(y1, spatial_axis, halo=1)
        return quantize(_single_block(y1p, b2)[:, 1:-1], s_out)

    def local_forward(x: jax.Array) -> jax.Array:
        s_cur = scales["input"]
        xq = quantize(x, s_cur)
        skips = []
        for stage in range(1, depth + 1):
            b1 = _block_dict(params, stats, f"enc{stage}_block1")
            b2 = _block_dict(params, stats, f"enc{stage}_block2")
            s_out = scales[f"enc{stage}"]
            z = halo_pair_q(xq, b1, b2, s_cur, s_out)
            skips.append((z, s_out))
            xq = conv_ops.max_pool_2x2(z)  # int8 pool: exact
            s_cur = s_out

        xq = halo_pair_q(
            xq,
            _block_dict(params, stats, "bneck_block1"),
            _block_dict(params, stats, "bneck_block2"),
            s_cur,
            scales["bneck"],
        )
        s_cur = scales["bneck"]

        for i, stage in enumerate(range(depth, 0, -1)):
            up = params[f"dec{stage}_upsample"]
            b1 = _block_dict(params, stats, f"dec{stage}_block1")
            b2 = _block_dict(params, stats, f"dec{stage}_block2")
            # dequant folds into the transpose conv (row-local: 2x2/s2
            # upsampling never crosses shard boundaries)
            up_f = conv_ops.conv_transpose_2x2(
                xq.astype(compute_dtype),
                (up["kernel"].astype(jnp.float32) * s_cur).astype(
                    compute_dtype
                ),
                up["bias"],
            )
            z_skip, s_skip = skips[depth - 1 - i]
            skip_f = dequantize(z_skip, s_skip, compute_dtype)
            cat = jnp.concatenate([up_f, skip_f], axis=-1)
            s_out = scales[f"dec{stage}"]
            xq = halo_pair_q(cat, b1, b2, None, s_out)
            s_cur = s_out

        head = params["output_mask"]
        logits = conv_ops.pointwise_conv2d(
            xq.astype(compute_dtype),
            (head["kernel"].astype(jnp.float32) * s_cur).astype(
                compute_dtype
            ),
            head["bias"],
        )
        logits = logits.astype(jnp.float32)
        if num_classes == 1:
            return jax.nn.sigmoid(logits)
        return jax.nn.softmax(logits, axis=-1)

    spec = P(batch_axis, spatial_axis, None, None)
    sharded = shard_map(
        local_forward,
        mesh=mesh,
        in_specs=spec,
        out_specs=spec,
        check_vma=False,
    )
    io_sharding = NamedSharding(mesh, spec)
    return jax.jit(
        sharded, in_shardings=(io_sharding,), out_shardings=io_sharding
    )
