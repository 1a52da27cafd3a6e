"""Hand-scheduled serving forward (maximum-fusion inference engine).

The Flax module path is the flexible reference implementation; this module
is the speed-of-light serving graph for the standard configuration
(separable convs + BatchNorm, eval mode): it reads the variable tree
directly and schedules

* one fused Pallas **block-pair** kernel per encoder stage and the
  bottleneck (block1 -> block2 never leaves VMEM; see
  ``ops/pallas/fused_sepconv.fused_sepconv_pair``),
* reduce_window max-pools,
* MXU-matmul transpose-ups, decoder concat + fused block pairs,
* the 1x1 sigmoid/softmax head in fp32.

Measured on v5e (bf16, round-3 ledger BENCH_r03.json): 256px b32 forward
**1673 img/s float / 1742 img/s int8** (19.1 / 18.7 ms/step); 1080p
streaming through the 1024px graph 76 fps float / 96 fps int8
device-resident (52.6 / 41.5 ms per 4-frame batch).  At 1024px the pair
kernel's tile heuristic still falls back to single-block kernels
(re-verified round 4: with ``pool=True`` the resident pooled buffer alone
exceeds the VMEM budget at 1024-wide rows, and without it no tile >= 8
rows fits) — closing that is open streaming headroom.  Outputs are
numerically the module path's outputs (same folded-BN math);
``tests/test_serving.py`` pins agreement.  Blocks with no lane packing
(the 3-channel input block) fall back to composed XLA.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unet_image_segmentation_tpu.ops import conv as conv_ops
from unet_image_segmentation_tpu.ops.pallas.fused_sepconv import (
    fused_sepconv_bn_relu,
    fused_sepconv_pair,
)
from unet_image_segmentation_tpu.parallel.halo import halo_exchange


def _block_dict(params: Dict, stats: Dict, name: str) -> Dict[str, Any]:
    p = params[name]
    out: Dict[str, Any] = {
        "depthwise_kernel": p["sepconv"]["depthwise_kernel"],
        "pointwise_kernel": p["sepconv"]["pointwise_kernel"],
    }
    if "bias" in p["sepconv"]:
        out["bias"] = p["sepconv"]["bias"]
    if "bn" in p:
        out.update(
            scale=p["bn"]["scale"],
            offset=p["bn"]["bias"],
            mean=stats[name]["bn"]["mean"],
            var=stats[name]["bn"]["var"],
        )
    return out


def _single_block(x: jax.Array, blk: Dict[str, Any]) -> jax.Array:
    return fused_sepconv_bn_relu(
        x,
        blk["depthwise_kernel"],
        blk["pointwise_kernel"],
        blk.get("bias"),
        bn_scale=blk.get("scale"),
        bn_offset=blk.get("offset"),
        bn_mean=blk.get("mean"),
        bn_var=blk.get("var"),
    )


def _pair(x: jax.Array, b1: Dict, b2: Dict) -> jax.Array:
    fused = fused_sepconv_pair(x, b1, b2)
    if fused is not None:
        return fused
    return _single_block(_single_block(x, b1), b2)


def _make_forward(
    variables: Dict[str, Any],
    num_classes: int,
    depth: int,
    compute_dtype: Any,
    pair_fn: Callable[[jax.Array, Dict, Dict], jax.Array],
) -> Callable[[jax.Array], jax.Array]:
    """Serving graph body; ``pair_fn`` runs each fused ConvBlock pair."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def forward(x: jax.Array) -> jax.Array:
        x = x.astype(compute_dtype)
        skips = []
        for stage in range(1, depth + 1):
            b1 = _block_dict(params, stats, f"enc{stage}_block1")
            b2 = _block_dict(params, stats, f"enc{stage}_block2")
            x = pair_fn(x, b1, b2)
            skips.append(x)
            x = conv_ops.max_pool_2x2(x)

        x = pair_fn(
            x,
            _block_dict(params, stats, "bneck_block1"),
            _block_dict(params, stats, "bneck_block2"),
        )

        for i, stage in enumerate(range(depth, 0, -1)):
            up = params[f"dec{stage}_upsample"]
            x = conv_ops.conv_transpose_2x2(x, up["kernel"], up["bias"])
            skip = skips[depth - 1 - i]
            x = jnp.concatenate([x, skip], axis=-1)
            x = pair_fn(
                x,
                _block_dict(params, stats, f"dec{stage}_block1"),
                _block_dict(params, stats, f"dec{stage}_block2"),
            )

        head = params["output_mask"]
        logits = conv_ops.pointwise_conv2d(x, head["kernel"], head["bias"])
        logits = logits.astype(jnp.float32)
        if num_classes == 1:
            return jax.nn.sigmoid(logits)
        return jax.nn.softmax(logits, axis=-1)

    return forward


def build_serving_forward(
    variables: Dict[str, Any],
    num_classes: int = 1,
    depth: int = 4,
    compute_dtype: Any = jnp.bfloat16,
) -> Callable[[jax.Array], jax.Array]:
    """Jitted maximum-fusion forward over a standard U-Net variable tree."""
    return jax.jit(
        _make_forward(variables, num_classes, depth, compute_dtype, _pair)
    )


# ---------------------------------------------------------------------------
# Chained packed serving graph — reuses the training-chain kernels in eval
# mode (running-stats affines), keeping tensors lane-packed BETWEEN kernels
# and fusing the encoder pools into the stage boundaries.  The pair-kernel
# graph above spends ~36% of its 256px step in layout copies + reduce_window
# pools around the pallas calls (profile_summary on v5e); this graph's
# stages exchange packed tensors with no layout conversion at all.
# ---------------------------------------------------------------------------


def _chained_forward(
    variables: Dict[str, Any],
    num_classes: int,
    depth: int,
    compute_dtype: Any,
) -> Callable[[jax.Array], jax.Array]:
    from unet_image_segmentation_tpu.ops.pallas.fused_sepconv import pair_pack

    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def pw_f(name):
        return params[name]["sepconv"]["pointwise_kernel"].shape[-1]

    def forward(x: jax.Array) -> jax.Array:
        x = x.astype(compute_dtype)
        bsz = x.shape[0]
        h, w = x.shape[1], x.shape[2]
        skips = []  # (z, pack, (h, w, f))
        in_p = 1
        for stage in range(1, depth + 1):
            b1 = _block_dict(params, stats, f"enc{stage}_block1")
            b2 = _block_dict(params, stats, f"enc{stage}_block2")
            f2 = b2["pointwise_kernel"].shape[-1]
            res = fused_sepconv_pair(
                x,
                b1,
                b2,
                in_packed=in_p if in_p > 1 else None,
                out_packed=True,
                pool=True,
            )
            if res is not None:
                z_p, p, pooled = res
                nxt = (
                    f"enc{stage + 1}_block1"
                    if stage < depth
                    else "bneck_block1"
                )
                nxt2 = (
                    f"enc{stage + 1}_block2"
                    if stage < depth
                    else "bneck_block2"
                )
                p2 = pair_pack(f2, pw_f(nxt), pw_f(nxt2), w // 2) or 1
                if p2 != p // 2:
                    pooled = pooled.reshape(bsz, h // 2, w // 2, f2).reshape(
                        bsz, h // 2, (w // 2) // p2, p2 * f2
                    )
                skips.append((z_p, p, (h, w, f2)))
                x, in_p = pooled, p2
            else:
                if in_p > 1:
                    x = x.reshape(bsz, h, w, x.shape[-1] // in_p)
                z = _pair(x, b1, b2)
                skips.append((z, 1, (h, w, f2)))
                x = conv_ops.max_pool_2x2(z)
                in_p = 1
            h, w = h // 2, w // 2

        # --- bottleneck (no pool; unpacked output feeds the upsample) ---
        b1 = _block_dict(params, stats, "bneck_block1")
        b2 = _block_dict(params, stats, "bneck_block2")
        pb = pair_pack(
            x.shape[-1] if in_p == 1 else x.shape[-1] // in_p,
            b1["pointwise_kernel"].shape[-1],
            b2["pointwise_kernel"].shape[-1],
            w,
        )
        if in_p > 1 and pb != in_p:
            x = x.reshape(bsz, h, w, x.shape[-1] // in_p)
            in_p = 1
        y = fused_sepconv_pair(
            x, b1, b2, in_packed=in_p if in_p > 1 else None
        )
        x = y if y is not None else _pair(
            x if in_p == 1 else x.reshape(bsz, h, w, x.shape[-1] // in_p),
            b1,
            b2,
        )

        # --- decoder: packed upsample + concat feed where the pair packs ---
        for i, stage in enumerate(range(depth, 0, -1)):
            up = params[f"dec{stage}_upsample"]
            z_skip, p_skip, (sh, sw, sf) = skips[depth - 1 - i]
            f = up["kernel"].shape[2]
            b1 = _block_dict(params, stats, f"dec{stage}_block1")
            b2 = _block_dict(params, stats, f"dec{stage}_block2")
            p_dec = pair_pack(
                2 * f,
                b1["pointwise_kernel"].shape[-1],
                b2["pointwise_kernel"].shape[-1],
                2 * w,
            )
            y = None
            if p_dec and p_dec >= 2:
                up_p = conv_ops.conv_transpose_2x2_packed(
                    x, up["kernel"], up["bias"], out_pack=p_dec
                )
                if p_skip != p_dec:
                    z_skip = (
                        z_skip.reshape(bsz, sh, sw, sf)
                        if p_skip > 1
                        else z_skip
                    ).reshape(bsz, sh, sw // p_dec, p_dec * sf)
                # the pair kernel interleaves the [up | skip] concat
                # chunks in VMEM from the two packed streams — no concat
                # tensor ever reaches HBM
                y = fused_sepconv_pair(
                    up_p, b1, b2, in_packed=p_dec, x2=z_skip
                )
                if y is None:
                    cat = jnp.concatenate(
                        [
                            t[..., k * f : (k + 1) * f]
                            for k in range(p_dec)
                            for t in (up_p, z_skip)
                        ],
                        axis=-1,
                    )
                    y = fused_sepconv_pair(cat, b1, b2, in_packed=p_dec)
                if y is None:
                    cat_u = cat.reshape(bsz, 2 * h, 2 * w, 2 * f)
                    y = _pair(cat_u, b1, b2)
            else:
                xu = conv_ops.conv_transpose_2x2(x, up["kernel"], up["bias"])
                skip = (
                    z_skip.reshape(bsz, sh, sw, sf) if p_skip > 1 else z_skip
                )
                y = _pair(jnp.concatenate([xu, skip], axis=-1), b1, b2)
            x = y
            h, w = 2 * h, 2 * w

        head = params["output_mask"]
        logits = conv_ops.pointwise_conv2d(x, head["kernel"], head["bias"])
        logits = logits.astype(jnp.float32)
        if num_classes == 1:
            return jax.nn.sigmoid(logits)
        return jax.nn.softmax(logits, axis=-1)

    return forward


def build_serving_forward_chained(
    variables: Dict[str, Any],
    num_classes: int = 1,
    depth: int = 4,
    compute_dtype: Any = jnp.bfloat16,
) -> Callable[[jax.Array], jax.Array]:
    """Jitted chained-packed serving forward (see module comment above)."""
    return jax.jit(
        _chained_forward(variables, num_classes, depth, compute_dtype)
    )


def build_serving_forward_sharded(
    variables: Dict[str, Any],
    mesh: Mesh,
    num_classes: int = 1,
    depth: int = 4,
    compute_dtype: Any = jnp.bfloat16,
    batch_axis: str = "data",
    spatial_axis: str = "spatial",
) -> Callable[[jax.Array], jax.Array]:
    """Spatially-sharded Pallas serving graph (shard_map + explicit halos).

    GSPMD cannot partition a ``pallas_call``, so the multi-chip serving
    path wraps the SAME hand-scheduled graph in ``shard_map`` with image
    rows on ``spatial_axis``: before every fused block pair the shard
    exchanges 2-row halos with its mesh neighbours over ICI
    (:func:`..parallel.halo.halo_exchange` — the chained 3x3 receptive
    field of a pair needs 2 rows) and trims them afterwards.  The pair
    kernel zero-pads its slab edges, which only corrupts the 2 trimmed
    rows; at the true image edge the halo rows ARE zero, reproducing
    'same'-padding semantics exactly.  Pools, transpose-ups, concats and
    the 1x1 head are row-local, so the composition equals the unsharded
    graph (pinned by ``tests/test_serving.py``).

    Scales the capability the reference caps by host-resizing everything
    to 256px (reference ``scripts/inference.py:106-108``).
    """
    if spatial_axis not in mesh.shape:
        raise ValueError(f"mesh has no {spatial_axis!r} axis: {mesh.shape}")
    n_spatial = mesh.shape[spatial_axis]

    def halo_pair(x: jax.Array, b1: Dict, b2: Dict) -> jax.Array:
        if n_spatial == 1:
            return _pair(x, b1, b2)
        idx = jax.lax.axis_index(spatial_axis)
        top_edge = (idx == 0).astype(jnp.int32)
        bot_edge = (idx == n_spatial - 1).astype(jnp.int32)
        xp = halo_exchange(x, spatial_axis, halo=2)
        y = fused_sepconv_pair(xp, b1, b2, edge_flags=(top_edge, bot_edge))
        if y is not None:
            return y[:, 2:-2]
        # No packing / tile fit for the pair: per-block halo exchange.
        # A 1-row zero halo at the true edge IS the 'same' padding row, so
        # single blocks are exact without edge flags.
        x1 = halo_exchange(x, spatial_axis, halo=1)
        y1 = _single_block(x1, b1)[:, 1:-1]
        y1p = halo_exchange(y1, spatial_axis, halo=1)
        return _single_block(y1p, b2)[:, 1:-1]

    local_forward = _make_forward(
        variables, num_classes, depth, compute_dtype, halo_pair
    )
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
