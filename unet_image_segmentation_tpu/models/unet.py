"""TPU-native Flax U-Net.

Architecture parity with reference ``model/u_net.py:28-116``:

* Encoder: 4 stages (filters 64/128/256/512), two ConvBlocks + 2x2 MaxPool
  each (``u_net.py:57-69``); skips saved *before* pooling.
* Bottleneck: two ConvBlocks at 1024 filters + Dropout(rate)
  (``u_net.py:71-78``).
* Decoder: per stage — Conv2DTranspose(k=2, s=2) -> Concatenate([up, skip])
  -> Dropout (skipped on the last/shallowest stage, ``u_net.py:97``) ->
  two ConvBlocks (``u_net.py:80-101``).
* Head: 1x1 Conv, sigmoid if ``num_classes == 1`` else softmax
  (``u_net.py:103-112``).

Module names follow the reference's deterministic layer names
(``enc{s}_block{n}``, ``bneck_block{n}``, ``dec{s}_upsample`` …) so
checkpoints are self-describing and Keras ``.h5`` imports map 1:1.

TPU-first choices: NHWC everywhere, transpose-conv as MXU matmul,
reshape-based max-pool, optional bfloat16 compute with float32 params, and
(optionally) Pallas fused sepconv blocks for inference.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unet_image_segmentation_tpu.config import ModelConfig
from unet_image_segmentation_tpu.models.layers import Conv, ConvBlock, TransposeUp
from unet_image_segmentation_tpu.ops import hash_dropout as hd
from unet_image_segmentation_tpu.ops.conv import max_pool_2x2


class _HeadSums:
    """Marker wrapper: the decoder produced fused-head SUMS, not an
    activation — the caller returns them instead of running the XLA head."""

    def __init__(self, sums):
        self.sums = sums


class UNet(nn.Module):
    num_classes: int = 1
    filters: Tuple[int, ...] = (64, 128, 256, 512)
    dropout_rate: float = 0.2
    use_batch_norm: bool = True
    conv_type: str = "separable"  # 'separable' (reference) | 'full' (configs[2])
    dtype: Any = jnp.float32
    bn_axis_name: Optional[Any] = None  # str, or tuple incl. the spatial axis
    use_pallas: bool = False
    dropout_impl: str = "auto"  # 'auto' | 'hash' | 'rng' (see ModelConfig)
    # Fused head-kernel policy: 'auto' = sigmoid head only (measured win);
    # 'all' = also the softmax head (measured LOSS at 512px — the
    # multiclass panels are VPU-bound at p/128 live lanes, DESIGN.md);
    # 'off' = never (numerics are path-independent, see ModelConfig).
    fused_head: str = "auto"
    # Mesh axis carrying sharded image rows (set when the train step runs
    # the fused chains inside shard_map on a ('data', 'spatial') mesh):
    # every chain link exchanges 1-row z-space halos over ICI and
    # bn_axis_name must include this axis so BN moments stay global.
    spatial_axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        head_targets: Optional[jax.Array] = None,
    ) -> Any:
        """Forward pass: probabilities ``(B, H, W, num_classes)``.

        ``head_targets`` (training only): ground-truth masks.  When given,
        the model returns the fused-head SUMS contract instead of
        probabilities — a dict of per-sample loss/metric reductions (see
        ``ops.pallas.fused_head.SUM_KEYS``).  On the Pallas chain path the
        last decoder stage + 1x1-conv head + sigmoid + reductions run as
        one kernel pair and the probability tensor never reaches HBM; on
        every other path the same dict is computed from the materialized
        probabilities, so the contract (and numerics) are path-independent.
        """
        if x.ndim != 4:
            raise ValueError(f"expected NHWC input, got shape {x.shape}")
        h, w = x.shape[1], x.shape[2]
        depth = len(self.filters)
        if h % (2**depth) or w % (2**depth):
            raise ValueError(
                f"spatial dims {h}x{w} must be divisible by {2**depth}"
            )

        def block(feat: int, name: str) -> ConvBlock:
            return ConvBlock(
                features=feat,
                use_batch_norm=self.use_batch_norm,
                conv_type=self.conv_type,
                dtype=self.dtype,
                bn_axis_name=self.bn_axis_name,
                use_pallas=self.use_pallas,
                name=name,
            )

        # Whole-stage fused training chain: both ConvBlocks of a stage run
        # through ops/pallas/fused_train.py — block2's kernel applies
        # block1's BatchNorm affine + ReLU to its tiles in VMEM, BN batch
        # moments ride along with each forward, and the backward is the
        # fused 3-stream Pallas kernel (no XLA BN backward, no f32
        # residual materialization). Variable trees are identical to the
        # per-block paths.
        use_chain = (
            train
            and self.use_pallas
            and self.use_batch_norm
            and self.conv_type == "separable"
        )

        # Position-hash dropout (ops/hash_dropout.py): stateless masks
        # that the fused chain kernels regenerate in VMEM from absolute
        # coordinates — no mask tensor in HBM, no threefry bit stream —
        # and that the XLA path reproduces bit-identically, keeping
        # Pallas-vs-XLA train parity exact with dropout ON.  One seed per
        # dropout site per step, derived from the 'dropout' rng.
        hash_drop = (
            train
            and self.dropout_rate > 0.0
            and (
                self.dropout_impl == "hash"
                or (self.dropout_impl == "auto" and use_chain)
            )
        )
        if hash_drop:
            _dkey = self.make_rng("dropout")

            def site_seed(site: int) -> jax.Array:
                return hd.seed_from_rng(jax.random.fold_in(_dkey, site))

        def _update_bn(stats, pvars_pair):
            if self.is_initializing():
                return
            momentum = 0.99  # Keras BatchNormalization default
            for (pm, pv), pvars in zip(stats, pvars_pair):
                mean_var, var_var = pvars[4], pvars[5]
                mean_var.value = momentum * mean_var.value + (1 - momentum) * pm
                var_var.value = momentum * var_var.value + (1 - momentum) * pv

        def chain_params(x_feats, feats, name1, name2):
            b1, b2 = block(feats, name1), block(feats, name2)
            p1 = b1(x, train, params_only=True, in_features=x_feats)
            p2 = b2(x, train, params_only=True, in_features=feats)
            return p1, p2

        def run_pair(
            x: jax.Array,
            feats: int,
            name1: str,
            name2: str,
            in_packed: Optional[int] = None,
            c_in: Optional[int] = None,
            drop_rate: float = 0.0,
            drop_seed: Optional[jax.Array] = None,
            fuse_head: bool = False,
        ) -> Any:
            b1, b2 = block(feats, name1), block(feats, name2)
            if not use_chain:
                return b2(b1(x, train), train)
            from unet_image_segmentation_tpu.ops.pallas.fused_train import (
                fused_chain_train,
            )

            c0 = c_in if c_in is not None else x.shape[-1]
            p1 = b1(x, train, params_only=True, in_features=c0)
            p2 = b2(x, train, params_only=True, in_features=feats)
            chain_blocks = [(p[0], p[1], p[2], p[3]) for p in (p1, p2)]
            if self.spatial_axis_name is not None and drop_rate > 0.0:
                # spatial chains hoist dropout to the XLA level (the halo
                # rows must be post-dropout values; the step folds the
                # spatial axis index into the rng so shard masks
                # decorrelate) — same per-element distribution
                x = hd.hash_dropout(
                    x, drop_seed, drop_rate, packed=in_packed or 1
                )
                drop_rate, drop_seed = 0.0, None
            head_kernel_ok = self.fused_head == "all" or (
                self.fused_head == "auto" and self.num_classes == 1
            )
            if fuse_head and head_kernel_ok and drop_rate == 0.0:
                # Fused segmentation head: this (final) decoder stage, the
                # 1x1-conv + sigmoid head, and the loss/metric reductions
                # run as one kernel pair on the chain's packed layout
                # (ops/pallas/fused_head.py) — the full-resolution
                # probability tensor never reaches HBM.  Feasibility is
                # checked STATICALLY before the head Conv is declared:
                # falling through after declaring it would declare
                # 'output_mask' a second time at the function tail and
                # Flax raises NameInUseError at trace time.
                from unet_image_segmentation_tpu.ops.pallas.fused_head import (
                    fused_head_feasible,
                    fused_head_train,
                )

                if fused_head_feasible(
                    x.shape, (feats, feats), self.num_classes, in_packed
                ):
                    wk, bk = Conv(
                        features=self.num_classes,
                        kernel_size=1,
                        dtype=self.dtype,
                        name="output_mask",
                    )(x, params_only=True, in_features=feats)
                    out = fused_head_train(
                        x.astype(self.dtype),
                        chain_blocks,
                        wk,
                        bk,
                        head_targets,
                        eps=1e-3,
                        axis_name=self.bn_axis_name,
                        in_packed=in_packed,
                        spatial_axis=self.spatial_axis_name,
                    )
                    assert out is not None, (
                        "fused_head_train disagreed with fused_head_feasible"
                    )
                    sums, stats = out
                    _update_bn(stats, (p1, p2))
                    return _HeadSums(sums)
            z, stats = fused_chain_train(
                x.astype(self.dtype),
                chain_blocks,
                eps=1e-3,
                axis_name=self.bn_axis_name,
                in_packed=in_packed,
                drop_rate=drop_rate,
                drop_seed=drop_seed,
                spatial_axis=self.spatial_axis_name,
            )
            _update_bn(stats, (p1, p2))
            return z

        x = x.astype(self.dtype)
        skips = []
        bneck = self.filters[-1] * 2
        if use_chain:
            # Packed encoder: each stage's chain fuses the boundary
            # affine+ReLU with the 2x2 max pool and emits the pooled tensor
            # already in the NEXT stage's packed layout — skips stay packed
            # (one reshape where the decoder concatenates them), and no
            # layout-conversion copies appear between stages.
            from unet_image_segmentation_tpu.ops.pallas.fused_train import (
                chain_pack_of,
                fused_chain_train_pool,
            )

            w_cur = w
            in_p = None
            for i, f in enumerate(self.filters):
                stage = i + 1
                nxt = (
                    self.filters[i + 1] if i + 1 < depth else bneck
                )
                p2 = chain_pack_of([f, nxt, nxt], w_cur // 2)
                c_in = (
                    x.shape[-1] if in_p in (None, 1) else x.shape[-1] // in_p
                )
                pp1, pp2 = chain_params(
                    c_in, f, f"enc{stage}_block1", f"enc{stage}_block2"
                )
                z_p, p_skip, pooled, stats = fused_chain_train_pool(
                    x.astype(self.dtype),
                    [(pp[0], pp[1], pp[2], pp[3]) for pp in (pp1, pp2)],
                    pool_to_pack=p2,
                    in_packed=in_p,
                    eps=1e-3,
                    axis_name=self.bn_axis_name,
                    spatial_axis=self.spatial_axis_name,
                )
                _update_bn(stats, (pp1, pp2))
                skips.append((z_p, p_skip, (x.shape[0], h // (2**i), w_cur, f)))
                x = pooled
                in_p = p2
                w_cur //= 2
            # bneck chain consumes the pooled tensor STILL PACKED: the last
            # stage's pool_to_pack was computed from the bneck chain's own
            # channel ladder, so in_packed matches by construction — no
            # unpack/repack reshape pair between encoder and bottleneck.
            bneck_p = in_p if (in_p and in_p > 1) else None
        else:
            bneck_p = None
            for i, f in enumerate(self.filters):
                stage = i + 1
                x = run_pair(x, f, f"enc{stage}_block1", f"enc{stage}_block2")
                skips.append(x)
                x = max_pool_2x2(x)

        # --- Bottleneck ---
        x = run_pair(
            x,
            bneck,
            "bneck_block1",
            "bneck_block2",
            in_packed=bneck_p,
            c_in=(x.shape[-1] // bneck_p) if bneck_p else None,
        )
        if self.dropout_rate > 0.0:
            if hash_drop:
                # cheap coordinate-hash mask (~10 int VPU ops/elem vs a
                # threefry bit stream); XLA fuses it into the consumer
                x = hd.hash_dropout(x, site_seed(0), self.dropout_rate)
            else:
                x = nn.Dropout(
                    rate=self.dropout_rate,
                    deterministic=not train,
                    name="bneck_dropout",
                )(x)

        # --- Decoder ---
        rev_filters = tuple(reversed(self.filters))
        rev_skips = list(reversed(skips))
        for i, f in enumerate(rev_filters):
            stage = depth - i
            has_dropout = self.dropout_rate > 0.0 and i < depth - 1
            # final decoder stage + head + loss sums fuse into one kernel
            # pair when the caller asked for the sums contract (sigmoid
            # head, or softmax head up to MAX_MC_CLASSES)
            want_head = head_targets is not None and i == depth - 1
            # Packed decoder feed (training chain only): the upsample's
            # row parity splits into two (C, 2F) matmuls whose stacked
            # output IS pack-2 layout (no 6D-transpose pixel shuffle),
            # the packed encoder skip repacks with one reshape, and one
            # chunk-interleave builds the concat directly in the chain's
            # packed layout — the chain consumes it with in_packed, so no
            # separate concat + pack-reshape copies.  Dropout (when this
            # stage has it) applies elementwise on the packed tensor:
            # same per-element distribution, mask arrangement differs
            # from the unpacked path (both are valid dropout samples).
            p_dec = (
                chain_pack_of([2 * f, f, f], 2 * x.shape[2])
                if use_chain
                else 1
            )
            up_mod = TransposeUp(
                features=f, dtype=self.dtype, name=f"dec{stage}_upsample"
            )
            if (
                train
                and use_chain
                and isinstance(rev_skips[i], tuple)
                and (hash_drop or not has_dropout)
            ):
                # One-kernel decoder feed: TransposeUp matmul + row
                # interleave + [up | skip] concat fused
                # (ops/pallas/fused_upconcat.py), emitting the chain's
                # packed-2 input directly — no pad/stack/relayout chain
                # between the upsample and the stage kernels.  (With
                # rng-impl dropout the mask must apply on the materialized
                # concat, so that configuration keeps the composed path.)
                z_p, p_skip, (bsz, sh, sw, sf) = rev_skips[i]
                if p_skip >= 2 and p_skip % 2 == 0:
                    from unet_image_segmentation_tpu.ops.pallas.fused_upconcat import (
                        fused_upconcat,
                    )

                    k_up, b_up = up_mod(x, params_only=True)
                    cat2 = fused_upconcat(
                        x.astype(self.dtype), k_up, b_up, z_p, p_skip
                    )
                    if cat2 is not None:
                        x = run_pair(
                            cat2,
                            f,
                            f"dec{stage}_block1",
                            f"dec{stage}_block2",
                            in_packed=2,
                            c_in=2 * f,
                            drop_rate=(
                                self.dropout_rate
                                if (has_dropout and hash_drop)
                                else 0.0
                            ),
                            drop_seed=(
                                site_seed(stage)
                                if (has_dropout and hash_drop)
                                else None
                            ),
                            fuse_head=want_head,
                        )
                        continue
            if train and use_chain and p_dec >= 2 and isinstance(rev_skips[i], tuple):
                up_p = up_mod(x, out_pack=p_dec)
                z_p, p_skip, (bsz, sh, sw, sf) = rev_skips[i]
                skip_p = z_p.reshape(bsz, sh, sw, sf).reshape(
                    bsz, sh, sw // p_dec, p_dec * sf
                )
                # chunk interleave as ONE flat lane-dim concat of 2*p
                # aligned slices — a 5D stack lowers as pad+maximum with
                # permuted layouts (~5 ms of extra copies at 256px)
                cat = jnp.concatenate(
                    [
                        t[..., k * f : (k + 1) * f]
                        for k in range(p_dec)
                        for t in (up_p, skip_p)
                    ],
                    axis=-1,
                )
                if has_dropout and not hash_drop:
                    cat = nn.Dropout(
                        rate=self.dropout_rate,
                        deterministic=False,
                        name=f"dec{stage}_dropout",
                    )(cat)
                # hash dropout fuses into the chain's first kernel: the
                # mask is a pure function of logical (b,h,w,c) coords, so
                # the packed layout regenerates it exactly (u_net.py:96-99)
                x = run_pair(
                    cat,
                    f,
                    f"dec{stage}_block1",
                    f"dec{stage}_block2",
                    in_packed=p_dec,
                    c_in=2 * f,
                    drop_rate=self.dropout_rate if (has_dropout and hash_drop) else 0.0,
                    drop_seed=site_seed(stage) if (has_dropout and hash_drop) else None,
                    fuse_head=want_head,
                )
                continue
            x = up_mod(x)
            skip = rev_skips[i]
            if isinstance(skip, tuple):  # packed skip from the fused encoder
                z_p, p_skip, (bsz, sh, sw, sf) = skip
                skip = (
                    z_p.reshape(bsz, sh, sw, sf) if p_skip > 1 else z_p
                )
            if train:
                # training keeps the concat: dropout's one mask spans both
                # halves (u_net.py:96-99), and the factored backward is
                # slower than XLA's concat backward (measured on v5e).
                x = jnp.concatenate([x, skip], axis=-1)
                if has_dropout and hash_drop and use_chain:
                    # fused into the chain's first kernel (same mask as
                    # the packed path: logical-coordinate hash)
                    x = run_pair(
                        x,
                        f,
                        f"dec{stage}_block1",
                        f"dec{stage}_block2",
                        drop_rate=self.dropout_rate,
                        drop_seed=site_seed(stage),
                        fuse_head=want_head,
                    )
                    continue
                if has_dropout:
                    if hash_drop:
                        x = hd.hash_dropout(
                            x, site_seed(stage), self.dropout_rate
                        )
                    else:
                        x = nn.Dropout(
                            rate=self.dropout_rate,
                            deterministic=False,
                            name=f"dec{stage}_dropout",
                        )(x)
                x = run_pair(
                    x,
                    f,
                    f"dec{stage}_block1",
                    f"dec{stage}_block2",
                    fuse_head=want_head,
                )
            else:
                if has_dropout:
                    # declare the (inactive) module so the tree is stable
                    nn.Dropout(
                        rate=self.dropout_rate,
                        deterministic=True,
                        name=f"dec{stage}_dropout",
                    )
                # inference: concat-free — sepconv over [up, skip] factors
                # into two half-convs (ops.conv.separable_conv2d_pair),
                # eliminating the concat materialization and its TPU
                # relayout copies (+8% serving throughput on v5e).
                x = block(f, f"dec{stage}_block1")(x, train, x2=skip)
                x = block(f, f"dec{stage}_block2")(x, train)

        # --- Head (computed in float32 for a stable sigmoid/softmax) ---
        if isinstance(x, _HeadSums):
            return x.sums  # fused head already reduced loss/metric sums
        logits = Conv(
            features=self.num_classes, kernel_size=1, dtype=self.dtype, name="output_mask"
        )(x)
        logits = logits.astype(jnp.float32)
        preds = (
            jax.nn.sigmoid(logits)
            if self.num_classes == 1
            else jax.nn.softmax(logits, axis=-1)
        )
        if head_targets is not None:
            # sums contract on the non-fused paths: same dict, computed
            # from the materialized probabilities
            from unet_image_segmentation_tpu.ops.pallas.fused_head import (
                head_sums_reference,
                head_sums_reference_mc,
            )

            if self.num_classes == 1:
                return head_sums_reference(preds, head_targets)
            return head_sums_reference_mc(
                preds, head_targets, self.num_classes
            )
        return preds


def build_unet(
    cfg: ModelConfig,
    bn_axis_name: Optional[Any] = None,
    spatial_axis_name: Optional[str] = None,
) -> UNet:
    """Construct a :class:`UNet` from a :class:`..config.ModelConfig`."""
    return UNet(
        num_classes=cfg.num_classes,
        filters=tuple(cfg.filters),
        dropout_rate=cfg.dropout_rate,
        use_batch_norm=cfg.use_batch_norm,
        conv_type=cfg.conv_type,
        dtype=jnp.dtype(cfg.compute_dtype),
        bn_axis_name=bn_axis_name,
        use_pallas=cfg.use_pallas,
        dropout_impl=getattr(cfg, "dropout_impl", "auto"),
        fused_head=getattr(cfg, "fused_head", "auto"),
        spatial_axis_name=spatial_axis_name,
    )


def init_unet(
    model: UNet,
    rng: jax.Array,
    input_shape: Sequence[int],
) -> dict:
    """Initialize variables for ``(1, H, W, C)`` input; returns the var dict."""
    dummy = jnp.zeros((1, *input_shape), jnp.float32)
    return model.init({"params": rng}, dummy, train=False)
