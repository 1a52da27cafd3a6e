"""Pallas TPU kernels: whole-stage fused TRAINING path (ConvBlock chains).

The reference's hot loop is chains of ``SeparableConv -> BatchNorm -> ReLU``
blocks (two per U-Net stage, reference ``model/u_net.py:5-26``).  Round 1
ran each block as [Pallas sepconv+stats] -> [XLA normalize+ReLU] ->
(backward) [XLA BN backward] -> [XLA g_eff fold] -> [Pallas conv backward].
Profiling on v5e showed that structure is dominated by HBM round trips the
compiler cannot remove: every XLA<->Pallas boundary materializes the
activation (with layout-conversion copies, since 64-channel tensors
half-fill the 128-lane tiles and XLA prefers non-C-minor layouts that
``pallas_call`` cannot accept), and autodiff saves the normalized
activation as an extra residual.

This module restructures a whole chain (block1 -> block2) around three
ideas:

* **Affine-into-kernel forward**: block k+1's kernel applies block k's
  BatchNorm affine + ReLU to its input tiles in VMEM (``z = relu(a*y+b)``
  with the batch moments folded into per-channel ``a, b``), so the
  normalized activation never exists in HBM.  Each block's kernel emits
  the BN batch moments of its raw output alongside (one pass).
* **Fused BN backward**: the backward kernel builds the upstream gradient
  w.r.t. its raw output IN-KERNEL from three streams (input x, raw
  gradient g, own output y) and per-channel constants — the full
  BatchNorm backward ``dy = a*(g*mask) + B + (y-mean)*C`` — and emits the
  next block's BN-backward reductions (sum, sum*yhat of the masked input
  gradient) as it writes dx.  No g_eff materialization, no XLA BN
  backward, no f32 residuals.
* **Flash-style residuals**: only the raw (pre-BN) activations are saved;
  ReLU masks and normalized values are recomputed on VMEM tiles.

Numerics match the composed-XLA chain (:func:`chain_reference`) within
bf16 tolerance; gradients are pinned against ``jax.vjp`` of the reference
in ``tests/test_fused_train.py``.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unet_image_segmentation_tpu.ops import conv as conv_ops
from unet_image_segmentation_tpu.ops import hash_dropout as hd
from unet_image_segmentation_tpu.ops.pallas import fused_sepconv as fs


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


# Backward-kernel column-reduction strategy (see _bwd_train_kernel):
# 'split' = one ones-matvec per reduction operand; 'merged' = one wide
# matvec over the lane-concat of all 11 operands; 'merged_bf16' = the
# wide matvec with bf16 operands (f32 accumulation).  Measured on the
# v5e at 256px/b32: merged 411.2 img/s, split 408.9, merged_bf16 400.3
# (the bf16 round-trip on the products costs more than the rate gain).
_BWD_COLSUM = os.environ.get("UNET_TPU_BWD_COLSUM", "merged")


_warned_fallbacks: set = set()


def _warn_fallback(what: str) -> None:
    """Loud (once per message) trace-time note that a chain link dropped to
    the composed-XLA path — users asking for ``use_pallas`` training should
    know when a shape/packing constraint quietly costs them the fused
    kernels (VERDICT r2: the flagship number must be the product's number).
    Numerics are identical either way."""
    if what in _warned_fallbacks:
        return
    _warned_fallbacks.add(what)
    import warnings

    warnings.warn(
        f"fused training chain: XLA fallback for {what} (numerics "
        f"identical; throughput reduced)",
        stacklevel=2,
    )


# ---------------------------------------------------------------------------
# Forward kernel: [input affine+ReLU] -> sepconv -> emit (y, sum, sumsq)
# ---------------------------------------------------------------------------


def _fwd_train_kernel(
    x_hbm,        # (B, H, Wp, pC) ANY
    aff_ref,      # (2, pC) VMEM: row0 in_scale, row1 in_shift
    dwk_ref,      # (3, 3, pC) VMEM
    pww_ref,      # (pC, pF) VMEM
    seed_ref,     # (1, 1) SMEM int32: hash-dropout seed (0 when unused)
    halo_ref,     # (1, 2, Wp, pC) VMEM z-space halo rows (dummy when unused)
    out_hbm,      # (B, H, Wp, pF) ANY
    sum_ref,      # (8, pF) VMEM accumulated (row 0)
    sq_ref,       # (8, pF) VMEM accumulated (row 0)
    xbuf,         # scratch (2, TH+2, Wp, pC)
    ybuf,         # scratch (2, TH, Wp, pF)
    s_acc,        # scratch (8, pF) f32
    q_acc,        # scratch (8, pF) f32
    in_sems,      # (2, 3)
    out_sems,     # (2,)
    *,
    tile_h: int,
    n_tiles: int,
    c: int,
    in_affine: bool,
    pack_p: int = 1,
    drop_thresh: int = 0,
    inv_keep: float = 1.0,
    has_halo: bool = False,
):
    """Double-buffered sepconv forward with optional input affine+ReLU.

    With ``in_affine`` the loaded slab is transformed ``z = relu(a*x + b)``
    in VMEM before the conv — the previous block's BatchNorm+ReLU applied
    on the fly.  Virtual edge rows are re-zeroed AFTER the transform
    ('same' padding pads the POST-activation z with zeros, and
    ``relu(b) != 0`` in general).

    With ``has_halo`` (spatially-sharded training: image rows sharded over
    a mesh axis) the virtual rows are instead filled with the NEIGHBOUR
    shard's boundary rows, pre-exchanged over ICI in z-space
    (``halo_ref`` row 0 = above, row 1 = below; zeros at the true image
    edge, which reproduces 'same' padding exactly).  Injecting them here
    keeps the packed layout intact — no halo-augmented slab ever
    materializes in HBM.

    With ``drop_thresh`` the loaded slab gets position-hash dropout
    (``ops/hash_dropout.py``) applied in VMEM: the mask is a pure function
    of absolute logical coordinates + seed, so the backward kernel —
    tiled differently — regenerates it bit-identically from the saved
    pre-dropout residual.  The chain applies this only on its FIRST block
    (the chain input; reference decoder dropout, ``u_net.py:96-99``).
    """
    b = pl.program_id(0)
    wp = xbuf.shape[2]
    pc = xbuf.shape[3]
    pf = ybuf.shape[3]

    # ONE slab DMA per tile (rows [row0-1, row0+tile_h] into
    # xbuf[0:tile_h+2]), with shortened edge variants that stay in range;
    # the virtual halo row is zero-filled after the wait.  Re-reading the
    # two halo rows costs 2/tile_h extra traffic — cheaper than the three
    # per-tile DMAs (center + 2 single-row halos) this replaces: single-
    # row DMAs are latency-bound and serialized the pipeline.
    def _edge_cases(j, slot, verb):
        row0 = j * tile_h
        sem = in_sems.at[slot, 0]

        @pl.when(j == 0)
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(0, tile_h + 1)],
                xbuf.at[slot, pl.ds(1, tile_h + 1)],
                sem,
            )
            getattr(cp, verb)()

        @pl.when(j == n_tiles - 1)
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(row0 - 1, tile_h + 1)],
                xbuf.at[slot, pl.ds(0, tile_h + 1)],
                sem,
            )
            getattr(cp, verb)()

        @pl.when(jnp.logical_and(j > 0, j < n_tiles - 1))
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(row0 - 1, tile_h + 2)], xbuf.at[slot], sem
            )
            getattr(cp, verb)()

    def start_in(j, slot):
        if n_tiles == 1:
            pltpu.make_async_copy(
                x_hbm.at[b],
                xbuf.at[slot, pl.ds(1, tile_h)],
                in_sems.at[slot, 0],
            ).start()
        else:
            _edge_cases(j, slot, "start")

    def wait_in(j, slot):
        if n_tiles == 1:
            pltpu.make_async_copy(
                x_hbm.at[b],
                xbuf.at[slot, pl.ds(1, tile_h)],
                in_sems.at[slot, 0],
            ).wait()
        else:
            _edge_cases(j, slot, "wait")

        if drop_thresh:
            # slab row i is absolute row j*tile_h - 1 + i (edge variants
            # leave virtual rows, zero-filled below — their mask values
            # never matter)
            keep = hd.slab_keep_mask(
                b, j * tile_h - 1, tile_h + 2, wp, pc,
                n_tiles * tile_h, pack_p, c, seed_ref[0, 0], drop_thresh,
            )
            xbuf[slot] = hd.apply_keep(xbuf[slot], keep, inv_keep)

        if in_affine:
            z = (
                xbuf[slot].astype(jnp.float32) * aff_ref[0][None, None, :]
                + aff_ref[1][None, None, :]
            )
            xbuf[slot] = jnp.maximum(z, 0.0).astype(xbuf.dtype)

        # virtual rows AFTER the transform: padding is zero in z-space —
        # or the neighbour shard's z-space halo row under spatial sharding
        @pl.when(j == 0)
        def _():
            if has_halo:
                xbuf[slot, 0, :, :] = halo_ref[0, 0]
            else:
                xbuf[slot, 0, :, :] = jnp.zeros((wp, pc), xbuf.dtype)

        @pl.when(j == n_tiles - 1)
        def _():
            if has_halo:
                xbuf[slot, tile_h + 1, :, :] = halo_ref[0, 1]
            else:
                xbuf[slot, tile_h + 1, :, :] = jnp.zeros((wp, pc), xbuf.dtype)

    def out_copy(j, slot):
        return pltpu.make_async_copy(
            ybuf.at[slot],
            out_hbm.at[b, pl.ds(j * tile_h, tile_h)],
            out_sems.at[slot],
        )

    s_acc[...] = jnp.zeros((8, pf), jnp.float32)
    q_acc[...] = jnp.zeros((8, pf), jnp.float32)

    start_in(0, 0)

    def body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_tiles)
        def _():
            start_in(j + 1, jax.lax.rem(j + 1, 2))

        wait_in(j, slot)

        @pl.when(j >= 2)
        def _():
            out_copy(j - 2, slot).wait()

        y = fs._tile_sepconv(xbuf[slot], dwk_ref, pww_ref, tile_h, wp, pc, c)
        y_cast = y.astype(ybuf.dtype)
        ybuf[slot] = y_cast.reshape(tile_h, wp, pf)
        out_copy(j, slot).start()

        yf = y_cast.astype(jnp.float32)
        s_acc[0, :] = s_acc[0, :] + jnp.sum(yf, axis=0)
        q_acc[0, :] = q_acc[0, :] + jnp.sum(yf * yf, axis=0)
        return ()

    jax.lax.fori_loop(0, n_tiles, body, (), unroll=False)

    @pl.when(n_tiles >= 2)
    def _():
        out_copy(n_tiles - 2, jax.lax.rem(n_tiles - 2, 2)).wait()

    out_copy(n_tiles - 1, jax.lax.rem(n_tiles - 1, 2)).wait()

    first = b == 0

    @pl.when(first)
    def _():
        sum_ref[...] = s_acc[...]
        sq_ref[...] = q_acc[...]

    @pl.when(jnp.logical_not(first))
    def _():
        sum_ref[...] = sum_ref[...] + s_acc[...]
        sq_ref[...] = sq_ref[...] + q_acc[...]


def _chain_common_pack(channels: Sequence[int], w: int) -> Optional[int]:
    """Smallest pack factor aligning EVERY channel count in the chain.

    A chain-wide p lets consecutive kernels exchange packed (B, H, W/p,
    p*C) tensors directly — no per-block pack/unpack reshapes, which under
    TPU tiled layouts are physical copies whenever C < 128 (the lane tile
    pads 64-channel tensors 2x, so the reshape is never a bitcast).
    """
    for p in (1, 2, 4, 8, 16):
        if w % p:
            continue
        if all((p * c) % fs.LANE == 0 for c in channels):
            return p
    return None


def _fwd_train_packed(
    xp: jax.Array,      # (B, H, Wp, pC) already packed
    dwk: jax.Array,     # (3, 3, C)
    pww: jax.Array,     # (C, F)
    in_scale: Optional[jax.Array],
    in_shift: Optional[jax.Array],
    p: int,
    c: int,
    drop_rate: float = 0.0,
    drop_seed: Optional[jax.Array] = None,
    halo: Optional[jax.Array] = None,   # (B, 2, Wp, pC) z-space halo rows
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(y_packed, sum, sumsq); operands packed with a caller-chosen p."""
    b, h, wp, pc = xp.shape
    f = pww.shape[1]
    w = wp * p
    in_affine = in_scale is not None
    drop = drop_rate > 0.0
    has_halo = halo is not None
    assert not (drop and in_affine), "dropout fuses on the chain input only"
    assert not (drop and has_halo), (
        "spatial chains hoist dropout outside the kernels"
    )
    if p > 1:
        dwk_p = jnp.tile(dwk, (1, 1, p))
        pww_p = jnp.kron(jnp.eye(p, dtype=pww.dtype), pww)
    else:
        dwk_p, pww_p = dwk, pww
    pf = p * f
    if in_affine:
        aff = jnp.stack(
            [jnp.tile(in_scale.astype(jnp.float32), p),
             jnp.tile(in_shift.astype(jnp.float32), p)],
            axis=0,
        )
    else:
        aff = jnp.zeros((2, pc), jnp.float32)
    # the dropout mask's int32 iota/hash temporaries add ~2 f32-sized
    # slabs of VMEM pressure — shave the tile budget when active
    tile_h = fs._pick_tile_h(
        h, wp, max(pc, pf), vmem_budget=fs.vmem_budget(4.5 if drop else 6)
    )
    n_tiles = h // tile_h
    seed_arr = jnp.reshape(
        (drop_seed if drop else jnp.int32(0)).astype(jnp.int32)
        if drop
        else jnp.int32(0),
        (1, 1),
    )
    kernel = functools.partial(
        _fwd_train_kernel,
        tile_h=tile_h,
        n_tiles=n_tiles,
        c=c,
        in_affine=in_affine,
        pack_p=p,
        drop_thresh=hd.keep_threshold(drop_rate) if drop else 0,
        inv_keep=1.0 / (1.0 - drop_rate) if drop else 1.0,
        has_halo=has_halo,
    )
    if has_halo:
        halo_arr = halo.astype(xp.dtype)
        halo_spec = pl.BlockSpec(
            (1, 2, wp, pc), lambda bi: (bi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:  # dummy: the kernel never reads it (has_halo is trace-static)
        halo_arr = jnp.zeros((1, 2, 1, 1), xp.dtype)
        halo_spec = pl.BlockSpec(
            (1, 2, 1, 1), lambda bi: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    y_p, s_p, q_p = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            halo_spec,
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, pf), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, pf), lambda bi: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, wp, pf), xp.dtype),
            jax.ShapeDtypeStruct((8, pf), jnp.float32),
            jax.ShapeDtypeStruct((8, pf), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, wp, pc), xp.dtype),
            pltpu.VMEM((2, tile_h, wp, pf), xp.dtype),
            pltpu.VMEM((8, pf), jnp.float32),
            pltpu.VMEM((8, pf), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * h * w * (9 * c + 2 * c * f),
            bytes_accessed=(b * h * w * (c + f)) * xp.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=fs.vmem_params(),
        interpret=_use_interpret(),
    )(xp, aff, dwk_p, pww_p, seed_arr, halo_arr)
    s = s_p[0].reshape(p, f).sum(axis=0)
    q = q_p[0].reshape(p, f).sum(axis=0)
    return y_p, s, q


def _fwd_train_pallas(
    x: jax.Array,
    dwk: jax.Array,     # (3, 3, C)
    pww: jax.Array,     # (C, F)
    in_scale: Optional[jax.Array],  # (C,) or None
    in_shift: Optional[jax.Array],  # (C,) or None
    drop_rate: float = 0.0,
    drop_seed: Optional[jax.Array] = None,
    halo: Optional[jax.Array] = None,   # (B, 2, W, C) z-space, unpacked
) -> Optional[Tuple[jax.Array, jax.Array, jax.Array]]:
    """(y, sum, sumsq) with optional fused input affine+ReLU; None = no fit."""
    b, h, w, c = x.shape
    f = pww.shape[1]
    p = fs._pick_pack(c, f, w)
    if p is None:
        return None
    xp = x.reshape(b, h, w // p, p * c)
    halo_p = halo.reshape(b, 2, w // p, p * c) if halo is not None else None
    y_p, s, q = _fwd_train_packed(
        xp, dwk, pww, in_scale, in_shift, p, c,
        drop_rate=drop_rate, drop_seed=drop_seed, halo=halo_p,
    )
    return y_p.reshape(b, h, w, f), s, q


# ---------------------------------------------------------------------------
# Tail kernels: affine+ReLU boundary fused with the encoder's 2x2 max pool
# ---------------------------------------------------------------------------
#
# The encoder consumes each stage's chain twice: the activation z is a skip
# connection AND the input of a 2x2 max pool (reference model/u_net.py:69).
# Composed in XLA that costs a reduce-window + a select-and-scatter backward
# plus the layout-conversion copies both induce around the Pallas outputs
# (~10 ms/step at 256px/b32 on v5e).  These kernels fuse the boundary
# affine+ReLU with the pool: the forward emits z (packed p, the skip) and
# pool(z) (packed p2 — the NEXT stage's chain layout, so the pooled tensor
# feeds the next stage with zero repacking); the backward consumes the two
# cotangents, routes the pool gradient to the first-max cell (XLA
# select-and-scatter tie semantics), applies the ReLU mask, and emits the
# last block's BN-backward reductions alongside.


_pool_sel_mats = fs._pool_sel_mats
_pool_expand_mats = fs._pool_expand_mats
_pool_tile = fs._pool_tile


def _tail_pool_kernel(
    y_hbm,      # (B, H, Wp, pF) ANY — last block's raw output
    aff_ref,    # (2, pF) VMEM: a, b (batch-stat affine, tiled p times)
    z_hbm,      # (B, H, Wp, pF) ANY — z = relu(a*y+b) (the skip)
    p_ref,      # (1, H//2, Wp, pF//2) VMEM — pool(z), packed p//2; the
                #   64-lane pooled block rides the standard pipeline (a
                #   manual DMA slice of a sub-128-lane buffer violates
                #   Mosaic's lane tiling)
    ybuf,       # scratch (2, TH, Wp, pF)
    zbuf,       # scratch (2, TH, Wp, pF)
    in_sems,    # (2,)
    z_sems,     # (2,)
    *,
    tile_h: int,
    n_tiles: int,
    p: int,
    f: int,
):
    b = pl.program_id(0)
    wp = ybuf.shape[2]
    pf = ybuf.shape[3]
    sel_e, sel_o = _pool_sel_mats(pf, f, ybuf.dtype)

    def start_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)],
            ybuf.at[slot],
            in_sems.at[slot],
        ).start()

    def wait_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)],
            ybuf.at[slot],
            in_sems.at[slot],
        ).wait()

    def z_copy(j, slot):
        return pltpu.make_async_copy(
            zbuf.at[slot],
            z_hbm.at[b, pl.ds(j * tile_h, tile_h)],
            z_sems.at[slot],
        )

    start_in(0, 0)

    def body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_tiles)
        def _():
            start_in(j + 1, jax.lax.rem(j + 1, 2))

        wait_in(j, slot)

        @pl.when(j >= 2)
        def _():
            z_copy(j - 2, slot).wait()

        zf = (
            ybuf[slot].astype(jnp.float32) * aff_ref[0][None, None, :]
            + aff_ref[1][None, None, :]
        )
        zc = jnp.maximum(zf, 0.0).astype(zbuf.dtype)
        zbuf[slot] = zc
        z_copy(j, slot).start()
        # pool over the CAST values: matches pooling the stored bf16 z
        # (cast is monotone, and the backward's argmax compares the same)
        p_ref[0, pl.ds(j * (tile_h // 2), tile_h // 2)] = _pool_tile(
            zc, tile_h, wp, pf, sel_e, sel_o
        )
        return ()

    jax.lax.fori_loop(0, n_tiles, body, (), unroll=False)

    @pl.when(n_tiles >= 2)
    def _():
        z_copy(n_tiles - 2, jax.lax.rem(n_tiles - 2, 2)).wait()

    z_copy(n_tiles - 1, jax.lax.rem(n_tiles - 1, 2)).wait()


def _tail_pool_kernel_stream(
    y_hbm,      # (B, H, Wp, pF) ANY — last block's raw output
    aff_ref,    # (2, pF) VMEM: a, b (batch-stat affine, tiled p times)
    z_hbm,      # (B, H, Wp, pF) ANY — z = relu(a*y+b) (the skip)
    p_hbm,      # (B, H//2, Wp, pF//2) ANY — pool(z), packed p//2, DMA'd
                #   per tile (pF//2 >= LANE, so manual slices keep Mosaic's
                #   lane tiling) — the resident variant's whole-batch-item
                #   pooled block doesn't fit VMEM at 1024px-class shapes
    ybuf,       # scratch (2, TH, Wp, pF)
    zbuf,       # scratch (2, TH, Wp, pF)
    pbuf,       # scratch (2, TH//2, Wp, pF//2)
    in_sems,    # (2,)
    z_sems,     # (2,)
    p_sems,     # (2,)
    *,
    tile_h: int,
    n_tiles: int,
    p: int,
    f: int,
):
    b = pl.program_id(0)
    wp = ybuf.shape[2]
    pf = ybuf.shape[3]
    th2 = tile_h // 2
    sel_e, sel_o = _pool_sel_mats(pf, f, ybuf.dtype)

    def start_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)],
            ybuf.at[slot],
            in_sems.at[slot],
        ).start()

    def wait_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)],
            ybuf.at[slot],
            in_sems.at[slot],
        ).wait()

    def z_copy(j, slot):
        return pltpu.make_async_copy(
            zbuf.at[slot],
            z_hbm.at[b, pl.ds(j * tile_h, tile_h)],
            z_sems.at[slot],
        )

    def p_copy(j, slot):
        return pltpu.make_async_copy(
            pbuf.at[slot],
            p_hbm.at[b, pl.ds(j * th2, th2)],
            p_sems.at[slot],
        )

    start_in(0, 0)

    def body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_tiles)
        def _():
            start_in(j + 1, jax.lax.rem(j + 1, 2))

        wait_in(j, slot)

        @pl.when(j >= 2)
        def _():
            z_copy(j - 2, slot).wait()
            p_copy(j - 2, slot).wait()

        zf = (
            ybuf[slot].astype(jnp.float32) * aff_ref[0][None, None, :]
            + aff_ref[1][None, None, :]
        )
        zc = jnp.maximum(zf, 0.0).astype(zbuf.dtype)
        zbuf[slot] = zc
        z_copy(j, slot).start()
        # pool over the CAST values: matches pooling the stored bf16 z
        pbuf[slot] = _pool_tile(zc, tile_h, wp, pf, sel_e, sel_o)
        p_copy(j, slot).start()
        return ()

    jax.lax.fori_loop(0, n_tiles, body, (), unroll=False)

    @pl.when(n_tiles >= 2)
    def _():
        s = jax.lax.rem(n_tiles - 2, 2)
        z_copy(n_tiles - 2, s).wait()
        p_copy(n_tiles - 2, s).wait()

    s_last = jax.lax.rem(n_tiles - 1, 2)
    z_copy(n_tiles - 1, s_last).wait()
    p_copy(n_tiles - 1, s_last).wait()


def _tail_pool_kernel_p1(
    y_hbm,      # (B, H, W, F) ANY — last block's raw output (UNPACKED)
    aff_ref,    # (2, F) VMEM: a, b
    z_hbm,      # (B, H, W, F) ANY — z = relu(a*y+b) (the skip)
    p_ref,      # (1, H//2, W//2, F) VMEM — pool(z)
    ybuf,       # scratch (2, TH, W, F)
    zbuf,       # scratch (2, TH, W, F)
    in_sems,    # (2,)
    z_sems,     # (2,)
    *,
    tile_h: int,
    n_tiles: int,
):
    """Unpacked (p=1, F >= 128) variant of :func:`_tail_pool_kernel` —
    the wide encoder stages (256/512 ch) whose chains run at pack 1.

    W-pair max WITHOUT strided slices (Mosaic lowers those as >2D
    gathers): reshape ``(th, W, F) -> (th, W/2, 2F)`` puts horizontal
    neighbours side by side in the LANE dim, so even/odd W are contiguous
    lane chunks ``[:F]``/``[F:]``; H pairs split on the leading dim.
    """
    b = pl.program_id(0)
    w = ybuf.shape[2]
    f = ybuf.shape[3]

    def start_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)],
            ybuf.at[slot],
            in_sems.at[slot],
        ).start()

    def wait_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)],
            ybuf.at[slot],
            in_sems.at[slot],
        ).wait()

    def z_copy(j, slot):
        return pltpu.make_async_copy(
            zbuf.at[slot],
            z_hbm.at[b, pl.ds(j * tile_h, tile_h)],
            z_sems.at[slot],
        )

    start_in(0, 0)

    def body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_tiles)
        def _():
            start_in(j + 1, jax.lax.rem(j + 1, 2))

        wait_in(j, slot)

        @pl.when(j >= 2)
        def _():
            z_copy(j - 2, slot).wait()

        zf = (
            ybuf[slot].astype(jnp.float32) * aff_ref[0][None, None, :]
            + aff_ref[1][None, None, :]
        )
        zc = jnp.maximum(zf, 0.0).astype(zbuf.dtype)
        zbuf[slot] = zc
        z_copy(j, slot).start()
        th2 = tile_h // 2
        # pool over the CAST values (monotone; ties match the backward)
        z4 = zc.reshape(th2, 2, w, f)
        rm = jnp.maximum(z4[:, 0], z4[:, 1])          # H pairs
        z2 = rm.reshape(th2, w // 2, 2 * f)
        pooled = jnp.maximum(z2[..., :f], z2[..., f:])  # W pairs (lanes)
        p_ref[0, pl.ds(j * th2, th2)] = pooled
        return ()

    jax.lax.fori_loop(0, n_tiles, body, (), unroll=False)

    @pl.when(n_tiles >= 2)
    def _():
        z_copy(n_tiles - 2, jax.lax.rem(n_tiles - 2, 2)).wait()

    z_copy(n_tiles - 1, jax.lax.rem(n_tiles - 1, 2)).wait()


def _tail_pool_p1(
    y: jax.Array,       # (B, H, W, F) unpacked
    a: jax.Array,       # (F,) f32
    b_: jax.Array,      # (F,) f32
) -> Optional[Tuple[jax.Array, jax.Array]]:
    """(z, pooled) for the unpacked chain boundary, or None if no tile fits."""
    bsz, h, w, f = y.shape
    if f % fs.LANE or h % 2 or w % 2:
        return None
    tile_h = _pick_tile_h_tail(h, w, f, bwd=False)
    if tile_h is None:
        return None
    n_tiles = h // tile_h
    aff = jnp.stack([a.astype(jnp.float32), b_.astype(jnp.float32)])
    kernel = functools.partial(
        _tail_pool_kernel_p1, tile_h=tile_h, n_tiles=n_tiles
    )
    z, pool = pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, h // 2, w // 2, f),
                lambda bi: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, h, w, f), y.dtype),
            jax.ShapeDtypeStruct((bsz, h // 2, w // 2, f), y.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h, w, f), y.dtype),
            pltpu.VMEM((2, tile_h, w, f), y.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=bsz * h * w * f * 5,
            bytes_accessed=int(2.25 * bsz * h * w * f) * y.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=fs.vmem_params(),
        interpret=_use_interpret(),
    )(y, aff)
    return z, pool


def _tail_pool_bwd_kernel_p1(
    y_hbm,      # (B, H, W, F) ANY — raw activations
    gs_hbm,     # (B, H, W, F) ANY — skip (z) cotangent
    gp_ref,     # (1, H//2, W//2, F) VMEM — pooled cotangent
    aff_ref,    # (4, F) VMEM: a, b, mean, rstd
    d_hbm,      # (B, H, W, F) ANY — dzt
    st_ref,     # (8, F) VMEM: row0 S, row1 T
    ybuf,       # scratch (2, TH, W, F)
    gsbuf,      # scratch (2, TH, W, F)
    dbuf,       # scratch (2, TH, W, F)
    st_acc,     # scratch (8, F) f32
    in_sems,    # (2, 2)
    out_sems,   # (2,)
    *,
    tile_h: int,
    n_tiles: int,
):
    """Unpacked select-and-scatter pool backward (first-max ties), W pairs
    as contiguous lane chunks of the ``(th, W/2, 2F)`` reshape."""
    b = pl.program_id(0)
    w = ybuf.shape[2]
    f = ybuf.shape[3]

    def start_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)], ybuf.at[slot],
            in_sems.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            gs_hbm.at[b, pl.ds(j * tile_h, tile_h)], gsbuf.at[slot],
            in_sems.at[slot, 1],
        ).start()

    def wait_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)], ybuf.at[slot],
            in_sems.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            gs_hbm.at[b, pl.ds(j * tile_h, tile_h)], gsbuf.at[slot],
            in_sems.at[slot, 1],
        ).wait()

    def out_copy(j, slot):
        return pltpu.make_async_copy(
            dbuf.at[slot],
            d_hbm.at[b, pl.ds(j * tile_h, tile_h)],
            out_sems.at[slot],
        )

    st_acc[...] = jnp.zeros((8, f), jnp.float32)
    start_in(0, 0)

    def body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_tiles)
        def _():
            start_in(j + 1, jax.lax.rem(j + 1, 2))

        wait_in(j, slot)

        @pl.when(j >= 2)
        def _():
            out_copy(j - 2, slot).wait()

        yf = ybuf[slot].astype(jnp.float32)
        wlin = yf * aff_ref[0][None, None, :] + aff_ref[1][None, None, :]
        # fwd tie parity: compare the EXACT cast values — but in f32
        # (Mosaic rejects bf16 cmpf); casting back up is value-preserving
        zc = jnp.maximum(wlin, 0.0).astype(ybuf.dtype).astype(jnp.float32)

        th2 = tile_h // 2
        z4 = zc.reshape(th2, 2, w, f)
        top = z4[:, 0].reshape(th2, w // 2, 2 * f)
        bot = z4[:, 1].reshape(th2, w // 2, 2 * f)
        a00, a01 = top[..., :f], top[..., f:]
        a10, a11 = bot[..., :f], bot[..., f:]
        m00 = (a00 >= a01) & (a00 >= a10) & (a00 >= a11)
        m01 = (a01 > a00) & (a01 >= a10) & (a01 >= a11)
        m10 = (a10 > a00) & (a10 > a01) & (a10 >= a11)
        m11 = (a11 > a00) & (a11 > a01) & (a11 > a10)
        gpg = gp_ref[0, pl.ds(j * th2, th2)].astype(jnp.float32)
        zero = jnp.zeros_like(gpg)
        g00 = jnp.where(m00, gpg, zero)
        g01 = jnp.where(m01, gpg, zero)
        g10 = jnp.where(m10, gpg, zero)
        g11 = jnp.where(m11, gpg, zero)
        gtop = jnp.concatenate([g00, g01], axis=-1).reshape(th2, w, f)
        gbot = jnp.concatenate([g10, g11], axis=-1).reshape(th2, w, f)
        gp_full = jnp.stack([gtop, gbot], axis=1).reshape(tile_h, w, f)

        g_z = gsbuf[slot].astype(jnp.float32) + gp_full
        dzt = jnp.where(wlin > 0, g_z, 0.0)
        yhat = (yf - aff_ref[2][None, None, :]) * aff_ref[3][None, None, :]
        st_acc[0, :] = st_acc[0, :] + jnp.sum(dzt, axis=(0, 1))
        st_acc[1, :] = st_acc[1, :] + jnp.sum(dzt * yhat, axis=(0, 1))
        dbuf[slot] = dzt.astype(dbuf.dtype)
        out_copy(j, slot).start()
        return ()

    jax.lax.fori_loop(0, n_tiles, body, (), unroll=False)

    @pl.when(n_tiles >= 2)
    def _():
        out_copy(n_tiles - 2, jax.lax.rem(n_tiles - 2, 2)).wait()

    out_copy(n_tiles - 1, jax.lax.rem(n_tiles - 1, 2)).wait()

    first = b == 0

    @pl.when(first)
    def _():
        st_ref[...] = st_acc[...]

    @pl.when(jnp.logical_not(first))
    def _():
        st_ref[...] = st_ref[...] + st_acc[...]


def _tail_pool_bwd_p1(
    y: jax.Array,       # (B, H, W, F)
    gs: jax.Array,      # (B, H, W, F)
    gp: jax.Array,      # (B, H//2, W//2, F)
    aff4: jax.Array,    # (4, F) f32
) -> Optional[Tuple[jax.Array, jax.Array]]:
    """(dzt, st (8, F)) unpacked pool backward, or None if no tile fits."""
    bsz, h, w, f = y.shape
    if f % fs.LANE or h % 2 or w % 2:
        return None
    tile_h = _pick_tile_h_tail(h, w, f, bwd=True)
    if tile_h is None:
        return None
    n_tiles = h // tile_h
    kernel = functools.partial(
        _tail_pool_bwd_kernel_p1, tile_h=tile_h, n_tiles=n_tiles
    )
    d, st = pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, h // 2, w // 2, f),
                lambda bi: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, f), lambda bi: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, h, w, f), y.dtype),
            jax.ShapeDtypeStruct((8, f), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h, w, f), y.dtype),
            pltpu.VMEM((2, tile_h, w, f), gs.dtype),
            pltpu.VMEM((2, tile_h, w, f), y.dtype),
            pltpu.VMEM((8, f), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=bsz * h * w * f * 12,
            bytes_accessed=int(3.25 * bsz * h * w * f) * y.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=fs.vmem_params(),
        interpret=_use_interpret(),
    )(y, gs, gp.astype(y.dtype), aff4.astype(jnp.float32))
    return d, st


def _pick_tile_h_tail(
    h: int, wp: int, pf: int, bwd: bool, stream: bool = False
) -> Optional[int]:
    budget = fs.vmem_budget(8)
    slack = 1.3
    n_full = 3 if not bwd else 4  # fwd: y,z + f32 temp; bwd: y,gs,d + temps
    # resident mode: the pooled (pf//2-lane) block sits in VMEM for the
    # whole batch item — (h//2, wp, pf//2) padded to a full 128-lane tile.
    # stream mode (pf//2 >= LANE only): the pooled block is DMA'd per tile
    # instead, so only its double-buffered (tile//2)-row slab counts —
    # this is what lets the 1024px-class shapes fuse at all.
    resident = 0 if stream else (h // 2) * wp * max(pf // 2, fs.LANE) * 2
    for tile in (64, 32, 16, 8, 4, 2):
        if h % tile or tile % 2:
            continue
        pooled = (
            2 * (tile // 2) * wp * max(pf // 2, fs.LANE) * 2 if stream else 0
        )
        working = (
            resident
            + pooled
            + 2 * n_full * tile * wp * pf * 2
            + (4 if bwd else 2) * tile * wp * pf * 4  # f32 temporaries
        )
        if working * slack <= budget:
            return tile
    return None


def _tail_pool_packed(
    y_p: jax.Array,      # (B, H, Wp, pF)
    a: jax.Array,        # (F,) f32 affine scale
    b_: jax.Array,       # (F,) f32 affine shift
    p: int,
    f: int,
) -> Optional[Tuple[jax.Array, jax.Array]]:
    """(z_packed_p, pooled_packed_{p//2}) or None when no even tile fits.

    The pooled output always leaves in pack p//2 (both horizontal
    neighbours share a sublane only when p >= 2); the caller repacks with
    one XLA reshape when the next stage wants a different factor."""
    bsz, h, wp, pf = y_p.shape
    if p < 2:
        return None
    stream = False
    tile_h = _pick_tile_h_tail(h, wp, pf, bwd=False)
    if tile_h is None and pf // 2 >= fs.LANE:
        # the whole-batch-item resident pooled block doesn't fit (1024px-
        # class shapes): stream the pooled output per tile instead
        stream = True
        tile_h = _pick_tile_h_tail(h, wp, pf, bwd=False, stream=True)
    if tile_h is None:
        return None
    n_tiles = h // tile_h
    aff = jnp.stack(
        [jnp.tile(a.astype(jnp.float32), p), jnp.tile(b_.astype(jnp.float32), p)]
    )
    kernel = functools.partial(
        _tail_pool_kernel_stream if stream else _tail_pool_kernel,
        tile_h=tile_h, n_tiles=n_tiles, p=p, f=f,
    )
    pool_space = pl.ANY if stream else pltpu.VMEM
    scratch = [
        pltpu.VMEM((2, tile_h, wp, pf), y_p.dtype),
        pltpu.VMEM((2, tile_h, wp, pf), y_p.dtype),
    ]
    if stream:
        scratch.append(pltpu.VMEM((2, tile_h // 2, wp, pf // 2), y_p.dtype))
    scratch += [
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if stream:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    z_p, pool_p = pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY)
            if stream
            else pl.BlockSpec(
                (1, h // 2, wp, pf // 2),
                lambda bi: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, h, wp, pf), y_p.dtype),
            jax.ShapeDtypeStruct((bsz, h // 2, wp, pf // 2), y_p.dtype),
        ),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=bsz * h * wp * pf * 5,
            bytes_accessed=int(2.25 * bsz * h * wp * pf) * y_p.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=fs.vmem_params(),
        interpret=_use_interpret(),
    )(y_p, aff)
    return z_p, pool_p


def _tail_pool_bwd_kernel(
    y_hbm,      # (B, H, Wp, pF) ANY — raw activations
    gs_hbm,     # (B, H, Wp, pF) ANY — skip (z) cotangent
    gp_ref,     # (1, H//2, Wp, pF//2) VMEM — pooled cotangent, packed
                #   p//2; rides the standard pipeline (sub-128-lane
                #   buffers can't be manually DMA-sliced)
    aff_ref,    # (4, pF) VMEM: a, b, mean, rstd
    d_hbm,      # (B, H, Wp, pF) ANY — dzt (ReLU-masked z-space gradient)
    st_ref,     # (8, pF) VMEM: row0 S=sum(dzt), row1 T=sum(dzt*yhat)
    ybuf,       # scratch (2, TH, Wp, pF)
    gsbuf,      # scratch (2, TH, Wp, pF)
    dbuf,       # scratch (2, TH, Wp, pF)
    st_acc,     # scratch (8, pF) f32
    in_sems,    # (2, 2)
    out_sems,   # (2,)
    *,
    tile_h: int,
    n_tiles: int,
    p: int,
    f: int,
):
    b = pl.program_id(0)
    wp = ybuf.shape[2]
    pf = ybuf.shape[3]
    sel_e, sel_o = _pool_sel_mats(pf, f, ybuf.dtype)
    exp_e, exp_o = _pool_expand_mats(pf, f, ybuf.dtype)

    def start_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)], ybuf.at[slot],
            in_sems.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            gs_hbm.at[b, pl.ds(j * tile_h, tile_h)], gsbuf.at[slot],
            in_sems.at[slot, 1],
        ).start()

    def wait_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)], ybuf.at[slot],
            in_sems.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            gs_hbm.at[b, pl.ds(j * tile_h, tile_h)], gsbuf.at[slot],
            in_sems.at[slot, 1],
        ).wait()

    def out_copy(j, slot):
        return pltpu.make_async_copy(
            dbuf.at[slot],
            d_hbm.at[b, pl.ds(j * tile_h, tile_h)],
            out_sems.at[slot],
        )

    st_acc[...] = jnp.zeros((8, pf), jnp.float32)
    start_in(0, 0)

    def body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_tiles)
        def _():
            start_in(j + 1, jax.lax.rem(j + 1, 2))

        wait_in(j, slot)

        @pl.when(j >= 2)
        def _():
            out_copy(j - 2, slot).wait()

        yf = ybuf[slot].astype(jnp.float32)
        w = yf * aff_ref[0][None, None, :] + aff_ref[1][None, None, :]
        zc = jnp.maximum(w, 0.0).astype(ybuf.dtype)  # cast: fwd tie parity

        # window cells in row-major order (00, 01, 10, 11); the pool
        # gradient goes to the FIRST max (select-and-scatter semantics).
        # Horizontal neighbours are even/odd f-chunks of the lane dim
        # (p >= 2), so selection/scatter run as exact 0/1 matmuls — no
        # strided slices (Mosaic would lower those as >2D gathers).
        th2 = tile_h // 2
        pfh = pf // 2
        zc2 = zc.reshape(tile_h * wp, pf)
        zE = jax.lax.dot(zc2, sel_e, preferred_element_type=jnp.float32)
        zO = jax.lax.dot(zc2, sel_o, preferred_element_type=jnp.float32)
        zE = zE.reshape(th2, 2, wp, pfh)
        zO = zO.reshape(th2, 2, wp, pfh)
        a00, a10 = zE[:, 0], zE[:, 1]
        a01, a11 = zO[:, 0], zO[:, 1]
        m00 = (a00 >= a01) & (a00 >= a10) & (a00 >= a11)
        m01 = (a01 > a00) & (a01 >= a10) & (a01 >= a11)
        m10 = (a10 > a00) & (a10 > a01) & (a10 >= a11)
        m11 = (a11 > a00) & (a11 > a01) & (a11 > a10)
        gpg = gp_ref[0, pl.ds(j * th2, th2)]
        zero = jnp.zeros_like(gpg)
        g00 = jnp.where(m00, gpg, zero)
        g01 = jnp.where(m01, gpg, zero)
        g10 = jnp.where(m10, gpg, zero)
        g11 = jnp.where(m11, gpg, zero)
        lg = jnp.stack([g00, g10], axis=1).reshape(tile_h * wp, pfh)
        rg = jnp.stack([g01, g11], axis=1).reshape(tile_h * wp, pfh)
        gp_full = (
            jax.lax.dot(lg, exp_e, preferred_element_type=jnp.float32)
            + jax.lax.dot(rg, exp_o, preferred_element_type=jnp.float32)
        ).reshape(tile_h, wp, pf)

        g_z = gsbuf[slot].astype(jnp.float32) + gp_full.astype(jnp.float32)
        dzt = jnp.where(w > 0, g_z, 0.0)
        yhat = (yf - aff_ref[2][None, None, :]) * aff_ref[3][None, None, :]
        st_acc[0, :] = st_acc[0, :] + jnp.sum(dzt, axis=(0, 1))
        st_acc[1, :] = st_acc[1, :] + jnp.sum(dzt * yhat, axis=(0, 1))
        dbuf[slot] = dzt.astype(dbuf.dtype)
        out_copy(j, slot).start()
        return ()

    jax.lax.fori_loop(0, n_tiles, body, (), unroll=False)

    @pl.when(n_tiles >= 2)
    def _():
        out_copy(n_tiles - 2, jax.lax.rem(n_tiles - 2, 2)).wait()

    out_copy(n_tiles - 1, jax.lax.rem(n_tiles - 1, 2)).wait()

    first = b == 0

    @pl.when(first)
    def _():
        st_ref[...] = st_acc[...]

    @pl.when(jnp.logical_not(first))
    def _():
        st_ref[...] = st_ref[...] + st_acc[...]


def _tail_pool_bwd_kernel_stream(
    y_hbm,      # (B, H, Wp, pF) ANY — raw activations
    gs_hbm,     # (B, H, Wp, pF) ANY — skip (z) cotangent
    gp_hbm,     # (B, H//2, Wp, pF//2) ANY — pooled cotangent, packed
                #   p//2, streamed per tile (pF//2 >= LANE): the resident
                #   whole-batch-item block doesn't fit VMEM at
                #   1024px-class shapes
    aff_ref,    # (4, pF) VMEM: a, b, mean, rstd
    d_hbm,      # (B, H, Wp, pF) ANY — dzt (ReLU-masked z-space gradient)
    st_ref,     # (8, pF) VMEM: row0 S=sum(dzt), row1 T=sum(dzt*yhat)
    ybuf,       # scratch (2, TH, Wp, pF)
    gsbuf,      # scratch (2, TH, Wp, pF)
    gpbuf,      # scratch (2, TH//2, Wp, pF//2)
    dbuf,       # scratch (2, TH, Wp, pF)
    st_acc,     # scratch (8, pF) f32
    in_sems,    # (2, 3)
    out_sems,   # (2,)
    *,
    tile_h: int,
    n_tiles: int,
    p: int,
    f: int,
):
    b = pl.program_id(0)
    wp = ybuf.shape[2]
    pf = ybuf.shape[3]
    th2 = tile_h // 2
    sel_e, sel_o = _pool_sel_mats(pf, f, ybuf.dtype)
    exp_e, exp_o = _pool_expand_mats(pf, f, ybuf.dtype)

    def start_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)], ybuf.at[slot],
            in_sems.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            gs_hbm.at[b, pl.ds(j * tile_h, tile_h)], gsbuf.at[slot],
            in_sems.at[slot, 1],
        ).start()
        pltpu.make_async_copy(
            gp_hbm.at[b, pl.ds(j * th2, th2)], gpbuf.at[slot],
            in_sems.at[slot, 2],
        ).start()

    def wait_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)], ybuf.at[slot],
            in_sems.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            gs_hbm.at[b, pl.ds(j * tile_h, tile_h)], gsbuf.at[slot],
            in_sems.at[slot, 1],
        ).wait()
        pltpu.make_async_copy(
            gp_hbm.at[b, pl.ds(j * th2, th2)], gpbuf.at[slot],
            in_sems.at[slot, 2],
        ).wait()

    def out_copy(j, slot):
        return pltpu.make_async_copy(
            dbuf.at[slot],
            d_hbm.at[b, pl.ds(j * tile_h, tile_h)],
            out_sems.at[slot],
        )

    st_acc[...] = jnp.zeros((8, pf), jnp.float32)
    start_in(0, 0)

    def body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_tiles)
        def _():
            start_in(j + 1, jax.lax.rem(j + 1, 2))

        wait_in(j, slot)

        @pl.when(j >= 2)
        def _():
            out_copy(j - 2, slot).wait()

        yf = ybuf[slot].astype(jnp.float32)
        w = yf * aff_ref[0][None, None, :] + aff_ref[1][None, None, :]
        zc = jnp.maximum(w, 0.0).astype(ybuf.dtype)  # cast: fwd tie parity

        # first-max select-and-scatter via the same 0/1 matmuls as the
        # resident kernel — only the gp source differs (streamed slab)
        pfh = pf // 2
        zc2 = zc.reshape(tile_h * wp, pf)
        zE = jax.lax.dot(zc2, sel_e, preferred_element_type=jnp.float32)
        zO = jax.lax.dot(zc2, sel_o, preferred_element_type=jnp.float32)
        zE = zE.reshape(th2, 2, wp, pfh)
        zO = zO.reshape(th2, 2, wp, pfh)
        a00, a10 = zE[:, 0], zE[:, 1]
        a01, a11 = zO[:, 0], zO[:, 1]
        m00 = (a00 >= a01) & (a00 >= a10) & (a00 >= a11)
        m01 = (a01 > a00) & (a01 >= a10) & (a01 >= a11)
        m10 = (a10 > a00) & (a10 > a01) & (a10 >= a11)
        m11 = (a11 > a00) & (a11 > a01) & (a11 > a10)
        gpg = gpbuf[slot]
        zero = jnp.zeros_like(gpg)
        g00 = jnp.where(m00, gpg, zero)
        g01 = jnp.where(m01, gpg, zero)
        g10 = jnp.where(m10, gpg, zero)
        g11 = jnp.where(m11, gpg, zero)
        lg = jnp.stack([g00, g10], axis=1).reshape(tile_h * wp, pfh)
        rg = jnp.stack([g01, g11], axis=1).reshape(tile_h * wp, pfh)
        gp_full = (
            jax.lax.dot(lg, exp_e, preferred_element_type=jnp.float32)
            + jax.lax.dot(rg, exp_o, preferred_element_type=jnp.float32)
        ).reshape(tile_h, wp, pf)

        g_z = gsbuf[slot].astype(jnp.float32) + gp_full.astype(jnp.float32)
        dzt = jnp.where(w > 0, g_z, 0.0)
        yhat = (yf - aff_ref[2][None, None, :]) * aff_ref[3][None, None, :]
        st_acc[0, :] = st_acc[0, :] + jnp.sum(dzt, axis=(0, 1))
        st_acc[1, :] = st_acc[1, :] + jnp.sum(dzt * yhat, axis=(0, 1))
        dbuf[slot] = dzt.astype(dbuf.dtype)
        out_copy(j, slot).start()
        return ()

    jax.lax.fori_loop(0, n_tiles, body, (), unroll=False)

    @pl.when(n_tiles >= 2)
    def _():
        out_copy(n_tiles - 2, jax.lax.rem(n_tiles - 2, 2)).wait()

    out_copy(n_tiles - 1, jax.lax.rem(n_tiles - 1, 2)).wait()

    first = b == 0

    @pl.when(first)
    def _():
        st_ref[...] = st_acc[...]

    @pl.when(jnp.logical_not(first))
    def _():
        st_ref[...] = st_ref[...] + st_acc[...]


def _tail_pool_bwd_packed(
    y_p: jax.Array,     # (B, H, Wp, pF)
    gs_p: jax.Array,    # (B, H, Wp, pF)
    gp_p: jax.Array,    # (B, H//2, Wp, pF//2) — pooled cotangent, pack p//2
    aff4: jax.Array,    # (4, F) f32: a, b, mean, rstd
    p: int,
    f: int,
) -> Optional[Tuple[jax.Array, jax.Array]]:
    """(dzt packed p, st (2, F) [S, T]) or None when no even tile fits."""
    bsz, h, wp, pf = y_p.shape
    if p < 2:
        return None
    stream = False
    tile_h = _pick_tile_h_tail(h, wp, pf, bwd=True)
    if tile_h is None and pf // 2 >= fs.LANE:
        # stream the pooled cotangent per tile (see the forward variant)
        stream = True
        tile_h = _pick_tile_h_tail(h, wp, pf, bwd=True, stream=True)
    if tile_h is None:
        return None
    n_tiles = h // tile_h
    aff = jnp.tile(aff4.astype(jnp.float32), (1, p))
    kernel = functools.partial(
        _tail_pool_bwd_kernel_stream if stream else _tail_pool_bwd_kernel,
        tile_h=tile_h, n_tiles=n_tiles, p=p, f=f,
    )
    scratch = [
        pltpu.VMEM((2, tile_h, wp, pf), y_p.dtype),
        pltpu.VMEM((2, tile_h, wp, pf), gs_p.dtype),
    ]
    if stream:
        scratch.append(
            pltpu.VMEM((2, tile_h // 2, wp, pf // 2), gp_p.dtype)
        )
    scratch += [
        pltpu.VMEM((2, tile_h, wp, pf), y_p.dtype),
        pltpu.VMEM((8, pf), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 3) if stream else (2, 2)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    d_p, st_p = pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY)
            if stream
            else pl.BlockSpec(
                (1, h // 2, wp, pf // 2),
                lambda bi: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, pf), lambda bi: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, h, wp, pf), y_p.dtype),
            jax.ShapeDtypeStruct((8, pf), jnp.float32),
        ),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=bsz * h * wp * pf * 12,
            bytes_accessed=int(3.25 * bsz * h * wp * pf) * y_p.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=fs.vmem_params(),
        interpret=_use_interpret(),
    )(y_p, gs_p, gp_p, aff)
    st = st_p[:2].reshape(2, p, f).sum(axis=1)
    return d_p, st


# ---------------------------------------------------------------------------
# Backward kernel: combine-in, conv backward, mask-out + BN reductions
# ---------------------------------------------------------------------------


def _bwd_train_kernel(
    x_hbm,        # (B, H, Wp, pC) ANY — block input (pre-affine form)
    g_hbm,        # (B, H, Wp, pF) ANY — raw upstream grad (see `combine`)
    y_hbm,        # (B, H, Wp, pF) ANY — block's own raw output (combine mode)
    in_aff_ref,   # (4, pC): in_scale, in_shift, in_mean, in_rstd
    comb_ref,     # (6, pF): A, B, C, mean_out, a_out, b_out
    dwk_ref,      # (3, 3, pC)
    pwt_ref,      # (pF, pC)
    seed_ref,     # (1, 1) SMEM int32: hash-dropout seed (0 when unused)
    dx_hbm,       # (B, H, Wp, pC) ANY — manual write-back
    ddw_ref,      # (16, pC)
    dpw_ref,      # (pC, pF)
    ssum_ref,     # (8, pC): row0 = sum(dz~), row1 = sum(dz~ * xhat)
    xbuf,         # scratch (2, TH+2, Wp, pC)
    gbuf,         # scratch (2, TH+2, Wp, pF)
    ybuf,         # scratch (2, TH+2, Wp, pF) (combine mode; dummy (2,1,..) else)
    dxbuf,        # scratch (2, TH, Wp, pC)
    ddw_acc,      # scratch (16, pC) f32
    dpw_acc,      # scratch (pC, pF) f32
    st_acc,       # scratch (8, pC) f32
    in_sems,      # (2, 3) — one per input stream
    out_sems,     # (2,)
    *,
    tile_h: int,
    n_tiles: int,
    super_k: int,
    c: int,
    in_affine: bool,
    combine: bool,
    mask_combine: bool,
    pack_p: int = 1,
    drop_thresh: int = 0,
    inv_keep: float = 1.0,
    phase_bf16: bool = False,
):
    """Fused chain backward for one block (see module docstring).

    ``phase_bf16`` (env ``UNET_TPU_BWD_PHASE=bf16``): round the dm panel
    and the recomputed z slab to bf16 BEFORE the per-window pixel shifts
    — the lane rotates are the expensive VPU step on packed stages and
    their cost scales with operand bytes.  Products and accumulations
    stay f32 (the taps are f32, promotion upcasts), so the only numerics
    change is one bf16 rounding of dm/z — the same rounding XLA's bf16
    conv backward applies to its operands.  Off by default.

    Builds the gradient w.r.t. the block's raw output per tile:
      combine:      gy = A*(g [* mask(a_out*y+b_out)]) + B + (y-mean_out)*C
      no combine:   gy = g  (already the raw-output gradient)
    then runs the separable-conv backward with the block's INPUT activation
    recomputed from the pre-affine x when ``in_affine``
    (``z = relu(in_scale*x + in_shift)``), writes ``dx`` — masked by
    ``relu'`` and ready as the PREVIOUS block's raw gradient — and emits
    the previous block's BN reductions sum(dz~), sum(dz~*xhat).
    """
    b = pl.program_id(0)
    wp = xbuf.shape[2]
    pc = xbuf.shape[3]
    pf = gbuf.shape[3]
    S = super_k * tile_h          # rows moved per DMA super-tile
    n_super = n_tiles // super_k

    streams = [(x_hbm, xbuf), (g_hbm, gbuf)]
    if combine:
        streams.append((y_hbm, ybuf))

    # ONE slab DMA per stream per SUPER-tile (rows [row0-1, row0+S] into
    # buf[0:S+2]), with shortened edge variants that keep the copy in
    # range and leave the virtual halo row for a zero-fill; compute then
    # walks the slab in `super_k` sub-windows of `tile_h` rows (the
    # f32 temporaries bound the compute window, the DMA efficiency wants
    # the largest transfers VMEM affords — measured on v5e the 16-row
    # DMA pattern streamed at ~280 GB/s vs ~370 GB/s for 32-row slabs).
    def _edge_cases(js, slot, base, verb):
        hbm, buf = streams[base]
        row0 = js * S
        sem = in_sems.at[slot, base]

        @pl.when(js == 0)
        def _():
            cp = pltpu.make_async_copy(
                hbm.at[b, pl.ds(0, S + 1)],
                buf.at[slot, pl.ds(1, S + 1)],
                sem,
            )
            getattr(cp, verb)()

        @pl.when(js == n_super - 1)
        def _():
            cp = pltpu.make_async_copy(
                hbm.at[b, pl.ds(row0 - 1, S + 1)],
                buf.at[slot, pl.ds(0, S + 1)],
                sem,
            )
            getattr(cp, verb)()

        @pl.when(jnp.logical_and(js > 0, js < n_super - 1))
        def _():
            cp = pltpu.make_async_copy(
                hbm.at[b, pl.ds(row0 - 1, S + 2)], buf.at[slot], sem
            )
            getattr(cp, verb)()

    def start_in(js, slot):
        for base in range(len(streams)):
            if n_super == 1:
                hbm, buf = streams[base]
                pltpu.make_async_copy(
                    hbm.at[b],
                    buf.at[slot, pl.ds(1, S)],
                    in_sems.at[slot, base],
                ).start()
            else:
                _edge_cases(js, slot, base, "start")

    def wait_in(js, slot):
        for base in range(len(streams)):
            if n_super == 1:
                hbm, buf = streams[base]
                pltpu.make_async_copy(
                    hbm.at[b],
                    buf.at[slot, pl.ds(1, S)],
                    in_sems.at[slot, base],
                ).wait()
            else:
                _edge_cases(js, slot, base, "wait")
        for _, buf in streams:
            zrow = jnp.zeros((buf.shape[2], buf.shape[3]), buf.dtype)

            @pl.when(js == 0)
            def _():
                buf[slot, 0, :, :] = zrow

            @pl.when(js == n_super - 1)
            def _():
                buf[slot, S + 1, :, :] = zrow

    def out_copy(js, slot):
        return pltpu.make_async_copy(
            dxbuf.at[slot],
            dx_hbm.at[b, pl.ds(js * S, S)],
            out_sems.at[slot],
        )

    ddw_acc[...] = jnp.zeros((16, pc), jnp.float32)
    dpw_acc[...] = jnp.zeros((pc, pf), jnp.float32)
    st_acc[...] = jnp.zeros((8, pc), jnp.float32)

    start_in(0, 0)

    def shift_pixels(rows, direction):
        zq = jnp.zeros((rows.shape[0], 1, rows.shape[2]), rows.dtype)
        width_c = c
        if direction == +1:
            q_next = jnp.concatenate([rows[:, 1:], zq], axis=1)
            if rows.shape[2] == width_c:
                return q_next
            return jnp.concatenate(
                [rows[:, :, width_c:], q_next[:, :, :width_c]], axis=-1
            )
        q_prev = jnp.concatenate([zq, rows[:, :-1]], axis=1)
        if rows.shape[2] == width_c:
            return q_prev
        tail = rows.shape[2] - width_c
        return jnp.concatenate(
            [q_prev[:, :, tail:], rows[:, :, :tail]], axis=-1
        )

    def sub_window(js, slot, k):
        """Compute one tile_h-row sub-window of the resident super-slab."""
        base = k * tile_h                 # slab-row offset of this window
        row0 = js * S + base              # global row of the window's top

        # --- build gy over the (TH+2) window ---
        g_all = gbuf[slot, pl.ds(base, tile_h + 2)]
        if combine:
            yf = ybuf[slot, pl.ds(base, tile_h + 2)].astype(jnp.float32)
            gf = g_all.astype(jnp.float32)
            if mask_combine:
                w_out = yf * comb_ref[4][None, None, :] + comb_ref[5][None, None, :]
                gf = jnp.where(w_out > 0, gf, 0.0)
            gy = (
                gf * comb_ref[0][None, None, :]
                + comb_ref[1][None, None, :]
                + (yf - comb_ref[3][None, None, :]) * comb_ref[2][None, None, :]
            )
            # the B / (y-mean)*C terms are nonzero on virtual slab rows;
            # zero them (padding rows carry no gradient).
            row_ids = jax.lax.broadcasted_iota(
                jnp.int32, (tile_h + 2, 1, 1), 0
            )
            gr = row0 + row_ids - 1
            virt = jnp.logical_or(gr < 0, gr >= n_tiles * tile_h)
            gy = jnp.where(virt, 0.0, gy)
            gy_cast = gy.astype(g_hbm.dtype)
        else:
            gy_cast = g_all

        dm = jnp.dot(
            gy_cast.reshape((tile_h + 2) * wp, pf),
            pwt_ref[...],
            preferred_element_type=jnp.float32,
        ).reshape(tile_h + 2, wp, pc)
        if phase_bf16:
            dm = dm.astype(jnp.bfloat16)

        # The W-dim shift is row-independent, so the +-1 shifted variants
        # of each slab are computed ONCE over the window and row-windowed
        # per tap — the naive per-(di,dj) formulation rebuilt 12 shifted
        # tiles per step, each a lane-rotate (the expensive part on
        # packed stages).
        dm_next = shift_pixels(dm, +1)   # pixel w+1 (for dj == 0)
        dm_prev = shift_pixels(dm, -1)   # pixel w-1 (for dj == 2)

        # dz: correlate dm with flipped taps (grad w.r.t. the conv INPUT z)
        dz = jnp.zeros((tile_h, wp, pc), jnp.float32)
        for di in range(3):
            sl = slice(2 - di, 2 - di + tile_h)
            for dj, src in ((0, dm_next), (1, dm), (2, dm_prev)):
                tap = dwk_ref[di, dj].astype(jnp.float32)
                dz = dz + src[sl] * tap[None, None, :]

        # cross-sublane column reductions ride the MXU as ones-matvecs
        # instead of VPU tree reductions
        ones_row = jnp.ones((1, tile_h * wp), jnp.float32)

        def colsum(t):
            return jax.lax.dot(
                ones_row,
                t.reshape(tile_h * wp, t.shape[-1]),
                preferred_element_type=jnp.float32,
            )[0]

        # 'merged' variants: collect every reduction operand (the 2 BN
        # streams + 9 weight-grad products) into ONE wide lane concat and
        # run a single ones-matvec over it — 11 MXU matvec launches
        # become 1 (each launch pushes the whole (thwp, pc) panel through
        # the systolic array; the width is nearly free, the launches are
        # not).  'merged_bf16' additionally rounds the products to bf16:
        # the matvec then runs at the MXU's full bf16 rate, and the f32
        # accumulation (preferred_element_type) keeps the sums stable —
        # the same rounding XLA's own bf16 conv backward applies to its
        # operands.
        prods = []

        if in_affine:
            x_center = xbuf[slot, pl.ds(base + 1, tile_h)].astype(jnp.float32)
            w_in = (
                x_center * in_aff_ref[0][None, None, :]
                + in_aff_ref[1][None, None, :]
            )
            dz = jnp.where(w_in > 0, dz, 0.0)  # dz~ = masked input grad
            xhat = (
                x_center - in_aff_ref[2][None, None, :]
            ) * in_aff_ref[3][None, None, :]
            if _BWD_COLSUM == "split":
                st_acc[0, :] = st_acc[0, :] + colsum(dz)
                st_acc[1, :] = st_acc[1, :] + colsum(dz * xhat)
            else:
                prods.append(dz)
                prods.append(dz * xhat)
        if drop_thresh:
            # chain-input dropout (first block only): regenerate the
            # forward's position-hash mask — dx w.r.t. the pre-dropout
            # input is mask * dz / keep, and the weight grads below use
            # the DROPPED input as the conv operand.
            keep_slab = hd.slab_keep_mask(
                b, row0 - 1, tile_h + 2, wp, pc,
                n_tiles * tile_h, pack_p, c, seed_ref[0, 0], drop_thresh,
            )
            dz = jnp.where(keep_slab[1 : 1 + tile_h], dz * inv_keep, 0.0)
        dxbuf[slot, pl.ds(base, tile_h)] = dz.astype(dxbuf.dtype)

        # --- weight grads: need the conv input z (recomputed from the
        # pre-affine x ONCE over the window, then row-windowed per tap) ---
        if in_affine:
            x_slab = xbuf[slot, pl.ds(base, tile_h + 2)].astype(jnp.float32)
            z_slab = jnp.maximum(
                x_slab * in_aff_ref[0][None, None, :]
                + in_aff_ref[1][None, None, :],
                0.0,
            )
            # virtual rows of the slab must stay zero in z-space
            row_ids = jax.lax.broadcasted_iota(
                jnp.int32, (tile_h + 2, 1, 1), 0
            )
            gr = row0 + row_ids - 1
            virt = jnp.logical_or(gr < 0, gr >= n_tiles * tile_h)
            z_slab = jnp.where(virt, 0.0, z_slab)
        else:
            z_slab = xbuf[slot, pl.ds(base, tile_h + 2)].astype(jnp.float32)
            if drop_thresh:
                z_slab = jnp.where(keep_slab, z_slab * inv_keep, 0.0)
        if phase_bf16:
            z_slab = z_slab.astype(jnp.bfloat16)
        z_next = shift_pixels(z_slab, +1)    # pixel w+1 (for dj == 2)
        z_prev = shift_pixels(z_slab, -1)    # pixel w-1 (for dj == 0)

        # products stay f32: one upcast of the centre dm rows (cheap)
        # keeps the bf16 phase's rounding confined to dm/z themselves
        dm_center = dm[1 : 1 + tile_h]
        if phase_bf16:
            dm_center = dm_center.astype(jnp.float32)
        m = jnp.zeros((tile_h, wp, pc), jnp.float32)
        ddw_rows = []
        for di in range(3):
            sl = slice(di, di + tile_h)
            for dj, src in ((0, z_prev), (1, z_slab), (2, z_next)):
                zs = src[sl]
                if _BWD_COLSUM == "split":
                    ddw_rows.append(colsum(zs * dm_center))
                else:
                    prods.append(zs * dm_center)
                tap = dwk_ref[di, dj].astype(jnp.float32)
                m = m + zs * tap[None, None, :]
        if _BWD_COLSUM != "split":
            wide = jnp.concatenate(prods, axis=-1)
            if _BWD_COLSUM == "merged_bf16":
                wide = wide.astype(g_hbm.dtype)
                ones_w = ones_row.astype(g_hbm.dtype)
            else:
                ones_w = ones_row
            sums = jax.lax.dot(
                ones_w,
                wide.reshape(tile_h * wp, len(prods) * pc),
                preferred_element_type=jnp.float32,
            )[0]
            chunks = [sums[i * pc : (i + 1) * pc] for i in range(len(prods))]
            if in_affine:
                st_acc[0, :] = st_acc[0, :] + chunks[0]
                st_acc[1, :] = st_acc[1, :] + chunks[1]
                ddw_rows = chunks[2:]
            else:
                ddw_rows = chunks
        ddw_tile = jnp.stack(
            ddw_rows + [jnp.zeros((pc,), jnp.float32)] * 7, axis=0
        )

        gy_center = (
            gy_cast[1 : 1 + tile_h]
            if combine
            else gbuf[slot, pl.ds(base + 1, tile_h)]
        )
        dpw_tile = jax.lax.dot_general(
            m.reshape(tile_h * wp, pc).astype(g_hbm.dtype),
            gy_center.reshape(tile_h * wp, pf),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        ddw_acc[...] = ddw_acc[...] + ddw_tile
        dpw_acc[...] = dpw_acc[...] + dpw_tile

    def body(js, _):
        slot = jax.lax.rem(js, 2)

        @pl.when(js + 1 < n_super)
        def _():
            start_in(js + 1, jax.lax.rem(js + 1, 2))

        wait_in(js, slot)

        @pl.when(js >= 2)
        def _():
            out_copy(js - 2, slot).wait()

        for k in range(super_k):
            sub_window(js, slot, k)
        out_copy(js, slot).start()
        return ()

    jax.lax.fori_loop(0, n_super, body, (), unroll=False)

    @pl.when(n_super >= 2)
    def _():
        out_copy(n_super - 2, jax.lax.rem(n_super - 2, 2)).wait()

    out_copy(n_super - 1, jax.lax.rem(n_super - 1, 2)).wait()

    first = b == 0

    @pl.when(first)
    def _():
        ddw_ref[...] = ddw_acc[...]
        dpw_ref[...] = dpw_acc[...]
        ssum_ref[...] = st_acc[...]

    @pl.when(jnp.logical_not(first))
    def _():
        ddw_ref[...] = ddw_ref[...] + ddw_acc[...]
        dpw_ref[...] = dpw_ref[...] + dpw_acc[...]
        ssum_ref[...] = ssum_ref[...] + st_acc[...]


def _pick_tile_h_bwd3(h, wp, pc, pf, combine, drop=False):
    """(compute_tile_rows, super_k): the DMA super-tile moves
    ``super_k * tile`` rows per transfer (large transfers stream ~30%
    faster than 16-row slabs on v5e), while the f32 body temporaries are
    sized by the compute tile alone."""
    budget = fs.vmem_budget(9)
    slack = 1.4
    n_pf = 2 if combine else 1
    in_row = 2 * wp * 2 * (pc + n_pf * pf)     # both slots, bf16
    out_row = 2 * wp * 2 * pc
    # body temporaries: phase 1 holds gy(f32 pf) + dm/dm_next/dm_prev +
    # dz (f32 pc); phase 2 holds dm + z/z_next/z_prev + m (f32 pc)
    per_body_row = wp * (4 * pf + 16 * pc + (4 * pf if combine else 0))
    if drop:
        # position-hash mask temporaries: iota/hash int32 + bool slab
        per_body_row += wp * 8 * pc
    fixed = pc * pf * 8
    def fits(tile, S):
        working = (
            (S + 2) * in_row + S * out_row + tile * per_body_row + fixed
        )
        return working * slack <= budget

    # largest compute tile that fits at S == tile, then grow the DMA
    # super-tile while VMEM allows (the compute tile sets the per-window
    # temporaries AND the 2-halo-row recompute overhead, so it wins ties)
    for tile in (32, 16, 8, 4, 2, 1):
        if h % tile or not fits(tile, tile):
            continue
        best_k = 1
        for k in (8, 4, 2):
            if (h // tile) % k == 0 and fits(tile, k * tile):
                best_k = k
                break
        return tile, best_k
    return 1, 1


def _bwd_train_packed(
    xp: jax.Array,      # (B, H, Wp, pC) packed
    gp: jax.Array,      # (B, H, Wp, pF) packed
    yp: Optional[jax.Array],
    dwk: jax.Array,     # (3, 3, C)
    pww: jax.Array,     # (C, F)
    in_aff: Optional[jnp.ndarray],   # (4, C) or None
    comb: Optional[jnp.ndarray],     # (6, F) or None
    mask_combine: bool,
    p: int,
    c: int,
    drop_rate: float = 0.0,
    drop_seed: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(dx_packed, ddw, dpw, stat_sums (2, C)); packed operands, chosen p."""
    b, h, wp, pc = xp.shape
    f = pww.shape[1]
    w = wp * p
    in_affine = in_aff is not None
    combine = comb is not None
    drop = drop_rate > 0.0
    assert not (drop and in_affine), "dropout fuses on the chain input only"
    pf = p * f
    if yp is None:
        yp = gp  # dummy alias when unused
    if p > 1:
        dwk_p = jnp.tile(dwk, (1, 1, p))
        pww_p = jnp.kron(jnp.eye(p, dtype=pww.dtype), pww)
    else:
        dwk_p, pww_p = dwk, pww
    pwt = pww_p.T.astype(gp.dtype)

    in_aff_p = (
        jnp.tile(in_aff.astype(jnp.float32), (1, p))
        if in_affine
        else jnp.zeros((4, pc), jnp.float32)
    )
    comb_p = (
        jnp.tile(comb.astype(jnp.float32), (1, p))
        if combine
        else jnp.zeros((6, pf), jnp.float32)
    )

    tile_h, super_k = _pick_tile_h_bwd3(h, wp, pc, pf, combine, drop=drop)
    n_tiles = h // tile_h
    S = super_k * tile_h
    seed_arr = jnp.reshape(
        drop_seed.astype(jnp.int32) if drop else jnp.int32(0), (1, 1)
    )
    kernel = functools.partial(
        _bwd_train_kernel,
        tile_h=tile_h,
        n_tiles=n_tiles,
        super_k=super_k,
        c=c,
        in_affine=in_affine,
        combine=combine,
        mask_combine=mask_combine,
        pack_p=p,
        drop_thresh=hd.keep_threshold(drop_rate) if drop else 0,
        inv_keep=1.0 / (1.0 - drop_rate) if drop else 1.0,
        phase_bf16=os.environ.get("UNET_TPU_BWD_PHASE", "f32") == "bf16",
    )
    ybuf_shape = (2, S + 2, wp, pf) if combine else (2, 1, 1, pf)
    dx_p, ddw_p, dpw_p, st_p = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((16, pc), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pc, pf), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, pc), lambda bi: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, wp, pc), xp.dtype),
            jax.ShapeDtypeStruct((16, pc), jnp.float32),
            jax.ShapeDtypeStruct((pc, pf), jnp.float32),
            jax.ShapeDtypeStruct((8, pc), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, S + 2, wp, pc), xp.dtype),
            pltpu.VMEM((2, S + 2, wp, pf), gp.dtype),
            pltpu.VMEM(ybuf_shape, gp.dtype),
            pltpu.VMEM((2, S, wp, pc), xp.dtype),
            pltpu.VMEM((16, pc), jnp.float32),
            pltpu.VMEM((pc, pf), jnp.float32),
            pltpu.VMEM((8, pc), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * h * w * (4 * c * f + 27 * c),
            bytes_accessed=(xp.size * 2 + gp.size * (2 if combine else 1))
            * xp.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=fs.vmem_params(),
        interpret=_use_interpret(),
    )(xp, gp, yp, in_aff_p, comb_p, dwk_p, pwt, seed_arr)

    ddw = ddw_p[:9].reshape(3, 3, p, c).sum(axis=2)
    dpw = sum(
        dpw_p[r * c : (r + 1) * c, r * f : (r + 1) * f] for r in range(p)
    )
    st = st_p[:2].reshape(2, p, c).sum(axis=1)  # (2, C)
    return dx_p, ddw, dpw, st


def _bwd_train_pallas(
    x: jax.Array,
    g: jax.Array,
    y: Optional[jax.Array],
    dwk: jax.Array,
    pww: jax.Array,
    in_aff: Optional[jnp.ndarray],   # (4, C) or None
    comb: Optional[jnp.ndarray],     # (6, F) or None
    mask_combine: bool,
    drop_rate: float = 0.0,
    drop_seed: Optional[jax.Array] = None,
) -> Optional[Tuple[jax.Array, jax.Array, jax.Array, jax.Array]]:
    """Returns (dx, ddw, dpw, stat_sums (2, C)) or None when no packing fits."""
    b, h, w, c = x.shape
    f = pww.shape[1]
    p = fs._pick_pack(c, f, w)
    if p is None:
        return None
    wp, pc, pf = w // p, p * c, p * f
    xp = x.reshape(b, h, wp, pc)
    gp = g.reshape(b, h, wp, pf)
    yp = y.reshape(b, h, wp, pf) if comb is not None else None
    dx_p, ddw, dpw, st = _bwd_train_packed(
        xp, gp, yp, dwk, pww, in_aff, comb, mask_combine, p, c,
        drop_rate=drop_rate, drop_seed=drop_seed,
    )
    return dx_p.reshape(b, h, w, c), ddw, dpw, st


# ---------------------------------------------------------------------------
# Chain orchestration (custom VJP) + composed-XLA reference
# ---------------------------------------------------------------------------


def _affine_from_stats(gamma, beta, mean, var, eps):
    a = (gamma * jax.lax.rsqrt(var + eps)).astype(jnp.float32)
    b = (beta - mean * a).astype(jnp.float32)
    return a, b


def _moments(s, q, n, axis_name):
    mean = s / n
    sq = q / n
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        sq = jax.lax.pmean(sq, axis_name)
    return mean, sq - jnp.square(mean)


def _sepconv_raw(x, dwk, pww):
    """Composed-XLA sepconv with the kernels in kernel-native (3,3,C)/(C,F)."""
    y = conv_ops.depthwise_conv2d(x, dwk[..., None])
    return jnp.einsum(
        "bhwc,cf->bhwf", y, pww.astype(y.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def chain_reference(
    z_in, params, eps=1e-3, axis_name=None, drop_rate=0.0, drop_seed=None
):
    """Composed-XLA chain with identical semantics: for each block,
    sepconv -> batch moments (of the output-dtype-cast activations) ->
    normalize -> ReLU; returns (z_out, [(mean, var)] per block).
    ``drop_rate``/``drop_seed``: position-hash dropout of the chain input
    — the SAME mask the fused kernels regenerate (``ops/hash_dropout``),
    so fused-vs-reference parity stays exact with dropout on."""
    z = z_in
    if drop_rate > 0.0:
        z = hd.hash_dropout(z, drop_seed, drop_rate)
    stats = []
    n_local = z.shape[0] * z.shape[1] * z.shape[2]
    n = n_local * (
        jax.lax.psum(1, axis_name) if axis_name is not None else 1
    )
    for (dwk, pww, gamma, beta) in params:
        c = z.shape[-1]
        dwk = dwk.reshape(3, 3, c)
        pww = pww.reshape(c, pww.shape[-1])
        y = _sepconv_raw(z, dwk, pww)
        yf = y.astype(jnp.float32)
        s = jnp.sum(yf, axis=(0, 1, 2))
        q = jnp.sum(yf * yf, axis=(0, 1, 2))
        if axis_name is not None:
            s = jax.lax.psum(s, axis_name)
            q = jax.lax.psum(q, axis_name)
        mean = s / n
        var = q / n - jnp.square(mean)
        stats.append((mean, var))
        a, b = _affine_from_stats(gamma, beta, mean, var, eps)
        z = jnp.maximum(yf * a + b, 0.0).astype(z_in.dtype)
    return z, stats


# ---------------------------------------------------------------------------
# Spatial sharding (rows on a mesh axis): halo plumbing around the kernels.
#
# The TPU-native scaling of the capability the reference caps by host-
# resizing everything to 256px (reference scripts/train.py:84-88, SURVEY §5
# "long-context analog"): inside shard_map with image rows sharded over
# 'spatial', every chain link exchanges ONE z-space boundary row per side
# with its mesh neighbours over ICI (ppermute) and the forward kernels
# inject it in place of their zero-filled virtual row — exact 'same'-conv
# semantics with zero extra HBM traffic.  The backward reconstructs each
# link's boundary gy row at the JAX level (2 rows, negligible), derives the
# cross-shard gradient d_halo + the halo corrections to the weight grads
# via jax.vjp of :func:`_halo_row_contrib`, and routes d_halo with the
# reverse ppermute.  BN batch moments are global by construction: the
# kernels' sums cover exactly the shard's OWN rows and ``axis_name`` may be
# a tuple like ('data', 'spatial'), so the existing psums produce the
# global-batch moments.
# ---------------------------------------------------------------------------


def _edge_halo_exchange(top_row, bot_row, spatial):
    """Exchange shard boundary rows over the ``spatial`` mesh axis.

    ``top_row``/``bot_row``: this shard's OWN first/last row
    ``(B, 1, Wp, pC)`` in the conv-input (z) space.  Returns
    ``(B, 2, Wp, pC)``: row 0 = the halo ABOVE the shard (upper
    neighbour's bottom row), row 1 = the halo BELOW.  ppermute zero-fills
    shards with no source, which at the global image edge IS the 'same'
    zero padding."""
    n = jax.lax.axis_size(spatial)
    down = [(i, i + 1) for i in range(n - 1)]
    up = [(i + 1, i) for i in range(n - 1)]
    htop = jax.lax.ppermute(bot_row, spatial, down)
    hbot = jax.lax.ppermute(top_row, spatial, up)
    return jnp.concatenate([htop, hbot], axis=1)


def _unpack_row(row: jax.Array, p: int) -> jax.Array:
    """Packed (B, n, Wp, pC) rows -> logical (B, n, W, C) (pure reshape)."""
    if p <= 1:
        return row
    b, nr, wp, pc = row.shape
    return row.reshape(b, nr, wp * p, pc // p)


def _repack_row(row: jax.Array, p: int) -> jax.Array:
    if p <= 1:
        return row
    b, nr, w, c = row.shape
    return row.reshape(b, nr, w // p, p * c)


def _halo_row_contrib(h_row: jax.Array, ktap: jax.Array, pww: jax.Array):
    """Contribution of one out-of-shard (halo) row to the adjacent output
    row of a 'same' 3x3 separable conv: the halo row correlated with one
    H-tap triple of the depthwise kernel, then the pointwise matmul.

    ``h_row``: (B, 1, W, C) f32 (``dwk[0]`` pairs with the TOP halo,
    ``dwk[2]`` with the BOTTOM); differentiated under ``jax.vjp`` in
    :func:`_chain_bwd_links` to produce d_halo (the cross-shard gradient)
    and the halo corrections to the depthwise/pointwise weight grads the
    kernels computed with zero virtual rows."""
    z = jnp.zeros_like(h_row[:, :, :1])
    prev = jnp.concatenate([z, h_row[:, :, :-1]], axis=2)   # value at w-1
    nxt = jnp.concatenate([h_row[:, :, 1:], z], axis=2)     # value at w+1
    m = prev * ktap[0] + h_row * ktap[1] + nxt * ktap[2]
    return jnp.einsum(
        "bhwc,cf->bhwf", m, pww, preferred_element_type=jnp.float32
    )


def _flatten_params(blocks):
    out = []
    for blk in blocks:
        out.extend(blk)
    return tuple(out)


def _unflatten_params(flat):
    return tuple(
        tuple(flat[i : i + 4]) for i in range(0, len(flat), 4)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def _chain_core(
    n_blocks, eps, axis_name, spatial, pool_p2, in_p, drop_rate,
    z_in, drop_seed, *flat_params,
):
    """Returns (z_out, ((mean, var), ...) per block); with ``pool_p2``
    returns (z_out_packed, pooled_packed, stats) — see
    :func:`fused_chain_train_pool`.  ``drop_rate`` > 0 applies
    position-hash dropout (``ops/hash_dropout.py``) to the CHAIN INPUT
    inside the first block's kernels (forward applies the mask in VMEM
    right after the slab DMA; backward regenerates it bit-identically
    from absolute coordinates + ``drop_seed``).  ``spatial``: mesh axis
    name carrying sharded image rows — every link exchanges 1-row z-space
    halos with its neighbours (see the spatial-sharding section above)."""
    outputs, _ = _chain_fwd_impl(
        n_blocks, eps, axis_name, spatial, pool_p2, in_p, drop_rate,
        z_in, drop_seed, flat_params,
    )
    return outputs


def _chain_channels(z_in, blocks):
    chans = [z_in.shape[-1]]
    for (_, pww, _, _) in blocks:
        chans.append(pww.shape[1])
    return chans


def _chain_fwd_impl(
    n_blocks, eps, axis_name, spatial, pool_p2, in_p, drop_rate,
    z_in, drop_seed, flat_params,
):
    """Returns ((z_out[, pooled], mean/var per block), residuals).

    When one pack factor aligns every channel count in the chain, the
    blocks exchange PACKED (B, H, W/p, p*C) tensors directly — kernel to
    kernel, zero reshapes — and the residuals are saved packed so the
    backward kernels stream them as-is.

    ``in_p``: the input is ALREADY packed (B, H, W/in_p, in_p*C) — the
    previous encoder stage's fused pool emitted it in this stage's layout.
    ``pool_p2``: fuse the boundary affine+ReLU with the 2x2 max pool and
    return (z_packed_p, pooled_packed_p2, stats) instead of materializing
    the unpacked activation.
    """
    blocks = _unflatten_params(flat_params)
    if in_p:
        b, h, wp0, pc0 = z_in.shape
        w = wp0 * in_p
        p = in_p
        # any caller-chosen pack is fine as long as every link's lane
        # count tiles (the kernels are parameterized by p); a pack wider
        # than the minimal one costs p-fold block-diagonal redundancy in
        # the pointwise matmuls — callers trade that off against layout
        # conversions (e.g. the fused upconcat feed emits p=2 directly)
        chans = [pc0 // in_p] + [blk[1].shape[-1] for blk in blocks]
        assert all((in_p * c) % fs.LANE == 0 for c in chans) and (
            w % in_p == 0
        ), f"in_p={in_p} does not tile chain channels {chans} at w={w}"
        z_first = z_in
    else:
        b, h, w, _ = z_in.shape
        p = _chain_common_pack(_chain_channels(z_in, blocks), w) or 1
        if p > 1:
            z_first = z_in.reshape(b, h, w // p, p * z_in.shape[-1])
        else:
            z_first = z_in
    n_local = b * h * w
    n = n_local * (
        jax.lax.psum(1, axis_name) if axis_name is not None else 1
    )

    assert not (spatial is not None and drop_rate > 0.0), (
        "spatial chains hoist dropout outside the kernels "
        "(models/unet.py applies it at the XLA level)"
    )
    z_or_y = z_first       # raw input (z-space) for the first block
    in_aff = None          # (a, b) pending affine for the next conv
    ys = []                # raw outputs per block (packed iff p > 1)
    stats = []             # (mean, var) per block
    halos = []             # per link: (B, 2, Wp, pC) z-space, or None
    for bk, (dwk, pww, gamma, beta) in enumerate(blocks):
        c = dwk.shape[2]
        dr = drop_rate if bk == 0 else 0.0   # dropout = chain input only
        if spatial is not None:
            # this link's conv input in z-space at the shard boundary:
            # link 0 consumes z_first directly; later links derive it
            # from the previous raw output + its pending affine (2 rows)
            if bk == 0:
                top, bot = z_or_y[:, :1], z_or_y[:, -1:]
            else:
                a_t = jnp.tile(in_aff[0], p) if p > 1 else in_aff[0]
                b_t = jnp.tile(in_aff[1], p) if p > 1 else in_aff[1]

                def _zrow(r):
                    return jnp.maximum(
                        r.astype(jnp.float32) * a_t + b_t, 0.0
                    ).astype(z_or_y.dtype)

                top, bot = _zrow(z_or_y[:, :1]), _zrow(z_or_y[:, -1:])
            halo = _edge_halo_exchange(top, bot, spatial)
        else:
            halo = None
        halos.append(halo)
        if p > 1:
            y, s, q = _fwd_train_packed(
                z_or_y,
                dwk,
                pww,
                in_aff[0] if in_aff is not None else None,
                in_aff[1] if in_aff is not None else None,
                p,
                c,
                drop_rate=dr,
                drop_seed=drop_seed if dr else None,
                halo=halo,
            )
        else:
            fused = _fwd_train_pallas(
                z_or_y,
                dwk,
                pww,
                in_aff[0] if in_aff is not None else None,
                in_aff[1] if in_aff is not None else None,
                drop_rate=dr,
                drop_seed=drop_seed if dr else None,
                halo=halo,
            )
            if fused is None:
                _warn_fallback(
                    f"forward link (shape {tuple(z_or_y.shape)} -> "
                    f"{pww.shape[1]}ch, unpacked)"
                )
                z = z_or_y
                if dr:
                    # same mask as the kernels: logical coords + seed
                    z = hd.hash_dropout(z, drop_seed, dr)
                if in_aff is not None:
                    z = jnp.maximum(
                        z_or_y.astype(jnp.float32) * in_aff[0] + in_aff[1],
                        0.0,
                    ).astype(z_or_y.dtype)
                if halo is not None:
                    # halo-augmented slab: the aug's own 'same' padding
                    # only corrupts the two rows sliced away
                    z_aug = jnp.concatenate(
                        [halo[:, :1].astype(z.dtype), z,
                         halo[:, 1:].astype(z.dtype)],
                        axis=1,
                    )
                    y = _sepconv_raw(z_aug, dwk, pww)[:, 1:-1]
                else:
                    y = _sepconv_raw(z, dwk, pww)
                yf = y.astype(jnp.float32)
                s = jnp.sum(yf, axis=(0, 1, 2))
                q = jnp.sum(yf * yf, axis=(0, 1, 2))
            else:
                y, s, q = fused
        if axis_name is not None:
            s = jax.lax.psum(s, axis_name)
            q = jax.lax.psum(q, axis_name)
        mean = s / n
        var = q / n - jnp.square(mean)
        stats.append((mean, var))
        ys.append(y)
        in_aff = _affine_from_stats(gamma, beta, mean, var, eps)
        z_or_y = y
    # boundary: materialize the final activation — fused with the 2x2 max
    # pool (encoder stages) or as one elementwise pass + unpack reshape
    y_last = ys[-1]
    f_last = blocks[-1][1].shape[1]
    a_last, b_last = in_aff
    tail_ok = (
        pool_p2
        and p >= 2
        and (p * f_last) % fs.LANE == 0
        and h % 2 == 0
        and (w // 2) % pool_p2 == 0
    )
    if tail_ok:
        fused_tail = _tail_pool_packed(y_last, a_last, b_last, p, f_last)
    elif pool_p2 == 1 and p == 1 and h % 2 == 0:
        # wide stages (256/512 ch) run unpacked; their pool tail fuses too
        fused_tail = _tail_pool_p1(y_last, a_last, b_last)
    else:
        fused_tail = None
    if pool_p2:
        if fused_tail is None:
            # composed-XLA fallback with identical numerics
            _warn_fallback(
                f"pool tail (h={h}, w={w}, p={p}, f={f_last})"
            )
            a_t = jnp.tile(a_last, p) if p > 1 else a_last
            b_t = jnp.tile(b_last, p) if p > 1 else b_last
            z_p = jnp.maximum(
                y_last.astype(jnp.float32) * a_t + b_t, 0.0
            ).astype(z_in.dtype)
            z_unp = z_p.reshape(b, h, w, f_last) if p > 1 else z_p
            pooled = jax.lax.reduce_window(
                z_unp, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID",
            )
            pooled = pooled.reshape(
                b, h // 2, (w // 2) // pool_p2, pool_p2 * f_last
            )
            z_p = z_unp.reshape(b, h, w // p, p * f_last) if p > 1 else z_unp
        else:
            z_p, pooled = fused_tail
            if p == 1:
                pass  # p1 kernel already emits (B, H/2, W/2, F)
            elif pool_p2 != p // 2:
                # kernel emits pack p//2; one XLA repack to the next
                # stage's factor (stage boundaries where channel counts
                # don't exactly double, e.g. the padded 3-channel stage)
                pooled = pooled.reshape(b, h // 2, w // 2, f_last).reshape(
                    b, h // 2, (w // 2) // pool_p2, pool_p2 * f_last
                )
        outputs = (z_p, pooled, tuple(stats))
    else:
        if p > 1:
            a_last = jnp.tile(a_last, p)
            b_last = jnp.tile(b_last, p)
        z_out = jnp.maximum(
            y_last.astype(jnp.float32) * a_last + b_last, 0.0
        ).astype(z_in.dtype)
        if p > 1:
            z_out = z_out.reshape(b, h, w, f_last)
        outputs = (z_out, tuple(stats))
    residuals = (
        z_first, tuple(ys), tuple(stats), flat_params, n, p, drop_seed,
        tuple(halos),
    )
    return outputs, residuals


def _chain_fwd(
    n_blocks, eps, axis_name, spatial, pool_p2, in_p, drop_rate,
    z_in, drop_seed, *flat_params,
):
    outputs, residuals = _chain_fwd_impl(
        n_blocks, eps, axis_name, spatial, pool_p2, in_p, drop_rate,
        z_in, drop_seed, flat_params,
    )
    return outputs, residuals


def _chain_bwd(
    n_blocks, eps, axis_name, spatial, pool_p2, in_p, drop_rate,
    residuals, cotangents,
):
    z_first, ys, stats, flat_params, n, p, drop_seed, halos = residuals
    if pool_p2:
        g_zout, g_pool, stats_cot = cotangents
    else:
        g_zout, stats_cot = cotangents
        g_pool = None
    blocks = _unflatten_params(flat_params)

    def psum_if(v):
        return jax.lax.psum(v, axis_name) if axis_name is not None else v

    def tile_p(v):
        return jnp.tile(v, p) if p > 1 else v

    def group_sum(v, f):
        return v.reshape(p, f).sum(axis=0) if p > 1 else v

    # --- boundary: reductions of the masked output gradient.  With the
    # fused pool: one Pallas kernel routes the pool cotangent to the
    # first-max cell, adds the skip cotangent, applies the ReLU mask and
    # emits S/T.  Without: an XLA pass fusing into one read of
    # (g_zout, y_last) on the packed forms. ---
    k = n_blocks - 1
    _, pww_last, gamma, beta = blocks[k]
    f_last = pww_last.shape[1]
    mean, var = stats[k]
    r = jax.lax.rsqrt(var + eps)
    a_out = (gamma * r).astype(jnp.float32)
    b_out = (beta - mean * a_out).astype(jnp.float32)

    g_is_masked = False   # whether g_raw already has the ReLU mask applied
    if pool_p2:
        # cotangents arrive packed: g_zout (B,H,Wp,pF), g_pool packed p2
        aff4 = jnp.stack(
            [
                a_out,
                b_out,
                mean.astype(jnp.float32),
                r.astype(jnp.float32),
            ]
        )
        if p >= 2 and (p * f_last) % fs.LANE == 0:
            gp_ph = g_pool
            if pool_p2 != p // 2:
                # repack the pooled cotangent to the kernel's p//2 layout
                bsz_, h2_, _, _ = g_pool.shape
                w2_ = g_pool.shape[2] * pool_p2
                gp_ph = g_pool.reshape(bsz_, h2_, w2_, f_last).reshape(
                    bsz_, h2_, w2_ // (p // 2), (p // 2) * f_last
                )
            fused_tail = _tail_pool_bwd_packed(
                ys[k], g_zout.astype(ys[k].dtype),
                gp_ph.astype(ys[k].dtype), aff4, p, f_last,
            )
        elif p == 1 and pool_p2 == 1:
            fused_tail = _tail_pool_bwd_p1(
                ys[k], g_zout.astype(ys[k].dtype), g_pool, aff4
            )
        else:
            fused_tail = None
        if fused_tail is None:
            # XLA fallback: vjp through the same pool (identical ties)
            _warn_fallback(f"pool-tail backward (p={p}, f={f_last})")
            bsz, h_, wp_, pf_ = ys[k].shape
            w_ = wp_ * p
            yk = ys[k].astype(jnp.float32)
            wlin = yk * tile_p(a_out) + tile_p(b_out)
            z_unp = jnp.maximum(wlin, 0.0).astype(ys[k].dtype).reshape(
                bsz, h_, w_, f_last
            )

            def pool_fn(z):
                return jax.lax.reduce_window(
                    z, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID",
                )

            _, pool_vjp = jax.vjp(pool_fn, z_unp)
            (g_from_pool,) = pool_vjp(
                g_pool.reshape(bsz, h_ // 2, w_ // 2, f_last).astype(
                    z_unp.dtype
                )
            )
            g_z = g_zout.astype(jnp.float32) + g_from_pool.reshape(
                bsz, h_, wp_, pf_
            ).astype(jnp.float32)
            dzt = jnp.where(wlin > 0, g_z, 0.0)
            S_loc = group_sum(jnp.sum(dzt, axis=(0, 1, 2)), f_last)
            T_loc = group_sum(
                jnp.sum(
                    dzt * ((yk - tile_p(mean)) * tile_p(r)),
                    axis=(0, 1, 2),
                ),
                f_last,
            )
            g_raw = dzt.astype(ys[k].dtype)
        else:
            dzt_p, st = fused_tail
            S_loc, T_loc = st[0], st[1]
            g_raw = dzt_p
        g_is_masked = True
    else:
        if p > 1:
            bsz, h, w, _ = g_zout.shape
            g_zout = g_zout.reshape(bsz, h, w // p, p * f_last)
        yk = ys[k].astype(jnp.float32)
        gz = g_zout.astype(jnp.float32)
        dzt = jnp.where((yk * tile_p(a_out) + tile_p(b_out)) > 0, gz, 0.0)
        S_loc = group_sum(jnp.sum(dzt, axis=(0, 1, 2)), f_last)
        T_loc = group_sum(
            jnp.sum(
                dzt * ((yk - tile_p(mean)) * tile_p(r)), axis=(0, 1, 2)
            ),
            f_last,
        )
        g_raw = g_zout        # raw grad stream for the current block
    return _chain_bwd_links(
        n_blocks, eps, axis_name, in_p, drop_rate,
        blocks, stats, stats_cot, ys, z_first, n, p, drop_seed,
        g_raw, psum_if(S_loc), psum_if(T_loc), g_is_masked,
        S_loc=S_loc, T_loc=T_loc, spatial=spatial, halos=halos,
    )


def _chain_bwd_links(
    n_blocks, eps, axis_name, in_p, drop_rate,
    blocks, stats, stats_cot, ys, z_first, n, p, drop_seed,
    g_raw, S, T, g_is_masked, S_loc=None, T_loc=None,
    spatial=None, halos=None,
):
    """Backward through the chain's links given the boundary gradient.

    ``g_raw``: cotangent stream w.r.t. the last block's raw output (ReLU
    mask already applied iff ``g_is_masked``); ``S``/``T``: the BN
    backward reductions of that stream, psum'd over ``axis_name`` (the
    normalization batch is global, so the combine constants need global
    sums).  ``S_loc``/``T_loc``: the same reductions over the LOCAL shard
    only — dgamma/dbeta must be per-shard partials because the train step
    pmeans the gradient tree across the mesh (psum'd values would come out
    n_shards x too large; Adam's per-parameter scale invariance masks
    that, raw SGD would not).  None (the default) means ``axis_name`` is
    None and S/T are already local.  Shared by :func:`_chain_bwd` (whose
    boundary is the affine+ReLU [+pool] exit) and the fused head
    (:mod:`.fused_head`, whose boundary is the 1x1-conv + sigmoid + loss
    reductions).  Returns ``(dz_in, d_seed, *flat_grads)``."""

    def psum_if(v):
        return jax.lax.psum(v, axis_name) if axis_name is not None else v

    if S_loc is None:
        S_loc, T_loc = S, T
    grads_per_block = [None] * n_blocks
    dz_in = None
    for k in range(n_blocks - 1, -1, -1):
        dwk, pww, gamma, beta = blocks[k]
        mean, var = stats[k]
        g_m, g_v = stats_cot[k]  # usually symbolic zeros (running stats)
        r = jax.lax.rsqrt(var + eps)
        a_out = gamma * r
        b_out = beta - mean * a_out
        # BN backward combine constants, exact incl. the mean/var output
        # cotangents: gy = A*(masked g) + B + (y - mean)*C
        A = a_out
        B = -(a_out * S) / n + g_m / n
        C = -(a_out * r * T) / n + 2.0 * g_v / n
        dgamma = T_loc
        dbeta = S_loc

        x_in = z_first if k == 0 else ys[k - 1]
        if k > 0:
            pm, pv = stats[k - 1]
            p_gamma = blocks[k - 1][2]
            p_beta = blocks[k - 1][3]
            pr = jax.lax.rsqrt(pv + eps)
            in_a = p_gamma * pr
            in_b = p_beta - pm * in_a
            in_aff = jnp.stack(
                [
                    in_a.astype(jnp.float32),
                    in_b.astype(jnp.float32),
                    pm.astype(jnp.float32),
                    pr.astype(jnp.float32),
                ]
            )
        else:
            in_aff = None
        comb = jnp.stack(
            [
                A.astype(jnp.float32),
                B.astype(jnp.float32),
                C.astype(jnp.float32),
                mean.astype(jnp.float32),
                a_out.astype(jnp.float32),
                b_out.astype(jnp.float32),
            ]
        )

        dr = drop_rate if k == 0 else 0.0   # dropout = chain input only
        if p > 1:
            fused = _bwd_train_packed(
                x_in,
                g_raw.astype(x_in.dtype),
                ys[k].astype(x_in.dtype),
                dwk,
                pww,
                in_aff,
                comb,
                mask_combine=not g_is_masked,
                p=p,
                c=dwk.shape[2],
                drop_rate=dr,
                drop_seed=drop_seed if dr else None,
            )
        else:
            fused = _bwd_train_pallas(
                x_in,
                g_raw.astype(x_in.dtype),
                ys[k].astype(x_in.dtype),
                dwk,
                pww,
                in_aff,
                comb,
                mask_combine=not g_is_masked,
                drop_rate=dr,
                drop_seed=drop_seed if dr else None,
            )
        d_halo = None   # (d_htop, d_hbot) f32 (B, 1, W, C) when spatial
        if fused is None:
            # composed-XLA fallback for this link (identical math)
            _warn_fallback(
                f"backward link (shape {tuple(x_in.shape)} -> "
                f"{pww.shape[1]}ch)"
            )
            gf = g_raw.astype(jnp.float32)
            ykf = ys[k].astype(jnp.float32)
            if not g_is_masked:
                gf = jnp.where((ykf * a_out + b_out) > 0, gf, 0.0)
            gy = (gf * A + B + (ykf - mean) * C).astype(x_in.dtype)
            if in_aff is not None:
                zf = jnp.maximum(
                    x_in.astype(jnp.float32) * in_aff[0] + in_aff[1], 0.0
                ).astype(x_in.dtype)
            elif dr:
                # regenerate the chain-input dropout mask (p == 1 here:
                # the packed call never falls back)
                keep = hd.array_keep_mask(
                    x_in.shape, 1, x_in.shape[-1],
                    drop_seed.astype(jnp.int32), hd.keep_threshold(dr),
                )
                zf = hd.apply_keep(x_in, keep, 1.0 / (1.0 - dr))
            else:
                zf = x_in

            if spatial is not None:
                # mirror the forward's halo-augmented slab so ddw/dpw and
                # the cross-shard d_halo all come from one vjp
                ht = halos[k][:, :1].astype(zf.dtype)
                hb = halos[k][:, 1:].astype(zf.dtype)

                def _aug(z_, ht_, hb_, dwk_, pww_):
                    return _sepconv_raw(
                        jnp.concatenate([ht_, z_, hb_], axis=1), dwk_, pww_
                    )[:, 1:-1]

                _, vjp = jax.vjp(_aug, zf, ht, hb, dwk, pww)
                dz, d_ht, d_hb, ddw, dpw = vjp(gy)
                d_halo = (
                    d_ht.astype(jnp.float32), d_hb.astype(jnp.float32)
                )
            else:
                _, vjp = jax.vjp(_sepconv_raw, zf, dwk, pww)
                dz, ddw, dpw = vjp(gy)
            if in_aff is not None:
                w_in = x_in.astype(jnp.float32) * in_aff[0] + in_aff[1]
                dzt_prev = jnp.where(w_in > 0, dz.astype(jnp.float32), 0.0)
                xhat = (x_in.astype(jnp.float32) - in_aff[2]) * in_aff[3]
                S_prev_loc = jnp.sum(dzt_prev, axis=(0, 1, 2))
                T_prev_loc = jnp.sum(dzt_prev * xhat, axis=(0, 1, 2))
                dx = dzt_prev.astype(x_in.dtype)
            else:
                S_prev_loc = T_prev_loc = None
                if dr:
                    dx = hd.apply_keep(dz, keep, 1.0 / (1.0 - dr)).astype(
                        x_in.dtype
                    )
                else:
                    dx = dz.astype(x_in.dtype)
        else:
            dx, ddw, dpw, st = fused
            if in_aff is not None:
                S_prev_loc, T_prev_loc = st[0], st[1]
            else:
                S_prev_loc = T_prev_loc = None

        if spatial is not None:
            # --- cross-shard gradient flow for this link's halos ---
            if d_halo is None:
                # kernel path: rebuild gy at the two boundary rows (the
                # kernel never materializes gy) and vjp the halo taps
                gt = _unpack_row(g_raw[:, :1], p).astype(jnp.float32)
                gb = _unpack_row(g_raw[:, -1:], p).astype(jnp.float32)
                yt = _unpack_row(ys[k][:, :1], p).astype(jnp.float32)
                yb = _unpack_row(ys[k][:, -1:], p).astype(jnp.float32)
                if not g_is_masked:
                    gt = jnp.where(yt * a_out + b_out > 0, gt, 0.0)
                    gb = jnp.where(yb * a_out + b_out > 0, gb, 0.0)
                gy_t = gt * A + B + (yt - mean) * C
                gy_b = gb * A + B + (yb - mean) * C
                h_t = _unpack_row(halos[k][:, :1], p).astype(jnp.float32)
                h_b = _unpack_row(halos[k][:, 1:], p).astype(jnp.float32)
                dwk_f = dwk.astype(jnp.float32)
                pww_f = pww.astype(jnp.float32)
                _, vjp_t = jax.vjp(_halo_row_contrib, h_t, dwk_f[0], pww_f)
                d_ht, ddw_t, dpw_t = vjp_t(gy_t)
                _, vjp_b = jax.vjp(_halo_row_contrib, h_b, dwk_f[2], pww_f)
                d_hb, ddw_b, dpw_b = vjp_b(gy_b)
                # the kernels computed ddw/dpw with zero virtual rows —
                # add the halo rows' missing weight-grad terms
                ddw = ddw.at[0].add(ddw_t).at[2].add(ddw_b)
                dpw = dpw + dpw_t + dpw_b
                d_halo = (d_ht, d_hb)
            n_sp = jax.lax.axis_size(spatial)
            up = [(i + 1, i) for i in range(n_sp - 1)]
            down = [(i, i + 1) for i in range(n_sp - 1)]
            # d_htop is the cotangent of the UPPER neighbour's last row;
            # d_hbot of the LOWER neighbour's first row (z-space, unmasked)
            recv_bot = jax.lax.ppermute(d_halo[0], spatial, up)
            recv_top = jax.lax.ppermute(d_halo[1], spatial, down)
            if in_aff is not None:
                # the dx stream carries MASKED dz~ — mask the incoming
                # z-space cotangent with this shard's own boundary masks
                # and fold it into the local BN-backward reductions
                xt = _unpack_row(x_in[:, :1], p).astype(jnp.float32)
                xb = _unpack_row(x_in[:, -1:], p).astype(jnp.float32)
                w_t = xt * in_aff[0] + in_aff[1]
                w_b = xb * in_aff[0] + in_aff[1]
                add_t = jnp.where(w_t > 0, recv_top, 0.0)
                add_b = jnp.where(w_b > 0, recv_bot, 0.0)
                S_prev_loc = S_prev_loc + jnp.sum(
                    add_t, axis=(0, 1, 2)
                ) + jnp.sum(add_b, axis=(0, 1, 2))
                xhat_t = (xt - in_aff[2]) * in_aff[3]
                xhat_b = (xb - in_aff[2]) * in_aff[3]
                T_prev_loc = T_prev_loc + jnp.sum(
                    add_t * xhat_t, axis=(0, 1, 2)
                ) + jnp.sum(add_b * xhat_b, axis=(0, 1, 2))
            else:
                add_t, add_b = recv_top, recv_bot
            dx = dx.at[:, :1].add(_repack_row(add_t, p).astype(dx.dtype))
            dx = dx.at[:, -1:].add(_repack_row(add_b, p).astype(dx.dtype))

        if S_prev_loc is not None:
            S_prev = psum_if(S_prev_loc)
            T_prev = psum_if(T_prev_loc)
        else:
            S_prev = T_prev = None
        grads_per_block[k] = (
            ddw.astype(dwk.dtype),
            dpw.astype(pww.dtype),
            dgamma.astype(gamma.dtype),
            dbeta.astype(beta.dtype),
        )
        if k > 0:
            S, T = S_prev, T_prev
            S_loc, T_loc = S_prev_loc, T_prev_loc
            g_raw = dx            # already ReLU-masked by the kernel
            g_is_masked = True
        else:
            dz_in = dx

    if p > 1 and not in_p:
        # unpack the chain-input gradient once at the boundary; with a
        # packed input (in_p) the cotangent stays packed to match it
        bsz, h, wp, pc = dz_in.shape
        dz_in = dz_in.reshape(bsz, h, wp * p, pc // p)
    flat_grads = _flatten_params(grads_per_block)
    # int32 seed cotangent: float0 (no tangent space)
    d_seed = np.zeros(np.shape(drop_seed), jax.dtypes.float0)
    return (dz_in, d_seed, *flat_grads)


_chain_core.defvjp(_chain_fwd, _chain_bwd)


def _prep_blocks(z_dtype, c, blocks):
    prepped = []
    for (dw, pw, gamma, beta) in blocks:
        f = pw.shape[-1]
        prepped.append(
            (
                dw.reshape(3, 3, c).astype(z_dtype),
                pw.reshape(c, f).astype(z_dtype),
                gamma,
                beta,
            )
        )
        c = f
    return prepped


def _pad_narrow_input(z_in, blocks):
    # Narrow first-block inputs (the 3-channel image) defeat lane packing
    # and drop the whole stage to the XLA fallback. Zero-padding the input
    # channels up to the smallest count that packs is EXACT (zero channels
    # contribute nothing; autodiff slices the pad's gradients) and lets
    # the first stage run fused like every other.
    c0 = z_in.shape[-1]
    w = z_in.shape[2]
    chans = [c0] + [pw.reshape(-1, pw.shape[-1]).shape[-1] for (_, pw, _, _) in blocks]
    if _chain_common_pack(chans, w) is None:
        # prefer larger pads: pack factor (and the p-fold pointwise-matmul
        # redundancy of the block-diagonal kron) shrinks as 128/c_pad,
        # while the padded input's extra HBM traffic stays ~0.1 ms.
        for c_pad in (16, 32, 8, 4):
            if c_pad > c0 and _chain_common_pack([c_pad] + chans[1:], w):
                _, _, g0, b0 = blocks[0]
                dw0 = blocks[0][0].reshape(3, 3, c0)
                pw0 = blocks[0][1].reshape(c0, -1)
                pad_c = c_pad - c0
                blocks = [
                    (
                        jnp.pad(dw0, ((0, 0), (0, 0), (0, pad_c))),
                        jnp.pad(pw0, ((0, pad_c), (0, 0))),
                        g0,
                        b0,
                    )
                ] + list(blocks[1:])
                z_in = jnp.pad(z_in, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
                break
    return z_in, blocks


def fused_chain_train(
    z_in: jax.Array,
    blocks: Sequence[Tuple[jax.Array, jax.Array, jax.Array, jax.Array]],
    eps: float = 1e-3,
    axis_name: Optional[Any] = None,
    in_packed: Optional[int] = None,
    drop_rate: float = 0.0,
    drop_seed: Optional[jax.Array] = None,
    spatial_axis: Optional[str] = None,
):
    """Train-mode ConvBlock chain: z_in -> [sepconv -> BN -> ReLU] x N.

    ``blocks``: per block ``(depthwise (3,3,C,1) or (3,3,C), pointwise
    (1,1,C,F) or (C,F), bn_scale (F,), bn_offset (F,))``.  Returns
    ``(z_out, ((batch_mean, batch_var), ...))`` — the moments feed the
    running-stat updates.  Differentiable via the fused Pallas backward;
    per-block XLA fallback when no lane packing fits (e.g. 3-channel
    input).  ``in_packed``: the input already arrives in the chain's
    packed ``(B, H, W/p, p*C)`` layout (e.g. the decoder's fused
    upsample+concat feed) — must equal the chain's own pack factor; the
    output leaves unpacked either way.  ``drop_rate``/``drop_seed``:
    position-hash dropout of the chain INPUT, fused into the first
    block's kernels (the reference's decoder-concat Dropout,
    model/u_net.py:96-99); the mask is the pure coordinate hash of
    ``ops/hash_dropout.py``, so :func:`chain_reference` with the same
    seed reproduces it EXACTLY.  ``spatial_axis``: mesh axis name with
    image rows sharded across it (inside shard_map) — the chain exchanges
    1-row z-space halos per link over ICI, and ``axis_name`` should
    include the spatial axis (e.g. ``('data', 'spatial')``) so BN batch
    moments stay global; requires ``drop_rate == 0`` (the caller hoists
    dropout outside the chain).  Rebuilds the reference conv_block chain
    semantics (reference model/u_net.py:5-26, Keras BN eps 1e-3, biased
    variance).
    """
    if in_packed in (None, 1):
        c_orig = z_in.shape[-1]
        z_in, blocks = _pad_narrow_input(z_in, blocks)
        if drop_rate > 0.0 and z_in.shape[-1] != c_orig:
            # padded channels would shift the mask's logical coords away
            # from the oracle's — apply the (same) hash mask outside the
            # chain on the unpadded lanes instead, numerics unchanged
            dropped = hd.hash_dropout(
                z_in[..., :c_orig], drop_seed, drop_rate
            )
            z_in = jnp.pad(
                dropped, ((0, 0),) * 3 + ((0, z_in.shape[-1] - c_orig),)
            )
            drop_rate = 0.0
        in_p = None
        c0 = z_in.shape[-1]
    else:
        in_p = in_packed
        c0 = z_in.shape[-1] // in_p
    prepped = _prep_blocks(z_in.dtype, c0, blocks)
    flat = _flatten_params(prepped)
    seed = jnp.asarray(
        drop_seed if drop_seed is not None else 0, jnp.int32
    )
    return _chain_core(
        len(prepped), eps, axis_name, spatial_axis, None, in_p,
        float(drop_rate), z_in, seed, *flat,
    )


def chain_pack_of(channels, w: int) -> int:
    """Pack factor a chain with these channel counts runs at (1 = none)."""
    return _chain_common_pack(list(channels), w) or 1


def fused_chain_train_pool(
    z_in: jax.Array,
    blocks: Sequence[Tuple[jax.Array, jax.Array, jax.Array, jax.Array]],
    pool_to_pack: int,
    in_packed: "Optional[int]" = None,
    eps: float = 1e-3,
    axis_name: Optional[Any] = None,
    spatial_axis: Optional[str] = None,
):
    """Encoder variant of :func:`fused_chain_train` with the 2x2 max pool
    fused into the chain boundary.

    Returns ``(z_packed, p, pooled_packed, stats)``: ``z_packed`` is the
    stage activation in packed layout ``(B, H, W/p, p*F)`` (the skip — the
    caller unpacks with one reshape where it is consumed); ``pooled_packed``
    is ``pool(z)`` already packed with ``pool_to_pack``, so the NEXT stage
    consumes it straight back via ``in_packed=pool_to_pack`` with zero
    repacking.  Rebuilds the reference conv pair + MaxPooling2D encoder
    stage (model/u_net.py:57-69) as packed Pallas kernels end to end.
    """
    if in_packed in (None, 1):
        z_in, blocks = _pad_narrow_input(z_in, blocks)
        in_p = None
        c0 = z_in.shape[-1]
        w = z_in.shape[2]
    else:
        in_p = in_packed
        c0 = z_in.shape[-1] // in_p
        w = z_in.shape[2] * in_p
    prepped = _prep_blocks(z_in.dtype, c0, blocks)
    flat = _flatten_params(prepped)
    z_p, pooled, stats = _chain_core(
        len(prepped), eps, axis_name, spatial_axis, int(pool_to_pack),
        in_p, 0.0, z_in, jnp.int32(0), *flat,
    )
    p = _chain_common_pack(
        [c0] + [blk[1].shape[-1] for blk in prepped], w
    ) or 1
    return z_p, p, pooled, stats
