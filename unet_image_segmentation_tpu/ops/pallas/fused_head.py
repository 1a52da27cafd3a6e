"""Pallas TPU kernels: fused segmentation head + loss/metric sums.

The reference's binary head is ``1x1 Conv -> sigmoid`` followed by a dice
loss and confusion-matrix metrics (reference ``model/u_net.py:103-106``,
``utils/loss.py:9-29``, ``scripts/train.py:231-239``).  Composed in XLA
after the fused training chains, that region costs ~4.4 ms of the 256px
b32 step on v5e: the packed chain output is unpacked, relayout-copied to
a channel-major layout for the 1x1-conv matmul, the dice reductions and
the confusion matrices each re-read the full-resolution activation, and
the backward mirrors the copies.

This module runs the whole head as ONE kernel per direction on the
chain's packed ``(B, H, W/p, p*F)`` layout:

* **Forward** (:func:`head_fwd_sums`): applies the last block's pending
  BatchNorm affine + ReLU in VMEM (the chain's affine-into-kernel
  contract), computes the 1x1-conv logits as a block-diagonal MXU matmul
  into a 128-column subpixel space, takes a float32 sigmoid, and emits
  only the per-sample REDUCTIONS the loss and metrics need — dice/IoU
  sums (``I = sum(y*t)``, ``P = sum(y)``, ``T = sum(t)``), thresholded
  confusion-matrix counts (``y > 0.5``) and Keras int-cast counts
  (``y >= 1``).  The probability tensor never reaches HBM.
* **Backward** (:func:`head_bwd`): recomputes the forward in VMEM
  (flash-style), forms ``dy = dI*t + dP`` from the loss cotangents,
  applies the sigmoid/1x1-conv backward, and emits the ReLU-masked
  z-space gradient ``dzt`` PLUS the BatchNorm backward reductions
  ``S = sum(dzt)``, ``T = sum(dzt*yhat)`` the chain backward consumes —
  the boundary that was previously an extra XLA pass — and the head's
  own weight/bias gradients as column reductions.

Targets ride lane-expanded as ``(B, H, W/p, 128)`` int8 (column j =
the mask value of width-subpixel j, zero beyond ``p``) — one cheap XLA
pad outside the kernel; a compact ``(…, p)`` form would force
sub-128-lane blocks through the whole DMA pipeline.  int8 halves the
expanded tensor's HBM bytes (both kernels stream it), and binary 0/1
masks (the ``num_classes == 1`` contract) are exact; the kernels
upcast to float32 in VMEM.

The softmax head (``2 <= num_classes <= MAX_MC_CLASSES``) has the same
kernel pair (per-class dice sums, clipped-CCE sum, argmax confusion
matrix) — parity-pinned, but **measured slower than the XLA sums head**
(512px/b8 3-class: 62.8 vs 59.8 ms/step; kernel-level fwd 3.71 ms vs a
0.49 ms DMA floor): every per-class ``(N, 128)`` panel has only ``p``
live lanes (p=2 at F=64), so the ~6x pass count multiplies VPU time the
materialized-probability XLA head (a ~25 MB tensor at 512px) never
spends.  ``ModelConfig.fused_head`` therefore defaults the softmax
kernel OFF ('auto' = sigmoid only); 'all' opts in.  See DESIGN.md
"Fused multiclass head" for the full adjudication.

Numerics mirror the composed XLA head at the model's compute dtype: the
logits round to that dtype before the float32 sigmoid (``models/unet.py``
casts the conv output; ``ops/conv.py:74-81`` dots with
``preferred_element_type=x.dtype``), and the backward's ``dlogits``
round to it before the transposed matmul, exactly where the XLA einsum
vjp rounds.  With float32 compute both casts are no-ops, matching the
float32 oracle bit-for-bit in the CPU parity tests.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unet_image_segmentation_tpu.ops.pallas import fused_sepconv as fs
from unet_image_segmentation_tpu.ops.pallas import fused_train as ft
from unet_image_segmentation_tpu.ops.pallas.fused_train import _use_interpret

COLS = 128  # subpixel column space == one lane tile

# Rows of the per-sample sums output (16 rows; 9 used).
ROW_I, ROW_P, ROW_T = 0, 1, 2          # dice/IoU: sum(y*t), sum(y), sum(t)
ROW_IT, ROW_PT, ROW_TT = 3, 4, 5       # thresholded (> 0.5) CM counts
ROW_IR, ROW_PR, ROW_TR = 6, 7, 8       # Keras int-cast (floor) CM counts
N_ROWS = 16

# Multiclass panel (softmax head, 2 <= C <= 4): per-class dice sums, one
# CCE row, and the full CxC argmax confusion matrix — 3C + 1 + C^2 rows
# (<= 29 for C=4), padded to one 32-sublane tile.
N_ROWS_MC = 32
MAX_MC_CLASSES = 4

_CLIP_EPS = 1e-7  # Keras CCE probability clip (ops.losses SMOOTH)


def _mc_rows(nc: int):
    """(I_c, P_c, T_c, CCE, CM(a, b)) row indices of the multiclass panel."""
    i0, p0, t0 = 0, nc, 2 * nc
    cce = 3 * nc
    cm0 = 3 * nc + 1
    return i0, p0, t0, cce, cm0


def _pick_tile_h(h: int, wp: int, pf: int, n_bufs: int) -> Optional[int]:
    """Largest power-of-two row tile with ``n_bufs`` double-buffered slabs
    (bf16) within ~10 MB of VMEM."""
    budget = 10 * 1024 * 1024
    for tile in (64, 32, 16, 8, 4, 2, 1):
        if h % tile:
            continue
        if n_bufs * 2 * tile * wp * max(pf, COLS) * 2 <= budget:
            return tile
    return None


def _expand_iota(p: int, dtype):
    """(p, COLS) exact 0/1 expansion matrix: col j of the output takes
    input lane j (j < p).  Built from iotas (no operand DMA)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (p, COLS), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (p, COLS), 1)
    return (r == c).astype(dtype)


def _head_fwd_kernel(
    y_hbm,     # (B, H, Wp, pF) ANY — raw (pre-BN) chain output
    t_hbm,     # (B, H, Wp, COLS) ANY int8 — lane-expanded targets
    aff_ref,   # (2, pF) VMEM f32: pending affine a, b (tiled over p)
    wsel_ref,  # (pF, COLS) VMEM bf16 — block-diagonal head weights
    bvec_ref,  # (8, COLS) VMEM f32: row0 bias (cols < p), row1 colmask
    out_ref,   # (1, N_ROWS, COLS) VMEM f32 — per-sample sums
    ybuf,      # scratch (2, TH, Wp, pF) bf16
    tbuf,      # scratch (2, TH, Wp, COLS) int8
    acc,       # scratch (N_ROWS, COLS) f32
    in_sems,   # (2, 2)
    *,
    tile_h: int,
    n_tiles: int,
):
    b = pl.program_id(0)
    wp = ybuf.shape[2]
    pf = ybuf.shape[3]

    def start_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)], ybuf.at[slot],
            in_sems.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            t_hbm.at[b, pl.ds(j * tile_h, tile_h)], tbuf.at[slot],
            in_sems.at[slot, 1],
        ).start()

    def wait_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)], ybuf.at[slot],
            in_sems.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            t_hbm.at[b, pl.ds(j * tile_h, tile_h)], tbuf.at[slot],
            in_sems.at[slot, 1],
        ).wait()

    acc[...] = jnp.zeros((N_ROWS, COLS), jnp.float32)
    start_in(0, 0)

    def body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_tiles)
        def _():
            start_in(j + 1, jax.lax.rem(j + 1, 2))

        wait_in(j, slot)

        yf = ybuf[slot].astype(jnp.float32)
        wlin = yf * aff_ref[0][None, None, :] + aff_ref[1][None, None, :]
        z = jnp.maximum(wlin, 0.0).astype(ybuf.dtype)
        z2 = z.reshape(tile_h * wp, pf)
        lf = jax.lax.dot(z2, wsel_ref[...], preferred_element_type=jnp.float32)
        # logits round to the model dtype + same-dtype bias add, exactly
        # like the XLA conv output (ops/conv.py pointwise_conv2d dots with
        # preferred_element_type=x.dtype); f32 models round nowhere
        l = (
            lf.astype(ybuf.dtype) + bvec_ref[0].astype(ybuf.dtype)
        ).astype(jnp.float32)
        cmask = bvec_ref[1]
        y128 = cmask * (1.0 / (1.0 + jnp.exp(-l)))
        t128 = tbuf[slot].astype(jnp.float32).reshape(tile_h * wp, COLS)

        pred = (y128 > 0.5).astype(jnp.float32)
        tth = (t128 > 0.5).astype(jnp.float32)
        yr = (y128 >= 1.0).astype(jnp.float32)
        tr = jnp.clip(jnp.floor(t128), 0.0, 1.0)

        acc[ROW_I, :] = acc[ROW_I, :] + jnp.sum(y128 * t128, axis=0)
        acc[ROW_P, :] = acc[ROW_P, :] + jnp.sum(y128, axis=0)
        acc[ROW_T, :] = acc[ROW_T, :] + jnp.sum(t128, axis=0)
        acc[ROW_IT, :] = acc[ROW_IT, :] + jnp.sum(pred * tth, axis=0)
        acc[ROW_PT, :] = acc[ROW_PT, :] + jnp.sum(pred, axis=0)
        acc[ROW_TT, :] = acc[ROW_TT, :] + jnp.sum(tth, axis=0)
        acc[ROW_IR, :] = acc[ROW_IR, :] + jnp.sum(yr * tr, axis=0)
        acc[ROW_PR, :] = acc[ROW_PR, :] + jnp.sum(yr, axis=0)
        acc[ROW_TR, :] = acc[ROW_TR, :] + jnp.sum(tr, axis=0)
        return ()

    jax.lax.fori_loop(0, n_tiles, body, (), unroll=False)
    out_ref[0] = acc[...]


def head_fwd_sums(
    y_p: jax.Array,     # (B, H, Wp, pF) — raw chain output, packed
    t_exp: jax.Array,   # (B, H, Wp, COLS) bf16 — lane-expanded targets
    aff2: jax.Array,    # (2, F) f32: pending affine a, b
    wsel: jax.Array,    # (pF, COLS) bf16
    bvec: jax.Array,    # (8, COLS) f32: bias row + colmask row
    p: int,
) -> Optional[jax.Array]:
    """(B, N_ROWS, COLS) per-sample sum panels, or None when no tile fits."""
    bsz, h, wp, pf = y_p.shape
    tile_h = _pick_tile_h(h, wp, pf, n_bufs=2)
    if tile_h is None:
        return None
    n_tiles = h // tile_h
    aff = jnp.tile(aff2.astype(jnp.float32), (1, p))
    kernel = functools.partial(
        _head_fwd_kernel, tile_h=tile_h, n_tiles=n_tiles
    )
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, N_ROWS, COLS), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, N_ROWS, COLS), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h, wp, pf), y_p.dtype),
            pltpu.VMEM((2, tile_h, wp, COLS), t_exp.dtype),
            pltpu.VMEM((N_ROWS, COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=bsz * h * wp * (pf * COLS * 2 + pf * 4 + COLS * 20),
            bytes_accessed=bsz * h * wp * (pf + COLS) * 2,
            transcendentals=bsz * h * wp * COLS,
        ),
        compiler_params=fs.vmem_params(),
        interpret=_use_interpret(),
    )(y_p, t_exp, aff, wsel, bvec)


# ---------------------------------------------------------------------------
# Multiclass (softmax) head kernels
# ---------------------------------------------------------------------------


def _mc_softmax(ls, cmask):
    """float32 softmax across the per-class (N, COLS) logit arrays,
    mirroring ``jax.nn.softmax`` (max-subtracted exp, normalize); dead
    columns (cmask == 0) yield exactly 0 for every class."""
    m = ls[0]
    for l in ls[1:]:
        m = jnp.maximum(m, l)
    es = [jnp.exp(l - m) * cmask for l in ls]
    s = es[0]
    for e in es[1:]:
        s = s + e
    s = s + (1.0 - cmask)  # dead columns: 0/1 instead of 0/0
    return [e / s for e in es]


def _mc_logits(z2, wsel_ref, bvec_ref, dtype, nc):
    """Per-class (N, COLS) float32 logits with the XLA conv's rounding
    points (dot rounds to the model dtype, same-dtype bias add)."""
    ls = []
    for c in range(nc):
        lf = jax.lax.dot(
            z2, wsel_ref[c], preferred_element_type=jnp.float32
        )
        ls.append(
            (lf.astype(dtype) + bvec_ref[c].astype(dtype)).astype(
                jnp.float32
            )
        )
    return ls


def _mc_argmax_onehot(ys, cmask, nc):
    """First-max-wins argmax indicators (``jnp.argmax`` tie semantics)."""
    ymax = ys[0]
    for y in ys[1:]:
        ymax = jnp.maximum(ymax, y)
    found = jnp.zeros_like(ymax, dtype=jnp.bool_)
    out = []
    for c in range(nc):
        is_c = jnp.logical_and(ys[c] == ymax, jnp.logical_not(found))
        found = jnp.logical_or(found, is_c)
        out.append(is_c.astype(jnp.float32) * cmask)
    return out


def _head_fwd_kernel_mc(
    y_hbm,     # (B, H, Wp, pF) ANY — raw (pre-BN) chain output
    t_hbm,     # (B, H, Wp, COLS) ANY int8 — lane-expanded class ids
    aff_ref,   # (2, pF) VMEM f32: pending affine a, b (tiled over p)
    wsel_ref,  # (C, pF, COLS) VMEM bf16 — per-class block-diagonal weights
    bvec_ref,  # (8, COLS) VMEM f32: rows 0..C-1 bias_c, row 4 colmask
    out_ref,   # (1, N_ROWS_MC, COLS) VMEM f32 — per-sample sums
    ybuf, tbuf, acc, in_sems,
    *,
    tile_h: int,
    n_tiles: int,
    nc: int,
):
    b = pl.program_id(0)
    wp = ybuf.shape[2]
    pf = ybuf.shape[3]

    def start_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)], ybuf.at[slot],
            in_sems.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            t_hbm.at[b, pl.ds(j * tile_h, tile_h)], tbuf.at[slot],
            in_sems.at[slot, 1],
        ).start()

    def wait_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)], ybuf.at[slot],
            in_sems.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            t_hbm.at[b, pl.ds(j * tile_h, tile_h)], tbuf.at[slot],
            in_sems.at[slot, 1],
        ).wait()

    acc[...] = jnp.zeros((N_ROWS_MC, COLS), jnp.float32)
    start_in(0, 0)
    i0, p0, t0, rcce, cm0 = _mc_rows(nc)

    def body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_tiles)
        def _():
            start_in(j + 1, jax.lax.rem(j + 1, 2))

        wait_in(j, slot)

        yf = ybuf[slot].astype(jnp.float32)
        wlin = yf * aff_ref[0][None, None, :] + aff_ref[1][None, None, :]
        z = jnp.maximum(wlin, 0.0).astype(ybuf.dtype)
        z2 = z.reshape(tile_h * wp, pf)
        cmask = bvec_ref[4]
        ls = _mc_logits(z2, wsel_ref, bvec_ref, ybuf.dtype, nc)
        ys = _mc_softmax(ls, cmask)
        iss = _mc_argmax_onehot(ys, cmask, nc)
        tid = tbuf[slot].astype(jnp.int32).reshape(tile_h * wp, COLS)

        ce = jnp.zeros_like(ys[0])
        for c in range(nc):
            tc = (tid == c).astype(jnp.float32) * cmask
            yc = ys[c]
            acc[i0 + c, :] = acc[i0 + c, :] + jnp.sum(yc * tc, axis=0)
            acc[p0 + c, :] = acc[p0 + c, :] + jnp.sum(yc, axis=0)
            acc[t0 + c, :] = acc[t0 + c, :] + jnp.sum(tc, axis=0)
            ce = ce - tc * jnp.log(jnp.maximum(yc, _CLIP_EPS))
            for k in range(nc):
                r = cm0 + c * nc + k
                acc[r, :] = acc[r, :] + jnp.sum(tc * iss[k], axis=0)
        acc[rcce, :] = acc[rcce, :] + jnp.sum(ce, axis=0)
        return ()

    jax.lax.fori_loop(0, n_tiles, body, (), unroll=False)
    out_ref[0] = acc[...]


def head_fwd_sums_mc(
    y_p: jax.Array,     # (B, H, Wp, pF) — raw chain output, packed
    t_exp: jax.Array,   # (B, H, Wp, COLS) int8 — lane-expanded class ids
    aff2: jax.Array,    # (2, F) f32: pending affine a, b
    wsel: jax.Array,    # (C, pF, COLS) bf16
    bvec: jax.Array,    # (8, COLS) f32
    p: int,
    nc: int,
) -> Optional[jax.Array]:
    """(B, N_ROWS_MC, COLS) per-sample sum panels, or None if no tile."""
    bsz, h, wp, pf = y_p.shape
    tile_h = _pick_tile_h(h, wp, pf, n_bufs=2 + 2 * nc)
    if tile_h is None:
        return None
    n_tiles = h // tile_h
    aff = jnp.tile(aff2.astype(jnp.float32), (1, p))
    kernel = functools.partial(
        _head_fwd_kernel_mc, tile_h=tile_h, n_tiles=n_tiles, nc=nc
    )
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, N_ROWS_MC, COLS),
            lambda bi: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, N_ROWS_MC, COLS), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h, wp, pf), y_p.dtype),
            pltpu.VMEM((2, tile_h, wp, COLS), t_exp.dtype),
            pltpu.VMEM((N_ROWS_MC, COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=bsz * h * wp * (nc * pf * COLS * 2 + pf * 4
                                  + COLS * nc * (nc + 12)),
            bytes_accessed=bsz * h * wp * (pf * 2 + COLS),
            transcendentals=bsz * h * wp * COLS * 2 * nc,
        ),
        compiler_params=fs.vmem_params(),
        interpret=_use_interpret(),
    )(y_p, t_exp, aff, wsel, bvec)


def _head_bwd_kernel(
    y_hbm,     # (B, H, Wp, pF) ANY
    t_hbm,     # (B, H, Wp, COLS) ANY int8
    aff_ref,   # (4, pF) VMEM f32: a, b, mean, rstd (tiled over p)
    wsel_ref,  # (pF, COLS) VMEM bf16
    wselt_ref, # (COLS, pF) VMEM bf16 — transpose
    bvec_ref,  # (8, COLS) VMEM f32: row0 bias, row1 colmask
    gsc_ref,   # (1, 8, COLS) VMEM f32 — per-sample cotangents:
               #   row0 lane0 = dI, row1 lane0 = dP (broadcast-ready)
    dz_hbm,    # (B, H, Wp, pF) ANY out — ReLU-masked z-space gradient
    st_ref,    # (8, pF) f32 out: row0 S = sum(dzt), row1 T = sum(dzt*yhat)
    dw_ref,    # (pF, COLS) f32 out: head weight-grad panel
    db_ref,    # (8, COLS) f32 out: row0 = sum(dlogits) per column
    ybuf,      # scratch (2, TH, Wp, pF)
    tbuf,      # scratch (2, TH, Wp, COLS)
    dzbuf,     # scratch (2, TH, Wp, pF)
    st_acc,    # scratch (8, pF) f32
    dw_acc,    # scratch (pF, COLS) f32
    db_acc,    # scratch (8, COLS) f32
    in_sems,   # (2, 2)
    out_sems,  # (2,)
    *,
    tile_h: int,
    n_tiles: int,
):
    b = pl.program_id(0)
    wp = ybuf.shape[2]
    pf = ybuf.shape[3]

    def start_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)], ybuf.at[slot],
            in_sems.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            t_hbm.at[b, pl.ds(j * tile_h, tile_h)], tbuf.at[slot],
            in_sems.at[slot, 1],
        ).start()

    def wait_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)], ybuf.at[slot],
            in_sems.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            t_hbm.at[b, pl.ds(j * tile_h, tile_h)], tbuf.at[slot],
            in_sems.at[slot, 1],
        ).wait()

    def out_copy(j, slot):
        return pltpu.make_async_copy(
            dzbuf.at[slot],
            dz_hbm.at[b, pl.ds(j * tile_h, tile_h)],
            out_sems.at[slot],
        )

    st_acc[...] = jnp.zeros((8, pf), jnp.float32)
    dw_acc[...] = jnp.zeros((pf, COLS), jnp.float32)
    db_acc[...] = jnp.zeros((8, COLS), jnp.float32)
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
        z = jnp.maximum(wlin, 0.0).astype(ybuf.dtype)
        z2 = z.reshape(tile_h * wp, pf)
        lf = jax.lax.dot(z2, wsel_ref[...], preferred_element_type=jnp.float32)
        l = (
            lf.astype(ybuf.dtype) + bvec_ref[0].astype(ybuf.dtype)
        ).astype(jnp.float32)
        cmask = bvec_ref[1]
        y128 = cmask * (1.0 / (1.0 + jnp.exp(-l)))
        t128 = tbuf[slot].astype(jnp.float32).reshape(tile_h * wp, COLS)

        dI = gsc_ref[0, 0, :]   # dI broadcast over all COLS lanes
        dP = gsc_ref[0, 1, :]
        dy = dI * t128 + dP * cmask
        # dead columns: y128 == 0 there, so y*(1-y) kills their gradient
        dlog = dy * y128 * (1.0 - y128)
        dlb = dlog.astype(ybuf.dtype)  # XLA einsum-vjp rounding point
        dzc = jax.lax.dot(
            dlb, wselt_ref[...], preferred_element_type=jnp.float32
        )
        wlin2 = wlin.reshape(tile_h * wp, pf)
        dzt = jnp.where(wlin2 > 0, dzc, 0.0)
        dzbuf[slot] = dzt.reshape(tile_h, wp, pf).astype(dzbuf.dtype)
        out_copy(j, slot).start()

        yhat = (
            (yf - aff_ref[2][None, None, :]) * aff_ref[3][None, None, :]
        ).reshape(tile_h * wp, pf)
        st_acc[0, :] = st_acc[0, :] + jnp.sum(dzt, axis=0)
        st_acc[1, :] = st_acc[1, :] + jnp.sum(dzt * yhat, axis=0)
        dw_acc[...] = dw_acc[...] + jax.lax.dot_general(
            z2, dlb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_acc[0, :] = db_acc[0, :] + jnp.sum(dlog, axis=0)
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
        dw_ref[...] = dw_acc[...]
        db_ref[...] = db_acc[...]

    @pl.when(jnp.logical_not(first))
    def _():
        st_ref[...] = st_ref[...] + st_acc[...]
        dw_ref[...] = dw_ref[...] + dw_acc[...]
        db_ref[...] = db_ref[...] + db_acc[...]


def head_bwd(
    y_p: jax.Array,     # (B, H, Wp, pF)
    t_exp: jax.Array,   # (B, H, Wp, COLS) bf16
    aff4: jax.Array,    # (4, F) f32: a, b, mean, rstd
    wsel: jax.Array,    # (pF, COLS) bf16
    bvec: jax.Array,    # (8, COLS) f32
    gsc: jax.Array,     # (B, 8, COLS) f32 — per-sample dI/dP panels
    p: int,
) -> Optional[Tuple[jax.Array, jax.Array, jax.Array, jax.Array]]:
    """(dzt, st (8, pF), dw_panel (pF, COLS), db_row (8, COLS)) or None."""
    bsz, h, wp, pf = y_p.shape
    tile_h = _pick_tile_h(h, wp, pf, n_bufs=3)
    if tile_h is None:
        return None
    n_tiles = h // tile_h
    aff = jnp.tile(aff4.astype(jnp.float32), (1, p))
    kernel = functools.partial(
        _head_bwd_kernel, tile_h=tile_h, n_tiles=n_tiles
    )
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 8, COLS), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, pf), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (pf, COLS), lambda bi: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((8, COLS), lambda bi: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, h, wp, pf), y_p.dtype),
            jax.ShapeDtypeStruct((8, pf), jnp.float32),
            jax.ShapeDtypeStruct((pf, COLS), jnp.float32),
            jax.ShapeDtypeStruct((8, COLS), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h, wp, pf), y_p.dtype),
            pltpu.VMEM((2, tile_h, wp, COLS), t_exp.dtype),
            pltpu.VMEM((2, tile_h, wp, pf), y_p.dtype),
            pltpu.VMEM((8, pf), jnp.float32),
            pltpu.VMEM((pf, COLS), jnp.float32),
            pltpu.VMEM((8, COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=bsz * h * wp * (pf * COLS * 6 + pf * 8 + COLS * 24),
            bytes_accessed=bsz * h * wp * (2 * pf + COLS) * 2,
            transcendentals=bsz * h * wp * COLS,
        ),
        compiler_params=fs.vmem_params(),
        interpret=_use_interpret(),
    )(y_p, t_exp, aff, wsel, jnp.transpose(wsel), bvec, gsc)


def _head_bwd_kernel_mc(
    y_hbm,     # (B, H, Wp, pF) ANY
    t_hbm,     # (B, H, Wp, COLS) ANY int8 class ids
    aff_ref,   # (4, pF) VMEM f32: a, b, mean, rstd (tiled over p)
    wsel_ref,  # (C, pF, COLS) VMEM bf16
    wselt_ref, # (C, COLS, pF) VMEM bf16 — per-class transpose
    bvec_ref,  # (8, COLS) VMEM f32: rows 0..C-1 bias_c, row 4 colmask
    gsc_ref,   # (1, N_ROWS_MC, COLS) VMEM f32 — per-sample panel cotangent
    dz_hbm,    # (B, H, Wp, pF) ANY out — ReLU-masked z-space gradient
    st_ref,    # (8, pF) f32 out: row0 S = sum(dzt), row1 T = sum(dzt*yhat)
    dw_ref,    # (C, pF, COLS) f32 out: per-class head weight-grad panels
    db_ref,    # (8, COLS) f32 out: rows 0..C-1 = per-class sum(dlogits)
    ybuf, tbuf, dzbuf, st_acc, dw_acc, db_acc, in_sems, out_sems,
    *,
    tile_h: int,
    n_tiles: int,
    nc: int,
):
    b = pl.program_id(0)
    wp = ybuf.shape[2]
    pf = ybuf.shape[3]

    def start_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)], ybuf.at[slot],
            in_sems.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            t_hbm.at[b, pl.ds(j * tile_h, tile_h)], tbuf.at[slot],
            in_sems.at[slot, 1],
        ).start()

    def wait_in(j, slot):
        pltpu.make_async_copy(
            y_hbm.at[b, pl.ds(j * tile_h, tile_h)], ybuf.at[slot],
            in_sems.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            t_hbm.at[b, pl.ds(j * tile_h, tile_h)], tbuf.at[slot],
            in_sems.at[slot, 1],
        ).wait()

    def out_copy(j, slot):
        return pltpu.make_async_copy(
            dzbuf.at[slot],
            dz_hbm.at[b, pl.ds(j * tile_h, tile_h)],
            out_sems.at[slot],
        )

    st_acc[...] = jnp.zeros((8, pf), jnp.float32)
    dw_acc[...] = jnp.zeros((nc, pf, COLS), jnp.float32)
    db_acc[...] = jnp.zeros((8, COLS), jnp.float32)
    start_in(0, 0)
    i0, p0, t0, rcce, cm0 = _mc_rows(nc)

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
        z = jnp.maximum(wlin, 0.0).astype(ybuf.dtype)
        z2 = z.reshape(tile_h * wp, pf)
        cmask = bvec_ref[4]
        ls = _mc_logits(z2, wsel_ref, bvec_ref, ybuf.dtype, nc)
        ys = _mc_softmax(ls, cmask)
        tid = tbuf[slot].astype(jnp.int32).reshape(tile_h * wp, COLS)

        dcce = gsc_ref[0, rcce, :]
        dys = []
        for c in range(nc):
            tc = (tid == c).astype(jnp.float32) * cmask
            yc = ys[c]
            dy = gsc_ref[0, i0 + c, :] * tc + gsc_ref[0, p0 + c, :] * cmask
            # CCE: d(-t*log(clip(y, eps, 1))) — the clip kills the
            # gradient below eps (softmax output never exceeds 1)
            dy = dy + dcce * jnp.where(
                yc >= _CLIP_EPS, -tc / jnp.maximum(yc, _CLIP_EPS), 0.0
            )
            dys.append(dy)
        # softmax vjp: dl_c = y_c * (dy_c - sum_k y_k dy_k)
        ydot = ys[0] * dys[0]
        for c in range(1, nc):
            ydot = ydot + ys[c] * dys[c]
        dzc = jnp.zeros((tile_h * wp, pf), jnp.float32)
        for c in range(nc):
            dl = ys[c] * (dys[c] - ydot)
            dlb = dl.astype(ybuf.dtype)  # XLA einsum-vjp rounding point
            dzc = dzc + jax.lax.dot(
                dlb, wselt_ref[c], preferred_element_type=jnp.float32
            )
            dw_acc[c] = dw_acc[c] + jax.lax.dot_general(
                z2, dlb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            db_acc[c, :] = db_acc[c, :] + jnp.sum(dl, axis=0)
        wlin2 = wlin.reshape(tile_h * wp, pf)
        dzt = jnp.where(wlin2 > 0, dzc, 0.0)
        dzbuf[slot] = dzt.reshape(tile_h, wp, pf).astype(dzbuf.dtype)
        out_copy(j, slot).start()

        yhat = (
            (yf - aff_ref[2][None, None, :]) * aff_ref[3][None, None, :]
        ).reshape(tile_h * wp, pf)
        st_acc[0, :] = st_acc[0, :] + jnp.sum(dzt, axis=0)
        st_acc[1, :] = st_acc[1, :] + jnp.sum(dzt * yhat, axis=0)
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
        dw_ref[...] = dw_acc[...]
        db_ref[...] = db_acc[...]

    @pl.when(jnp.logical_not(first))
    def _():
        st_ref[...] = st_ref[...] + st_acc[...]
        dw_ref[...] = dw_ref[...] + dw_acc[...]
        db_ref[...] = db_ref[...] + db_acc[...]


def head_bwd_mc(
    y_p: jax.Array,     # (B, H, Wp, pF)
    t_exp: jax.Array,   # (B, H, Wp, COLS) int8 class ids
    aff4: jax.Array,    # (4, F) f32: a, b, mean, rstd
    wsel: jax.Array,    # (C, pF, COLS) bf16
    bvec: jax.Array,    # (8, COLS) f32
    gsc: jax.Array,     # (B, N_ROWS_MC, COLS) f32 — panel cotangents
    p: int,
    nc: int,
) -> Optional[Tuple[jax.Array, jax.Array, jax.Array, jax.Array]]:
    """(dzt, st (8, pF), dw (C, pF, COLS), db (8, COLS)) or None."""
    bsz, h, wp, pf = y_p.shape
    tile_h = _pick_tile_h(h, wp, pf, n_bufs=3 + 3 * nc)
    if tile_h is None:
        return None
    n_tiles = h // tile_h
    aff = jnp.tile(aff4.astype(jnp.float32), (1, p))
    kernel = functools.partial(
        _head_bwd_kernel_mc, tile_h=tile_h, n_tiles=n_tiles, nc=nc
    )
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, N_ROWS_MC, COLS),
                lambda bi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, pf), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (nc, pf, COLS), lambda bi: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((8, COLS), lambda bi: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, h, wp, pf), y_p.dtype),
            jax.ShapeDtypeStruct((8, pf), jnp.float32),
            jax.ShapeDtypeStruct((nc, pf, COLS), jnp.float32),
            jax.ShapeDtypeStruct((8, COLS), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h, wp, pf), y_p.dtype),
            pltpu.VMEM((2, tile_h, wp, COLS), t_exp.dtype),
            pltpu.VMEM((2, tile_h, wp, pf), y_p.dtype),
            pltpu.VMEM((8, pf), jnp.float32),
            pltpu.VMEM((nc, pf, COLS), jnp.float32),
            pltpu.VMEM((8, COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=bsz * h * wp * (nc * pf * COLS * 6 + pf * 8
                                  + COLS * nc * 16),
            bytes_accessed=bsz * h * wp * (3 * pf * 2 + COLS),
            transcendentals=bsz * h * wp * COLS * 2 * nc,
        ),
        compiler_params=fs.vmem_params(),
        interpret=_use_interpret(),
    )(
        y_p, t_exp, aff, wsel,
        jnp.transpose(wsel, (0, 2, 1)), bvec, gsc,
    )


# ---------------------------------------------------------------------------
# Chain + head custom_vjp
# ---------------------------------------------------------------------------

SUM_KEYS = ("i", "p", "t", "it", "pt", "tt", "ir", "pr", "tr")
_SUM_ROWS = (
    ROW_I, ROW_P, ROW_T, ROW_IT, ROW_PT, ROW_TT, ROW_IR, ROW_PR, ROW_TR
)


def head_pack_feasible(h: int, wp: int, pf: int, nc: int = 1) -> bool:
    """Static check that BOTH head kernels can tile this shape."""
    if nc == 1:
        bufs_f, bufs_b = 2, 3
    else:
        bufs_f, bufs_b = 2 + 2 * nc, 3 + 3 * nc
    return (
        pf % fs.LANE == 0
        and _pick_tile_h(h, wp, pf, n_bufs=bufs_f) is not None
        and _pick_tile_h(h, wp, pf, n_bufs=bufs_b) is not None
    )


def fused_head_feasible(
    z_shape: Sequence[int],
    block_channels: Sequence[int],
    num_classes: int,
    in_packed: Optional[int] = None,
) -> bool:
    """Static mirror of :func:`fused_head_train`'s early-outs, callable from
    shapes alone.  ``models/unet.py`` MUST consult this BEFORE declaring the
    head Conv inside the fused branch: declaring it and then falling through
    to the composed head would declare ``output_mask`` twice and Flax raises
    ``NameInUseError`` at trace time (e.g. filters where no pack makes
    ``p*filters[0]`` a multiple of 128)."""
    if num_classes != 1 and not 2 <= num_classes <= MAX_MC_CLASSES:
        return False
    h = z_shape[1]
    if in_packed in (None, 1):
        c0 = z_shape[-1]
        w = z_shape[2]
        chans = [c0] + list(block_channels)
        p = ft._chain_common_pack(chans, w) or 1
    else:
        p = in_packed
        w = z_shape[2] * in_packed
    f_last = block_channels[-1]
    return head_pack_feasible(h, w // p, p * f_last, nc=num_classes)


def _head_mats(w_head, b_head, p, f, dtype):
    """Build the kernels' (pF, 128) block-diagonal weight panel and the
    (8, 128) bias/colmask panel from the true head params ``w (F,)``,
    ``b ()``: ``wsel[j*F + c, j] = w[c]`` for subpixel column ``j < p``."""
    pf = p * f
    rows = jax.lax.broadcasted_iota(jnp.int32, (pf, COLS), 0) // f
    cols = jax.lax.broadcasted_iota(jnp.int32, (pf, COLS), 1)
    msk = (rows == cols).astype(dtype)
    wsel = jnp.tile(w_head.astype(dtype), p)[:, None] * msk
    colmask = (jnp.arange(COLS) < p).astype(jnp.float32)
    bvec = jnp.zeros((8, COLS), jnp.float32)
    bvec = bvec.at[0].set(b_head.astype(jnp.float32) * colmask)
    bvec = bvec.at[1].set(colmask)
    return wsel, bvec


def _head_mats_mc(w_head, b_head, p, f, nc, dtype):
    """Multiclass kernel operands from the true head params ``w (F, C)``,
    ``b (C,)``: per-class block-diagonal (C, pF, COLS) weight panels plus
    the (8, COLS) bias/colmask panel (rows 0..C-1 = bias_c, row 4 =
    colmask)."""
    pf = p * f
    rows = jax.lax.broadcasted_iota(jnp.int32, (pf, COLS), 0) // f
    cols = jax.lax.broadcasted_iota(jnp.int32, (pf, COLS), 1)
    msk = (rows == cols).astype(dtype)
    wsel = jnp.stack(
        [
            jnp.tile(w_head[:, c].astype(dtype), p)[:, None] * msk
            for c in range(nc)
        ]
    )
    colmask = (jnp.arange(COLS) < p).astype(jnp.float32)
    bvec = jnp.zeros((8, COLS), jnp.float32)
    for c in range(nc):
        bvec = bvec.at[c].set(b_head[c].astype(jnp.float32) * colmask)
    bvec = bvec.at[4].set(colmask)
    return wsel, bvec


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _head_core(
    n_blocks, eps, axis_name, spatial, in_p, nc,
    z_in, t_exp, w_head, b_head, *flat_params,
):
    """Last decoder chain + 1x1-conv/sigmoid-or-softmax head + loss/metric
    sums.

    Returns ``(panel (B, N_ROWS[_MC], 128) f32, ((mean, var), ...))``.  The
    probability tensor never reaches HBM in either direction: the forward
    emits only the per-sample sums; the backward recomputes the head in
    VMEM and hands the chain backward its boundary gradient directly.

    ``nc == 1``: sigmoid head, binary panel (``w_head (F,)``, scalar bias,
    ``t_exp`` 0/1 masks).  ``nc > 1``: softmax head, multiclass panel
    (``w_head (F, C)``, ``b_head (C,)``, ``t_exp`` int8 class ids).

    Targets are DATA: their cotangent is defined as zero (stop-gradient
    semantics), like every training loss treats ground truth.
    """
    out, _ = _head_fwd(
        n_blocks, eps, axis_name, spatial, in_p, nc, z_in, t_exp, w_head,
        b_head, *flat_params,
    )
    return out


def _head_fwd(
    n_blocks, eps, axis_name, spatial, in_p, nc,
    z_in, t_exp, w_head, b_head, *flat_params,
):
    outputs, residuals = ft._chain_fwd_impl(
        n_blocks, eps, axis_name, spatial, None, in_p, 0.0,
        z_in, jnp.int32(0), flat_params,
    )
    _z_out, stats = outputs  # z_out unused -> XLA DCEs the boundary pass
    _zf, ys, _st, _fp, _n, p, _seed, _halos = residuals
    blocks = ft._unflatten_params(flat_params)
    _, pww_last, gamma, beta = blocks[-1]
    f_last = pww_last.shape[1]
    mean, var = stats[-1]
    a_out, b_out = ft._affine_from_stats(gamma, beta, mean, var, eps)
    aff2 = jnp.stack([a_out, b_out])
    if nc == 1:
        wsel, bvec = _head_mats(w_head, b_head, p, f_last, ys[-1].dtype)
        panel = head_fwd_sums(ys[-1], t_exp, aff2, wsel, bvec, p)
    else:
        wsel, bvec = _head_mats_mc(
            w_head, b_head, p, f_last, nc, ys[-1].dtype
        )
        panel = head_fwd_sums_mc(ys[-1], t_exp, aff2, wsel, bvec, p, nc)
    assert panel is not None, "caller must pre-check head_pack_feasible"
    return (panel, stats), (residuals, t_exp, w_head, b_head)


def _head_bwd(
    n_blocks, eps, axis_name, spatial, in_p, nc, saved, cotangents
):
    residuals, t_exp, w_head, b_head = saved
    z_first, ys, stats, flat_params, n, p, drop_seed, halos = residuals
    g_panel, stats_cot = cotangents
    blocks = ft._unflatten_params(flat_params)
    _, pww_last, gamma, beta = blocks[-1]
    f_last = pww_last.shape[1]
    mean, var = stats[-1]
    r = jax.lax.rsqrt(var + eps)
    a_out, b_out = ft._affine_from_stats(gamma, beta, mean, var, eps)
    aff4 = jnp.stack(
        [a_out, b_out, mean.astype(jnp.float32), r.astype(jnp.float32)]
    )
    g_panel = g_panel.astype(jnp.float32)
    if nc == 1:
        wsel, bvec = _head_mats(w_head, b_head, p, f_last, ys[-1].dtype)
        # per-sample loss cotangents: only the differentiable rows (I, P)
        # propagate — T is target-only; the threshold/int-cast count rows
        # are step functions (zero gradient a.e.)
        zero = jnp.zeros_like(g_panel[:, :1, :])
        gsc = jnp.concatenate(
            [
                g_panel[:, ROW_I : ROW_I + 1, :],
                g_panel[:, ROW_P : ROW_P + 1, :],
            ]
            + [zero] * 6,
            axis=1,
        )
        res = head_bwd(ys[-1], t_exp, aff4, wsel, bvec, gsc, p)
    else:
        wsel, bvec = _head_mats_mc(
            w_head, b_head, p, f_last, nc, ys[-1].dtype
        )
        # the kernel reads only the differentiable rows (I_c, P_c, CCE)
        # of the cotangent panel; T/CM rows are data/step functions
        res = head_bwd_mc(ys[-1], t_exp, aff4, wsel, bvec, g_panel, p, nc)
    assert res is not None, "forward checked head_pack_feasible"
    dzt, st, dw_panel, db_row = res

    def psum_if(v):
        return jax.lax.psum(v, axis_name) if axis_name is not None else v

    def group_sum(v):
        return v.reshape(p, f_last).sum(axis=0) if p > 1 else v

    S_loc = group_sum(st[0])
    T_loc = group_sum(st[1])
    dz_in, _dseed, *flat_grads = ft._chain_bwd_links(
        n_blocks, eps, axis_name, in_p, 0.0,
        blocks, stats, stats_cot, ys, z_first, n, p, drop_seed,
        dzt, psum_if(S_loc), psum_if(T_loc), True,
        S_loc=S_loc, T_loc=T_loc, spatial=spatial, halos=halos,
    )
    # head param grads: LOCAL partials (the train step pmeans across the
    # mesh); dw[ch] = sum_j dw_panel[j*F + ch, j] folds the block-diagonal
    # selection back onto the true weight
    if nc == 1:
        dwp = dw_panel.reshape(p, f_last, COLS)
        dw = functools.reduce(
            lambda a, j: a + dwp[j, :, j], range(p),
            jnp.zeros((f_last,), jnp.float32),
        )
        db = jnp.sum(db_row[0] * bvec[1])
    else:
        dwp = dw_panel.reshape(nc, p, f_last, COLS)
        dw = jnp.stack(
            [
                functools.reduce(
                    lambda a, j: a + dwp[c, j, :, j], range(p),
                    jnp.zeros((f_last,), jnp.float32),
                )
                for c in range(nc)
            ],
            axis=-1,
        )  # (F, C)
        db = jnp.stack([jnp.sum(db_row[c]) for c in range(nc)])
    dt = jnp.zeros_like(t_exp)  # targets are data
    return (
        dz_in,
        dt,
        dw.astype(w_head.dtype).reshape(w_head.shape),
        db.astype(b_head.dtype).reshape(b_head.shape),
        *flat_grads,
    )


_head_core.defvjp(_head_fwd, _head_bwd)


def expand_targets(targets: jax.Array, p: int) -> jax.Array:
    """(B, H, W[, 1]) mask -> the kernels' lane-expanded (B, H, W/p, 128)
    int8 layout (column j = width-subpixel j; zero beyond ``p``).

    int8 halves the expanded tensor's HBM traffic (it is read by BOTH
    head kernels).  Targets are binarized DETERMINISTICALLY (``> 0.5``)
    first — a plain ``astype(int8)`` would floor antialiased/soft mask
    values (e.g. a resized 0.8) to zero while the XLA oracle read them as
    float, silently diverging the loss.  :func:`head_sums_reference`
    applies the same threshold, so the sums contract is binarized and
    path-independent by definition; exact 0/1 masks (the
    ``num_classes == 1`` data contract, MIDV rasterized quads) are
    untouched.  The kernels convert to float32 in VMEM."""
    if targets.ndim == 4:
        targets = targets[..., 0]
    b, h, w = targets.shape
    t = (targets > 0.5).astype(jnp.int8).reshape(b, h, w // p, p)
    return jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, COLS - p)))


def expand_target_ids(targets: jax.Array, p: int) -> jax.Array:
    """(B, H, W[, 1]) class-id mask (or one-hot ``(..., C)``) -> the
    kernels' lane-expanded (B, H, W/p, 128) int8 class-id layout.

    Class ids are small exact integers stored as floats by the loaders —
    ``round`` (not floor) keeps them exact through any float dtype.  The
    zero padding beyond column ``p`` would alias class 0, so the kernels
    gate every target read with the column mask."""
    if targets.ndim == 4:
        if targets.shape[-1] > 1:  # one-hot
            targets = jnp.argmax(targets, axis=-1).astype(jnp.float32)
        else:
            targets = targets[..., 0]
    b, h, w = targets.shape
    t = jnp.round(targets).astype(jnp.int8).reshape(b, h, w // p, p)
    return jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, COLS - p)))


def head_sums_reference_mc(
    preds: jax.Array, targets: jax.Array, num_classes: int
) -> dict:
    """The multiclass sums contract computed from materialized softmax
    probabilities (XLA fallback / oracle): per-sample per-class dice sums
    ``(B, C)``, the per-sample CCE sum ``(B,)`` and the per-sample argmax
    confusion matrix ``(B, C, C)`` (rows = true class)."""
    y = preds.astype(jnp.float32)  # (B, H, W, C)
    if targets.ndim == 4:
        if targets.shape[-1] == num_classes and num_classes > 1:
            tid = jnp.argmax(targets, axis=-1)
        else:
            tid = targets[..., 0]
    else:
        tid = targets
    tid = jnp.clip(
        jnp.round(tid.astype(jnp.float32)).astype(jnp.int32),
        0, num_classes - 1,
    )
    t1 = jax.nn.one_hot(tid, num_classes, dtype=jnp.float32)
    ax = (1, 2)
    yc = jnp.clip(y, _CLIP_EPS, 1.0)
    pred_cls = jnp.argmax(y, axis=-1)
    p1 = jax.nn.one_hot(pred_cls, num_classes, dtype=jnp.float32)
    b = y.shape[0]
    return {
        "i": jnp.sum(y * t1, axis=ax),
        "p": jnp.sum(y, axis=ax),
        "t": jnp.sum(t1, axis=ax),
        "cce": jnp.sum(-t1 * jnp.log(yc), axis=(1, 2, 3)),
        "cm": jnp.einsum(
            "bni,bnj->bij",
            t1.reshape(b, -1, num_classes),
            p1.reshape(b, -1, num_classes),
            preferred_element_type=jnp.float32,
        ),
    }


def head_sums_reference(preds: jax.Array, targets: jax.Array) -> dict:
    """The sums contract computed from materialized probabilities (XLA
    fallback / oracle): per-sample f32 reductions keyed by SUM_KEYS.

    Targets are binarized (``> 0.5``) exactly like :func:`expand_targets`
    — the contract is defined on 0/1 masks on every path."""
    y = (preds[..., 0] if preds.ndim == 4 else preds).astype(jnp.float32)
    t = (
        (targets[..., 0] if targets.ndim == 4 else targets) > 0.5
    ).astype(jnp.float32)
    ax = (1, 2)
    pred = (y > 0.5).astype(jnp.float32)
    tth = (t > 0.5).astype(jnp.float32)
    yr = (y >= 1.0).astype(jnp.float32)
    tr = jnp.clip(jnp.floor(t), 0.0, 1.0)
    return {
        "i": jnp.sum(y * t, axis=ax),
        "p": jnp.sum(y, axis=ax),
        "t": jnp.sum(t, axis=ax),
        "it": jnp.sum(pred * tth, axis=ax),
        "pt": jnp.sum(pred, axis=ax),
        "tt": jnp.sum(tth, axis=ax),
        "ir": jnp.sum(yr * tr, axis=ax),
        "pr": jnp.sum(yr, axis=ax),
        "tr": jnp.sum(tr, axis=ax),
    }


def fused_head_train(
    z_in: jax.Array,
    blocks: Sequence,
    w_kernel: jax.Array,   # head Conv kernel (1, 1, F, 1) (Keras layout)
    bias: jax.Array,       # head Conv bias (1,)
    targets: jax.Array,    # (B, H, W[, 1]) binary mask
    eps: float = 1e-3,
    axis_name: Optional[Any] = None,
    in_packed: Optional[int] = None,
    spatial_axis: Optional[str] = None,
):
    """Fused last-decoder-stage chain + segmentation head + loss sums.

    Drop-in sibling of :func:`..fused_train.fused_chain_train` for the
    final decoder stage: instead of returning the stage activation (which
    the XLA head would re-read at full resolution three times — conv, loss
    reductions, metrics), it returns ``(sums, stats)``.

    * ``num_classes == 1`` (sigmoid head): ``sums`` maps SUM_KEYS to
      per-sample ``(B,)`` float32 reductions — everything dice/IoU losses
      (reference ``utils/loss.py:9-29``) and the confusion-matrix metrics
      (reference ``scripts/train.py:231-239``) need.
    * ``2 <= num_classes <= MAX_MC_CLASSES`` (softmax head, reference
      ``model/u_net.py:108-112``): ``i``/``p``/``t`` are per-class
      ``(B, C)``, plus ``cce`` ``(B,)`` (clipped categorical
      cross-entropy sum) and ``cm`` ``(B, C, C)`` (argmax confusion
      matrix); ``targets`` are integer class ids.

    Returns ``None`` when the packed kernels don't apply (caller composes
    the XLA head instead).
    """
    nc = w_kernel.shape[-1]
    if nc != 1 and not 2 <= nc <= MAX_MC_CLASSES:
        return None
    if in_packed in (None, 1):
        in_p = None
        c0 = z_in.shape[-1]
        b, h, w, _ = z_in.shape
        chans = [c0] + [
            blk[1].reshape(-1, blk[1].shape[-1]).shape[-1] for blk in blocks
        ]
        p = ft._chain_common_pack(chans, w) or 1
    else:
        in_p = in_packed
        p = in_p
        c0 = z_in.shape[-1] // in_p
        b, h, wp0, _ = z_in.shape
        w = wp0 * in_p
    f_last = blocks[-1][1].reshape(-1, blocks[-1][1].shape[-1]).shape[-1]
    if not head_pack_feasible(h, w // p, p * f_last, nc=nc):
        return None
    prepped = ft._prep_blocks(z_in.dtype, c0, blocks)
    flat = ft._flatten_params(prepped)
    if nc == 1:
        t_exp = expand_targets(targets, p)
        w_h, b_h = w_kernel.reshape(-1), bias.reshape(())
    else:
        t_exp = expand_target_ids(targets, p)
        w_h, b_h = w_kernel.reshape(-1, nc), bias.reshape(nc)
    panel, stats = _head_core(
        len(prepped), eps, axis_name, spatial_axis, in_p, nc,
        z_in, t_exp, w_h, b_h, *flat,
    )
    if nc == 1:
        sums = {
            k: panel[:, row, :].sum(axis=-1)
            for k, row in zip(SUM_KEYS, _SUM_ROWS)
        }
    else:
        i0, p0, t0, rcce, cm0 = _mc_rows(nc)
        sums = {
            "i": panel[:, i0 : i0 + nc, :].sum(axis=-1),
            "p": panel[:, p0 : p0 + nc, :].sum(axis=-1),
            "t": panel[:, t0 : t0 + nc, :].sum(axis=-1),
            "cce": panel[:, rcce, :].sum(axis=-1),
            "cm": panel[:, cm0 : cm0 + nc * nc, :]
            .sum(axis=-1)
            .reshape(-1, nc, nc),
        }
    return sums, stats
