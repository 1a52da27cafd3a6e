"""Pallas TPU kernel: fused separable-conv backward.

Backward of ``y = pointwise(depthwise(x)) (+ bias)`` in ONE pass per tile
(the XLA lowering runs several: dgrad conv, 9-tap weight-grad reductions,
matmul grads — each re-reading the big activation tensors from HBM):

per (batch, row-tile) grid step, with x and g slabs DMA'd once:
  dm    = g @ pwᵀ                      (MXU)
  dx    = correlate(dm, flipped taps)   (9 shifted MACs, VPU)
  ddw_t = Σ x_shifted_t ⊙ dm            (9 tile reductions)
  m     = depthwise(x) recompute        (9 shifted MACs — flash-style:
                                         nothing but x is saved forward)
  dpw   = mᵀ @ g                        (MXU, contraction over pixels)
  dbias = Σ g

HBM traffic: read x, read g, write dx — versus ~3x that for the unfused
chain.  ddw/dpw/dbias are grid-accumulated into small revisited output
blocks (constant index_map, zero-init on the first step).

Lane packing follows the forward kernel (same ``p`` so C=64 stages are
DMA-alignable); packed gradients unpack exactly: ddw sums its p channel
groups, dpw takes the p diagonal blocks of the kron structure, dbias sums
its p groups.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unet_image_segmentation_tpu.ops.pallas import fused_sepconv as fs


def _bwd_kernel(
    x_hbm,       # (B, H, Wp, pC) ANY
    g_hbm,       # (B, H, Wp, pF) ANY
    dwk_ref,     # (3, 3, pC) VMEM
    pwt_ref,     # (pF, pC) VMEM  (packed pointwise, transposed)
    dx_ref,      # (1, TH, Wp, pC) VMEM block
    ddw_ref,     # (16, pC) VMEM accumulated (rows 0..8 = taps, rest pad)
    dpw_ref,     # (pC, pF) VMEM accumulated
    dbias_ref,   # (8, pF) VMEM accumulated (row 0 used)
    xbuf,        # scratch (TH+2, Wp, pC)
    gbuf,        # scratch (TH+2, Wp, pF)
    sems,        # DMA semaphores (6,)
    *,
    tile_h: int,
    c: int,
    f: int,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    wp = xbuf.shape[1]
    pc = xbuf.shape[2]
    pf = gbuf.shape[2]
    row0 = j * tile_h

    def fetch(hbm, buf, sem0):
        body = pltpu.make_async_copy(
            hbm.at[b, pl.ds(row0, tile_h)], buf.at[pl.ds(1, tile_h)], sems.at[sem0]
        )
        body.start()

        @pl.when(j > 0)
        def _():
            pltpu.make_async_copy(
                hbm.at[b, pl.ds(row0 - 1, 1)], buf.at[pl.ds(0, 1)],
                sems.at[sem0 + 1],
            ).start()

        @pl.when(j < n_j - 1)
        def _():
            pltpu.make_async_copy(
                hbm.at[b, pl.ds(row0 + tile_h, 1)],
                buf.at[pl.ds(tile_h + 1, 1)],
                sems.at[sem0 + 2],
            ).start()

        @pl.when(j == 0)
        def _():
            buf[0, :, :] = jnp.zeros((buf.shape[1], buf.shape[2]), buf.dtype)

        @pl.when(j == n_j - 1)
        def _():
            buf[tile_h + 1, :, :] = jnp.zeros(
                (buf.shape[1], buf.shape[2]), buf.dtype
            )

        body.wait()

        @pl.when(j > 0)
        def _():
            pltpu.make_async_copy(
                hbm.at[b, pl.ds(row0 - 1, 1)], buf.at[pl.ds(0, 1)],
                sems.at[sem0 + 1],
            ).wait()

        @pl.when(j < n_j - 1)
        def _():
            pltpu.make_async_copy(
                hbm.at[b, pl.ds(row0 + tile_h, 1)],
                buf.at[pl.ds(tile_h + 1, 1)],
                sems.at[sem0 + 2],
            ).wait()

    fetch(x_hbm, xbuf, 0)
    fetch(g_hbm, gbuf, 3)

    zeros_q = jnp.zeros((tile_h, 1, pc), jnp.float32)

    def shift_pixels(rows, direction, width_c):
        """Pixel shift along packed W (see forward kernel)."""
        zq = jnp.zeros((rows.shape[0], 1, rows.shape[2]), rows.dtype)
        if direction == +1:  # result[w] = rows[w+1]
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

    # dm over the full (TH+2) slab: (TH+2)*Wp x pF @ pF x pC
    g_all = gbuf[...]
    dm = jnp.dot(
        g_all.reshape((tile_h + 2) * wp, pf),
        pwt_ref[...],
        preferred_element_type=jnp.float32,
    ).reshape(tile_h + 2, wp, pc)

    # --- dx: correlate dm with flipped taps ---
    dx = jnp.zeros((tile_h, wp, pc), jnp.float32)
    for di in range(3):
        rows = dm[2 - di : 2 - di + tile_h]
        for dj in range(3):
            tap = dwk_ref[di, dj].astype(jnp.float32)
            if dj == 0:
                shifted = shift_pixels(rows, +1, c)
            elif dj == 2:
                shifted = shift_pixels(rows, -1, c)
            else:
                shifted = rows
            dx = dx + shifted * tap[None, None, :]
    dx_ref[...] = dx.reshape(1, tile_h, wp, pc).astype(dx_ref.dtype)

    # --- ddw taps + depthwise recompute m ---
    first = jnp.logical_and(b == 0, j == 0)
    dm_center = dm[1 : 1 + tile_h]
    m = jnp.zeros((tile_h, wp, pc), jnp.float32)
    ddw_rows = []
    for di in range(3):
        xrows = xbuf[pl.ds(di, tile_h)].astype(jnp.float32)
        for dj in range(3):
            if dj == 0:
                xs = shift_pixels(xrows, -1, c)
            elif dj == 2:
                xs = shift_pixels(xrows, +1, c)
            else:
                xs = xrows
            ddw_rows.append(jnp.sum(xs * dm_center, axis=(0, 1)))  # (pC,)
            tap = dwk_ref[di, dj].astype(jnp.float32)
            m = m + xs * tap[None, None, :]
    ddw_tile = jnp.stack(
        ddw_rows + [jnp.zeros((pc,), jnp.float32)] * 7, axis=0
    )  # (16, pC)

    # --- dpw + dbias (center rows of g) ---
    g_center = gbuf[pl.ds(1, tile_h)]
    # (N, pC) x (N, pF) contracting N -> (pC, pF); dot_general avoids an
    # explicit in-VMEM transpose (a relayout on TPU).
    dpw_tile = jax.lax.dot_general(
        m.reshape(tile_h * wp, pc).astype(g_hbm.dtype),
        g_center.reshape(tile_h * wp, pf),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (pC, pF)
    dbias_row = jnp.sum(
        g_center.astype(jnp.float32).reshape(tile_h * wp, pf), axis=0
    )
    dbias_tile = jnp.concatenate(
        [dbias_row[None, :], jnp.zeros((7, pf), jnp.float32)], axis=0
    )

    @pl.when(first)
    def _():
        ddw_ref[...] = ddw_tile
        dpw_ref[...] = dpw_tile
        dbias_ref[...] = dbias_tile

    @pl.when(jnp.logical_not(first))
    def _():
        ddw_ref[...] = ddw_ref[...] + ddw_tile
        dpw_ref[...] = dpw_ref[...] + dpw_tile
        dbias_ref[...] = dbias_ref[...] + dbias_tile


def _pick_tile_h_bwd(h: int, wp: int, pc: int, pf: int) -> int:
    """Row tile sized for the backward working set (~10MB of 16MB VMEM).

    Resident per grid step: x slab (bf16) + g slab (bf16) + dm (fp32) over
    TH+2 rows; dx + m (fp32) over TH rows; the small accumulators.
    """
    budget = 10 * 1024 * 1024
    slack = 1.4  # compiler temporaries / double buffers
    per_slab_row = wp * (2 * pc + 2 * pf + 4 * pc)
    per_body_row = wp * 8 * pc
    fixed = pc * pf * 6
    for tile in (64, 32, 16, 8, 4, 2, 1):
        if h % tile:
            continue
        working = (tile + 2) * per_slab_row + tile * per_body_row + fixed
        if working * slack <= budget:
            return tile
    return 1


def sepconv_bwd_pallas(
    x: jax.Array,      # (B, H, W, C)
    g: jax.Array,      # (B, H, W, F)
    dwk: jax.Array,    # (3, 3, C)
    pww: jax.Array,    # (C, F)
    *,
    interpret: bool,
) -> Optional[Tuple[jax.Array, jax.Array, jax.Array, jax.Array]]:
    """Returns (dx, ddw, dpw, dbias) or None when no packing fits."""
    b, h, w, c = x.shape
    f = pww.shape[1]
    p = fs._pick_pack(c, f, w)
    if p is None:
        return None
    wp, pc, pf = w // p, p * c, p * f
    xp = x.reshape(b, h, wp, pc)
    gp = g.reshape(b, h, wp, pf)
    if p > 1:
        dwk_p = jnp.tile(dwk, (1, 1, p))
        pww_p = jnp.kron(jnp.eye(p, dtype=pww.dtype), pww)
    else:
        dwk_p, pww_p = dwk, pww
    pwt = pww_p.T.astype(g.dtype)  # (pF, pC)

    tile_h = _pick_tile_h_bwd(h, wp, pc, pf)
    grid = (b, h // tile_h)
    kernel = functools.partial(_bwd_kernel, tile_h=tile_h, c=c, f=f)
    dx_p, ddw_p, dpw_p, dbias_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, tile_h, wp, pc), lambda bi, j: (bi, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((16, pc), lambda bi, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pc, pf), lambda bi, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, pf), lambda bi, j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, wp, pc), x.dtype),
            jax.ShapeDtypeStruct((16, pc), jnp.float32),
            jax.ShapeDtypeStruct((pc, pf), jnp.float32),
            jax.ShapeDtypeStruct((8, pf), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, wp, pc), x.dtype),
            pltpu.VMEM((tile_h + 2, wp, pf), g.dtype),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * h * w * (4 * c * f + 27 * c),
            bytes_accessed=(x.size * 2 + g.size) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, gp, dwk_p, pwt)

    dx = dx_p.reshape(b, h, w, c)
    # unpack ddw: sum the p channel groups; taps in rows 0..8
    ddw = ddw_p[:9].reshape(3, 3, p, c).sum(axis=2)
    # unpack dpw: sum of the p diagonal blocks of the kron structure
    dpw = sum(
        dpw_p[r * c : (r + 1) * c, r * f : (r + 1) * f] for r in range(p)
    )
    dbias = dbias_p[0].reshape(p, f).sum(axis=0)
    return dx, ddw, dpw, dbias
