"""Pallas TPU kernel: fused separable-conv backward (double-buffered).

Backward of ``y = pointwise(depthwise(x)) (+ bias)`` in ONE pass per row
tile (the XLA lowering runs several: dgrad conv, 9-tap weight-grad
reductions, matmul grads — each re-reading the big activation tensors
from HBM):

  dm    = g @ pwᵀ                      (MXU)
  dx    = correlate(dm, flipped taps)   (9 shifted MACs, VPU)
  ddw_t = Σ x_shifted_t ⊙ dm            (9 tile reductions)
  m     = depthwise(x) recompute        (flash-style: only x is saved
                                         by the forward)
  dpw   = mᵀ @ g                        (MXU, pixel contraction)
  dbias = Σ g

Pipelining: grid is (B,) and row tiles run in a ``fori_loop`` with
two-slot input slabs (x and g) and dx write-back buffers — tile j+1's
DMAs fly while tile j computes and tile j-1 drains.  ddw/dpw/dbias
accumulate in VMEM scratch across the loop and fold into revisited
(constant-index) outputs once per batch step.

HBM traffic: read x, read g, write dx.  Lane packing follows the forward
kernel; packed gradients unpack exactly (channel-group sums / kron
diagonal blocks).
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
    x_hbm,        # (B, H, Wp, pC) ANY
    g_hbm,        # (B, H, Wp, pF) ANY
    dwk_ref,      # (3, 3, pC) VMEM
    pwt_ref,      # (pF, pC) VMEM (packed pointwise, transposed)
    dx_hbm,       # (B, H, Wp, pC) ANY — manual write-back
    ddw_ref,      # (16, pC) VMEM accumulated (rows 0..8 = taps)
    dpw_ref,      # (pC, pF) VMEM accumulated
    dbias_ref,    # (8, pF) VMEM accumulated (row 0 used)
    xbuf,         # scratch (2, TH+2, Wp, pC)
    gbuf,         # scratch (2, TH+2, Wp, pF)
    dxbuf,        # scratch (2, TH, Wp, pC)
    ddw_acc,      # scratch (16, pC) f32
    dpw_acc,      # scratch (pC, pF) f32
    dbias_acc,    # scratch (8, pF) f32
    in_sems,      # DMA semaphores (2, 6)
    out_sems,     # DMA semaphores (2,)
    *,
    tile_h: int,
    n_tiles: int,
    c: int,
):
    b = pl.program_id(0)
    wp = xbuf.shape[2]
    pc = xbuf.shape[3]
    pf = gbuf.shape[3]

    def slab_copies(j, slot, hbm, buf, sem_base):
        row0 = j * tile_h
        ops = [
            pltpu.make_async_copy(
                hbm.at[b, pl.ds(row0, tile_h)],
                buf.at[slot, pl.ds(1, tile_h)],
                in_sems.at[slot, sem_base],
            )
        ]
        return ops

    def start_in(j, slot):
        row0 = j * tile_h
        for base, (hbm, buf) in enumerate(((x_hbm, xbuf), (g_hbm, gbuf))):
            off = base * 3
            pltpu.make_async_copy(
                hbm.at[b, pl.ds(row0, tile_h)],
                buf.at[slot, pl.ds(1, tile_h)],
                in_sems.at[slot, off],
            ).start()

            @pl.when(j > 0)
            def _():
                pltpu.make_async_copy(
                    hbm.at[b, pl.ds(row0 - 1, 1)],
                    buf.at[slot, pl.ds(0, 1)],
                    in_sems.at[slot, off + 1],
                ).start()

            @pl.when(j < n_tiles - 1)
            def _():
                pltpu.make_async_copy(
                    hbm.at[b, pl.ds(row0 + tile_h, 1)],
                    buf.at[slot, pl.ds(tile_h + 1, 1)],
                    in_sems.at[slot, off + 2],
                ).start()

    def wait_in(j, slot):
        row0 = j * tile_h
        for base, (hbm, buf) in enumerate(((x_hbm, xbuf), (g_hbm, gbuf))):
            off = base * 3
            pltpu.make_async_copy(
                hbm.at[b, pl.ds(row0, tile_h)],
                buf.at[slot, pl.ds(1, tile_h)],
                in_sems.at[slot, off],
            ).wait()

            @pl.when(j > 0)
            def _():
                pltpu.make_async_copy(
                    hbm.at[b, pl.ds(row0 - 1, 1)],
                    buf.at[slot, pl.ds(0, 1)],
                    in_sems.at[slot, off + 1],
                ).wait()

            @pl.when(j == 0)
            def _():
                buf[slot, 0, :, :] = jnp.zeros(
                    (buf.shape[2], buf.shape[3]), buf.dtype
                )

            @pl.when(j < n_tiles - 1)
            def _():
                pltpu.make_async_copy(
                    hbm.at[b, pl.ds(row0 + tile_h, 1)],
                    buf.at[slot, pl.ds(tile_h + 1, 1)],
                    in_sems.at[slot, off + 2],
                ).wait()

            @pl.when(j == n_tiles - 1)
            def _():
                buf[slot, tile_h + 1, :, :] = jnp.zeros(
                    (buf.shape[2], buf.shape[3]), buf.dtype
                )

    def out_copy(j, slot):
        return pltpu.make_async_copy(
            dxbuf.at[slot],
            dx_hbm.at[b, pl.ds(j * tile_h, tile_h)],
            out_sems.at[slot],
        )

    # zero the per-batch accumulators
    ddw_acc[...] = jnp.zeros((16, pc), jnp.float32)
    dpw_acc[...] = jnp.zeros((pc, pf), jnp.float32)
    dbias_acc[...] = jnp.zeros((8, pf), jnp.float32)

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

        def shift_pixels(rows, direction):
            zq = jnp.zeros((rows.shape[0], 1, rows.shape[2]), rows.dtype)
            width_c = c
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

        # dm over the (TH+2) slab
        g_all = gbuf[slot]
        dm = jnp.dot(
            g_all.reshape((tile_h + 2) * wp, pf),
            pwt_ref[...],
            preferred_element_type=jnp.float32,
        ).reshape(tile_h + 2, wp, pc)

        # dx: correlate dm with flipped taps
        dx = jnp.zeros((tile_h, wp, pc), jnp.float32)
        for di in range(3):
            rows = dm[2 - di : 2 - di + tile_h]
            for dj in range(3):
                tap = dwk_ref[di, dj].astype(jnp.float32)
                if dj == 0:
                    shifted = shift_pixels(rows, +1)
                elif dj == 2:
                    shifted = shift_pixels(rows, -1)
                else:
                    shifted = rows
                dx = dx + shifted * tap[None, None, :]
        dxbuf[slot] = dx.astype(dxbuf.dtype)
        out_copy(j, slot).start()

        # ddw taps + depthwise recompute
        dm_center = dm[1 : 1 + tile_h]
        m = jnp.zeros((tile_h, wp, pc), jnp.float32)
        ddw_rows = []
        for di in range(3):
            xrows = xbuf[slot, pl.ds(di, tile_h)].astype(jnp.float32)
            for dj in range(3):
                if dj == 0:
                    xs = shift_pixels(xrows, -1)
                elif dj == 2:
                    xs = shift_pixels(xrows, +1)
                else:
                    xs = xrows
                ddw_rows.append(jnp.sum(xs * dm_center, axis=(0, 1)))
                tap = dwk_ref[di, dj].astype(jnp.float32)
                m = m + xs * tap[None, None, :]
        ddw_tile = jnp.stack(
            ddw_rows + [jnp.zeros((pc,), jnp.float32)] * 7, axis=0
        )

        g_center = gbuf[slot, pl.ds(1, tile_h)]
        dpw_tile = jax.lax.dot_general(
            m.reshape(tile_h * wp, pc).astype(g_hbm.dtype),
            g_center.reshape(tile_h * wp, pf),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbias_row = jnp.sum(
            g_center.astype(jnp.float32).reshape(tile_h * wp, pf), axis=0
        )

        ddw_acc[...] = ddw_acc[...] + ddw_tile
        dpw_acc[...] = dpw_acc[...] + dpw_tile
        dbias_acc[0, :] = dbias_acc[0, :] + dbias_row
        return ()

    jax.lax.fori_loop(0, n_tiles, body, (), unroll=False)

    @pl.when(n_tiles >= 2)
    def _():
        out_copy(n_tiles - 2, jax.lax.rem(n_tiles - 2, 2)).wait()

    out_copy(n_tiles - 1, jax.lax.rem(n_tiles - 1, 2)).wait()

    # fold the per-batch accumulators into the revisited outputs
    first = b == 0

    @pl.when(first)
    def _():
        ddw_ref[...] = ddw_acc[...]
        dpw_ref[...] = dpw_acc[...]
        dbias_ref[...] = dbias_acc[...]

    @pl.when(jnp.logical_not(first))
    def _():
        ddw_ref[...] = ddw_ref[...] + ddw_acc[...]
        dpw_ref[...] = dpw_ref[...] + dpw_acc[...]
        dbias_ref[...] = dbias_ref[...] + dbias_acc[...]


def _pick_tile_h_bwd(h: int, wp: int, pc: int, pf: int) -> int:
    """Row tile sized for the double-buffered backward working set.

    Resident: two x slabs + two g slabs (bf16) + two dx buffers, plus the
    fp32 dm/m/dx temporaries of the active tile and the accumulators.
    """
    budget = fs.vmem_budget(9)
    slack = 1.4  # compiler temporaries
    per_slab_row = wp * 2 * (2 * pc + 2 * pf)    # 2-slot x + g, bf16
    per_body_row = wp * (2 * pc + 4 * pc + 4 * pc + 4 * pc)  # dxbuf + dm/m/dx
    fixed = pc * pf * 8
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
    n_tiles = h // tile_h
    kernel = functools.partial(
        _bwd_kernel, tile_h=tile_h, n_tiles=n_tiles, c=c
    )
    dx_p, ddw_p, dpw_p, dbias_p = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),  # dx: manual write-back
            pl.BlockSpec((16, pc), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pc, pf), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, pf), lambda bi: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, wp, pc), x.dtype),
            jax.ShapeDtypeStruct((16, pc), jnp.float32),
            jax.ShapeDtypeStruct((pc, pf), jnp.float32),
            jax.ShapeDtypeStruct((8, pf), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, wp, pc), x.dtype),
            pltpu.VMEM((2, tile_h + 2, wp, pf), g.dtype),
            pltpu.VMEM((2, tile_h, wp, pc), x.dtype),
            pltpu.VMEM((16, pc), jnp.float32),
            pltpu.VMEM((pc, pf), jnp.float32),
            pltpu.VMEM((8, pf), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 6)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * h * w * (4 * c * f + 27 * c),
            bytes_accessed=(x.size * 2 + g.size) * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=fs.vmem_params(),
        interpret=interpret,
    )(xp, gp, dwk_p, pwt)

    dx = dx_p.reshape(b, h, w, c)
    ddw = ddw_p[:9].reshape(3, 3, p, c).sum(axis=2)
    dpw = sum(
        dpw_p[r * c : (r + 1) * c, r * f : (r + 1) * f] for r in range(p)
    )
    dbias = dbias_p[0].reshape(p, f).sum(axis=0)
    return dx, ddw, dpw, dbias
