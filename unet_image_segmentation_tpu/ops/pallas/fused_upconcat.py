"""Fused decoder feed: Conv2DTranspose(2x2, s2) + row interleave + [up|skip]
concat, emitted directly in the training chain's packed layout.

The reference decoder stage begins ``Conv2DTranspose -> Concatenate([up,
skip])`` (reference model/u_net.py:91-99).  Composed in XLA on TPU this
costs a chain of relayouts around the matmul: the row-parity interleave
lowers as pad+maximum with 5D permuted-layout copies, the lane concat as
another pad fusion, the skip repack as a real reshape copy, and the
backward mirrors all of it (measured ~8-12 ms of the 256px/b32 train
step; see DESIGN.md round-3 notes).

This op runs the whole feed as ONE Pallas kernel per direction:

* the 2x2 transpose conv is a single MXU matmul ``(th/2*W, C) @ (C, 4F)``
  per tile (kernel == stride: no overlap-add; column order ``(di, dj, f)``
  matches ``ops/conv.py:conv_transpose_2x2``);
* output row parity ``di`` never materializes as an interleave: the
  output (and the skip input) are viewed as 5D ``(B, H, 2, Wc, Lc)`` row-
  pair tensors — a pure leading-dims reshape, free on TPU — so parity is
  a STATIC index, not a strided write;
* the ``[up | skip]`` chunk interleave happens in VMEM: aligned lane
  slices when the chunk width is a multiple of the 128-lane tile, exact
  0/1 permutation matmuls on the MXU otherwise (each output lane is one
  copied input value — exact in any dtype, same trick as the pool's
  selection matmuls);
* the backward kernel reads the cat cotangent once and emits d_x (one
  matmul against the transposed weights), d_skip (inverse interleave),
  and accumulated d_kernel/d_bias — no slice/split/pad fusions.

Supported when the skip arrives lane-packed at p == 2 (the fused
encoder's native layout for the wide 256px stages); callers fall back to
the composed-XLA path otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unet_image_segmentation_tpu.ops.pallas import fused_sepconv as fs

P_OUT = 2  # emitted pack factor (row parity rides the w-group chunks)


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pick_tile(h2: int, w: int, c: int, f: int, ls: int) -> Optional[int]:
    """Output-row tile (even, divides 2H) whose working set fits VMEM."""
    del ls
    for th in (32, 16, 8, 4, 2):
        if h2 % th:
            continue
        th2 = th // 2
        per = (
            th2 * w * c * 2      # x block
            + th * w * 2 * f * 2  # skip block (th2, 2, W, 2F)
            + th * w * 4 * f * 2  # cat block (th2, 2, W, 4F)
            + th2 * w * 4 * f * 4  # y f32 temp
        )
        if 3 * per + c * 4 * f * 2 <= fs.vmem_budget(6):
            return th
    return None


def _perm_mat(f: int, dtype):
    """(4F, 4F) 0/1 permutation: [y_q0 y_q1 s_q0 s_q1] -> [y_q0 s_q0 y_q1 s_q1].

    Built from 2D iotas inside the kernel (no operand DMA); exact in any
    dtype — each output lane copies exactly one input lane.
    """
    n = 4 * f
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    d = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    dst_chunk = d // f
    dst_off = d % f
    # dst chunks (y0, s0, y1, s1) <- src chunks (0, 2, 1, 3): 2-bit swap
    src_chunk = (dst_chunk % 2) * 2 + dst_chunk // 2
    return (r == (src_chunk * f + dst_off)).astype(dtype)


def _regroup_mat(th2: int, wc: int, ws: int, k: int, K: int, dtype):
    """Block-diag 0/1 selector: skip chunk-k column ws -> cat column
    ws*K + k, batched over the th2 row-groups.  Exact copies on the MXU
    (each output row is one input row or zero)."""
    rows = th2 * wc
    cols = th2 * ws
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    d = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    t_r, wc_r = r // wc, r % wc
    t_c, ws_c = d // ws, d % ws
    return jnp.logical_and(t_r == t_c, wc_r == ws_c * K + k).astype(dtype)


def _regroup_mat_t(th2: int, wc: int, ws: int, k: int, K: int, dtype):
    """Transpose of :func:`_regroup_mat`, built directly from iotas (an
    in-kernel ``.T`` would lower as a real Mosaic transpose op)."""
    rows = th2 * ws
    cols = th2 * wc
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    d = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    t_r, ws_r = r // ws, r % ws
    t_c, wc_c = d // wc, d % wc
    return jnp.logical_and(t_r == t_c, wc_c == ws_r * K + k).astype(dtype)


def _expand_skip(s_par, th2, w_dim, f, K, dtype):
    """(th2, Ws, p_s*F) skip rows -> (th2, W, 2F) in cat column order.

    K == 1 (skip already packed 2): identity.  K > 1: the p_s-packed
    skip's 2F-wide lane chunk k holds cat columns congruent to k mod K;
    K exact selection matmuls scatter the chunks across the W dim."""
    if K == 1:
        return s_par
    ws_dim = s_par.shape[1]
    s2d = s_par.reshape(th2 * ws_dim, K * 2 * f)
    out = jnp.zeros((th2 * w_dim, 2 * f), jnp.float32)
    for k in range(K):
        rmat = _regroup_mat(th2, w_dim, ws_dim, k, K, dtype)
        out = out + jax.lax.dot(
            rmat,
            s2d[:, k * 2 * f : (k + 1) * 2 * f],
            preferred_element_type=jnp.float32,
        )
    return out.astype(dtype).reshape(th2, w_dim, 2 * f)


def _compress_dskip(ds_par, th2, w_dim, f, K, ws_dim, dtype):
    """Inverse of :func:`_expand_skip`: (th2, W, 2F) cat-order cotangent
    -> (th2, Ws, p_s*F) skip-packed layout (transposed selectors)."""
    if K == 1:
        return ds_par
    d2d = ds_par.reshape(th2 * w_dim, 2 * f)
    chunks = []
    for k in range(K):
        rmat_t = _regroup_mat_t(th2, w_dim, ws_dim, k, K, dtype)
        chunks.append(
            jax.lax.dot(
                rmat_t, d2d, preferred_element_type=jnp.float32
            )
        )
    out = jnp.concatenate(chunks, axis=-1)  # (th2*Ws, K*2F)
    return out.astype(dtype).reshape(th2, ws_dim, K * 2 * f)


def _fwd_kernel(
    x_ref,     # (1, th/2, W, C) VMEM
    w_ref,     # (C, 4F) VMEM — (di, dj, f) column order
    b_ref,     # (1, 4F) VMEM — bias tiled 4x
    s_ref,     # (1, th/2, 2, Ws, p_s*F) VMEM — skip row-pair view
    o_ref,     # (1, th/2, 2, W, 4F) VMEM — cat row-pair view (p_out == 2)
    *,
    f: int,
    aligned: bool,
    K: int,
):
    th2, w_dim, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    y = jax.lax.dot(
        x_ref[0].reshape(th2 * w_dim, c),
        w_ref[...],
        preferred_element_type=jnp.float32,
    ) + b_ref[0][None, :].astype(jnp.float32)
    y3 = y.astype(o_ref.dtype).reshape(th2, w_dim, 4 * f)
    if not aligned:
        perm = _perm_mat(f, o_ref.dtype)
    for par in range(2):
        y_par = y3[..., par * 2 * f : (par + 1) * 2 * f]   # (th2, W, 2F)
        s_par = _expand_skip(
            s_ref[0, :, par], th2, w_dim, f, K, o_ref.dtype
        )                                                   # (th2, W, 2F)
        if aligned:
            # F multiple of the lane tile: chunks concatenate directly
            cat = jnp.concatenate(
                [
                    y_par[..., :f],
                    s_par[..., :f],
                    y_par[..., f:],
                    s_par[..., f:],
                ],
                axis=-1,
            )
        else:
            z = jnp.concatenate([y_par, s_par], axis=-1)    # (th2, W, 4F)
            cat = (
                jax.lax.dot(
                    z.reshape(th2 * w_dim, 4 * f),
                    perm,
                    preferred_element_type=jnp.float32,
                )
                .astype(o_ref.dtype)
                .reshape(th2, w_dim, 4 * f)
            )
        o_ref[0, :, par] = cat


def _bwd_kernel(
    x_ref,     # (1, th/2, W, C) VMEM
    g_ref,     # (1, th/2, 2, W, 4F) VMEM — cat cotangent row-pair view
    w_ref,     # (4F, C) VMEM — transposed weights
    dx_ref,    # (1, th/2, W, C) VMEM
    ds_ref,    # (1, th/2, 2, Ws, p_s*F) VMEM
    dw_ref,    # (C, 4F) VMEM accumulated
    db_ref,    # (8, 4F) VMEM accumulated (row 0)
    dw_acc,    # scratch (C, 4F) f32
    db_acc,    # scratch (8, 4F) f32
    *,
    f: int,
    aligned: bool,
    K: int,
):
    th2, w_dim, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    ws_dim = ds_ref.shape[3]
    if not aligned:
        # The chunk swap (0,2,1,3) is an involution, so the inverse
        # permutation matrix IS the forward one (P.T == P) — no in-kernel
        # transpose op needed.
        permT = _perm_mat(f, g_ref.dtype)
    dys = []
    for par in range(2):
        g_par = g_ref[0, :, par]                            # (th2, W, 4F)
        if aligned:
            dy = jnp.concatenate([g_par[..., :f], g_par[..., 2 * f : 3 * f]], -1)
            ds = jnp.concatenate([g_par[..., f : 2 * f], g_par[..., 3 * f :]], -1)
        else:
            z = (
                jax.lax.dot(
                    g_par.reshape(th2 * w_dim, 4 * f),
                    permT,
                    preferred_element_type=jnp.float32,
                )
                .astype(g_ref.dtype)
                .reshape(th2, w_dim, 4 * f)
            )
            dy = z[..., : 2 * f]
            ds = z[..., 2 * f :]
        ds_ref[0, :, par] = _compress_dskip(
            ds, th2, w_dim, f, K, ws_dim, g_ref.dtype
        )
        dys.append(dy)
    dy_all = jnp.concatenate(dys, axis=-1).reshape(th2 * w_dim, 4 * f)
    dx = jax.lax.dot(dy_all, w_ref[...], preferred_element_type=jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype).reshape(th2, w_dim, c)

    xv = x_ref[0].reshape(th2 * w_dim, c)
    dw_tile = jax.lax.dot_general(
        xv,
        dy_all,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ones = jnp.ones((1, th2 * w_dim), jnp.float32)
    db_tile = jax.lax.dot(
        ones, dy_all.astype(jnp.float32), preferred_element_type=jnp.float32
    )[0]

    j = pl.program_id(1)
    first_tile = jnp.logical_and(pl.program_id(0) == 0, j == 0)

    @pl.when(first_tile)
    def _():
        dw_acc[...] = jnp.zeros_like(dw_acc)
        db_acc[...] = jnp.zeros_like(db_acc)

    dw_acc[...] = dw_acc[...] + dw_tile
    db_acc[0, :] = db_acc[0, :] + db_tile

    last = jnp.logical_and(
        pl.program_id(0) == pl.num_programs(0) - 1,
        j == pl.num_programs(1) - 1,
    )

    @pl.when(last)
    def _():
        dw_ref[...] = dw_acc[...]
        db_ref[...] = db_acc[...]


def _supported(x, kernel, skip, p_skip) -> Optional[Tuple[int, bool, int]]:
    b, h, w, c = x.shape
    kh, kw, f, c_in = kernel.shape
    if (kh, kw) != (2, 2) or c_in != c:
        return None
    if p_skip % 2 or p_skip < 2 or P_OUT != 2:
        return None
    if skip.shape != (b, 2 * h, (2 * w) // p_skip, p_skip * f):
        return None
    if (2 * f) % fs.LANE or c % fs.LANE or w % 8:
        return None  # lane-tile alignment of chunks / sublane-width sanity
    th = _pick_tile(2 * h, w, c, f, p_skip * f)
    if th is None:
        return None
    aligned = f % fs.LANE == 0
    return th, aligned, p_skip // 2


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _upconcat_core(x, kernel, bias, skip, meta):
    return _upconcat_fwd_impl(x, kernel, bias, skip, meta)[0]


def _upconcat_fwd_impl(x, kernel, bias, skip, meta):
    th, aligned, K = meta
    b, h, w, c = x.shape
    f = kernel.shape[2]
    th2 = th // 2
    n_tiles = (2 * h) // th
    ws = w // K           # skip W columns (pack p_s = 2K)
    ls = 2 * K * f        # skip lanes
    wmat = jnp.transpose(kernel, (3, 0, 1, 2)).reshape(c, 4 * f).astype(x.dtype)
    b4 = jnp.tile(bias.astype(jnp.float32), 4).reshape(1, 4 * f)
    skip5 = skip.reshape(b, h, 2, ws, ls)  # row-pair view (free reshape)
    out5 = pl.pallas_call(
        functools.partial(_fwd_kernel, f=f, aligned=aligned, K=K),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, th2, w, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((c, 4 * f), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 4 * f), lambda i, j: (0, 0)),
            pl.BlockSpec((1, th2, 2, ws, ls), lambda i, j: (i, j, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, th2, 2, w, 4 * f), lambda i, j: (i, j, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, 2, w, 4 * f), x.dtype),
        compiler_params=fs.vmem_params(),
        interpret=_use_interpret(),
    )(x, wmat, b4, skip5)
    cat = out5.reshape(b, 2 * h, w, 4 * f)  # free: merge row-pair dims
    return cat, (x, kernel)


def _upconcat_fwd(x, kernel, bias, skip, meta):
    cat, res = _upconcat_fwd_impl(x, kernel, bias, skip, meta)
    return cat, res


def _upconcat_bwd(meta, res, g):
    th, aligned, K = meta
    x, kernel = res
    skip_dtype = g.dtype
    b, h, w, c = x.shape
    f = kernel.shape[2]
    th2 = th // 2
    n_tiles = (2 * h) // th
    ws = w // K
    ls = 2 * K * f
    wmat_t = (
        jnp.transpose(kernel, (3, 0, 1, 2))
        .reshape(c, 4 * f)
        .T.astype(g.dtype)
    )
    g5 = g.reshape(b, h, 2, w, 4 * f)
    dx, ds5, dw4, db4 = pl.pallas_call(
        functools.partial(_bwd_kernel, f=f, aligned=aligned, K=K),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, th2, w, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, th2, 2, w, 4 * f), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((4 * f, c), lambda i, j: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, th2, w, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, th2, 2, ws, ls), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((c, 4 * f), lambda i, j: (0, 0)),
            pl.BlockSpec((8, 4 * f), lambda i, j: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
            jax.ShapeDtypeStruct((b, h, 2, ws, ls), skip_dtype),
            jax.ShapeDtypeStruct((c, 4 * f), jnp.float32),
            jax.ShapeDtypeStruct((8, 4 * f), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((c, 4 * f), jnp.float32),
            pltpu.VMEM((8, 4 * f), jnp.float32),
        ],
        compiler_params=fs.vmem_params(),
        interpret=_use_interpret(),
    )(x, g5, wmat_t)
    d_skip = ds5.reshape(b, 2 * h, ws, ls)
    # (C, 4F) -> (2, 2, F, C) in the Keras transpose-kernel layout
    d_kernel = jnp.transpose(dw4.reshape(c, 2, 2, f), (1, 2, 3, 0)).astype(
        kernel.dtype
    )
    d_bias = jnp.sum(db4[0].reshape(4, f), axis=0)
    return dx, d_kernel, d_bias, d_skip


_upconcat_core.defvjp(_upconcat_fwd, _upconcat_bwd)


def fused_upconcat(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    skip_packed: jax.Array,
    p_skip: int,
) -> Optional[jax.Array]:
    """Fused TransposeUp + [up | skip] concat in packed (p=2) layout.

    ``x``: (B, H, W, C) pre-upsample activation; ``kernel``: (2, 2, F, C)
    Keras transpose layout; ``skip_packed``: the fused encoder's native
    packed skip (B, 2H, W, 2F) with ``p_skip == 2``.  Returns the chain
    input ``cat`` packed at p=2 — (B, 2H, W, 4F) with lane chunks
    [up_q0 | skip_q0 | up_q1 | skip_q1] — exactly
    ``reshape(concat([up, skip], -1))`` of the unpacked tensors; or
    ``None`` when the configuration is unsupported (caller composes the
    XLA path).  Differentiable (fused backward kernel).
    """
    meta = _supported(x, kernel, skip_packed, p_skip)
    if meta is None:
        return None
    if bias is None:
        bias = jnp.zeros((kernel.shape[2],), jnp.float32)
    return _upconcat_core(
        x, kernel, bias, skip_packed.astype(x.dtype), meta
    )


def upconcat_reference(x, kernel, bias, skip_unpacked):
    """Composed-XLA oracle: conv_transpose_2x2 -> concat -> pack-2 view."""
    from unet_image_segmentation_tpu.ops.conv import conv_transpose_2x2

    up = conv_transpose_2x2(x, kernel, bias)
    cat = jnp.concatenate([up, skip_unpacked.astype(up.dtype)], axis=-1)
    b, h2, w2, c2 = cat.shape
    return cat.reshape(b, h2, w2 // 2, 2 * c2)
