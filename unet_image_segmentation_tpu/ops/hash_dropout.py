"""Deterministic position-hash dropout (counter-based, stateless).

The reference applies ``tf.keras.layers.Dropout`` after the bottleneck and
on the first three decoder concats (reference ``model/u_net.py:75-99``).
Inside the fused Pallas training chains a *stateful* PRNG is the wrong
tool: the forward and backward kernels tile the tensor differently (and
re-derive the conv input from the saved pre-dropout residual), so a
sampled mask would have to be materialized to HBM — exactly the round
trip the chains exist to remove.

Instead the mask is a pure function of each element's absolute LOGICAL
coordinates ``(b, h, w, c)`` and a per-layer-per-step seed: a murmur3
finalizer over the flat logical index.  Any kernel — forward, backward,
differently tiled, packed into ``(B, H, W/p, p*C)`` lane layout or not —
regenerates bit-identical keep decisions from coordinates it already has,
and the pure-``jnp`` oracle below shares the exact integer arithmetic, so
Pallas-vs-XLA parity tests stay EXACT with dropout enabled.

Statistical notes: the murmur3 finalizer is a measured-good avalanche
mix (each input bit flips each output bit with p~0.5); masks decorrelate
across seeds, and the keep decision uses the top 31 bits uniformly.
This matches the quality bar of counter-based RNGs (Philox/Threefry
family) for dropout purposes, at ~10 integer VPU ops per element.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# murmur3 fmix32 multiplicative constants, as wrapped int32
_M1 = np.array(0x85EBCA6B, np.uint32).astype(np.int64).astype(np.int32)
_M2 = np.array(0xC2B2AE35, np.uint32).astype(np.int64).astype(np.int32)
_POS = np.int32(0x7FFFFFFF)


def keep_threshold(rate: float) -> int:
    """31-bit threshold: keep iff ``hash & 0x7fffffff < threshold``."""
    return min(int(round((1.0 - rate) * 2147483648.0)), 2147483647)


def mix_hash(idx: jax.Array, seed: jax.Array) -> jax.Array:
    """murmur3 fmix32 of ``idx ^ seed`` on int32 (wrapping semantics)."""
    h = idx ^ seed
    h = h ^ lax.shift_right_logical(h, 16)
    h = h * _M1
    h = h ^ lax.shift_right_logical(h, 13)
    h = h * _M2
    h = h ^ lax.shift_right_logical(h, 16)
    return h


def keep_from_idx(idx: jax.Array, seed: jax.Array, thresh: int) -> jax.Array:
    """Boolean keep mask from int32 logical indices (shared by the Pallas
    kernels and the jnp oracle — the single source of mask truth)."""
    return (mix_hash(idx, seed) & _POS) < np.int32(thresh)


def logical_idx_packed(
    bidx: jax.Array,   # scalar or array: batch index/indices
    rows: jax.Array,   # absolute H rows
    wcol: jax.Array,   # packed W column
    lane: jax.Array,   # packed channel lane in [0, p*c)
    h_total: int,
    wp: int,
    p: int,
    c: int,
) -> jax.Array:
    """Flat LOGICAL (b, h, w, c) index of packed-layout coordinates.

    Packed layout ``(B, H, W/p, p*C)`` is a pure row-major reshape of
    NHWC, so the flat logical index of element ``[b, h, wq, j]`` is just
    the flat PACKED index: with ``j = q*c + s`` (``q`` the w-offset,
    ``s`` the channel), ``w_log*c + c_log = (wq*p + q)*c + s =
    wq*(p*c) + j`` — layout invariance for free, no //, %, or
    power-of-two requirement.  int32 wrap-around on huge tensors is
    harmless: it is identical everywhere the index is computed.
    """
    pc = np.int32(p * c)
    return (
        bidx * np.int32(h_total) + rows
    ) * np.int32(wp) * pc + wcol * pc + lane


def slab_keep_mask(
    bidx: jax.Array,
    row0: jax.Array,
    n_rows: int,
    wp: int,
    pc: int,
    h_total: int,
    p: int,
    c: int,
    seed: jax.Array,
    thresh: int,
) -> jax.Array:
    """(n_rows, wp, pc) keep mask for slab rows [row0, row0+n_rows).

    Used INSIDE the chain kernels: ``row0`` may be -1 for a halo slab —
    the out-of-range row's mask is garbage but those rows are zero-filled
    by the caller, so the values never matter.
    """
    rows = row0 + lax.broadcasted_iota(jnp.int32, (n_rows, wp, pc), 0)
    wcol = lax.broadcasted_iota(jnp.int32, (n_rows, wp, pc), 1)
    lane = lax.broadcasted_iota(jnp.int32, (n_rows, wp, pc), 2)
    idx = logical_idx_packed(bidx, rows, wcol, lane, h_total, wp, p, c)
    return keep_from_idx(idx, seed, thresh)


def array_keep_mask(
    shape4: tuple, p: int, c: int, seed: jax.Array, thresh: int
) -> jax.Array:
    """Full-array keep mask for a packed ``(B, H, Wp, pC)`` tensor (the
    jnp oracle form; ``p=1`` covers plain NHWC)."""
    b, h, wp, pc = shape4
    bidx = lax.broadcasted_iota(jnp.int32, shape4, 0)
    rows = lax.broadcasted_iota(jnp.int32, shape4, 1)
    wcol = lax.broadcasted_iota(jnp.int32, shape4, 2)
    lane = lax.broadcasted_iota(jnp.int32, shape4, 3)
    idx = logical_idx_packed(bidx, rows, wcol, lane, h, wp, p, c)
    return keep_from_idx(idx, seed, thresh)


def apply_keep(x: jax.Array, keep: jax.Array, inv_keep: float) -> jax.Array:
    """``where(keep, x * 1/keep_prob, 0)`` with f32 scaling, cast back to
    ``x.dtype`` — the exact arithmetic the kernels apply in VMEM."""
    scaled = x.astype(jnp.float32) * jnp.float32(inv_keep)
    return jnp.where(keep, scaled, 0.0).astype(x.dtype)


def hash_dropout(
    x: jax.Array,
    seed: jax.Array,
    rate: float,
    packed: Optional[int] = None,
) -> jax.Array:
    """Stateless dropout of ``x`` (NHWC, or packed ``(B,H,W/p,p*C)`` with
    ``packed=p``).  Differentiable: XLA regenerates the mask in the
    backward (a handful of fused integer ops — nothing is stored)."""
    if rate <= 0.0:
        return x
    p = packed or 1
    c = x.shape[-1] // p
    keep = array_keep_mask(x.shape, p, c, jnp.asarray(seed, jnp.int32),
                           keep_threshold(rate))
    return apply_keep(x, keep, 1.0 / (1.0 - rate))


def seed_from_rng(rng: jax.Array) -> jax.Array:
    """Scalar int32 seed from a JAX PRNG key (any impl, typed or raw)."""
    bits = jax.random.bits(rng, dtype=jnp.uint32)
    return lax.bitcast_convert_type(bits, jnp.int32)
