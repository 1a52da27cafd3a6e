"""Device-side preprocessing: fused resize / normalize / pad.

The reference preprocesses on the host with OpenCV (``inference.py:100-110``:
uint8 BGR -> /255 -> bilinear resize).  At streaming-inference rates
(BASELINE configs[4]: batched 1024x1024 on v5e-8) host resize becomes the
bottleneck (SURVEY.md §7.3 hard part 6), so this module moves it on-device:
compact uint8 frames transfer over PCIe, and one fused XLA program does
normalize + bilinear resize + optional pad.

:func:`resize_bilinear` reproduces OpenCV's ``INTER_LINEAR`` convention —
half-pixel-centre sampling with edge clamping — so device-side outputs
match the host pipeline within float tolerance (mask-parity requirement,
SURVEY.md §7.3 hard part 2).  Gathers are expressed with
``jnp.take(axis=...)`` on precomputed index vectors, which XLA lowers to
efficient TPU dynamic-gathers along one axis.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _linear_coords(out_size: int, in_size: int):
    """OpenCV INTER_LINEAR source coordinates: half-pixel centres, clamped."""
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1.0)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    return lo, hi, frac


@functools.lru_cache(maxsize=64)
def _resize_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out, in) interpolation matrix: row o holds (1-frac) at lo[o] and
    frac at hi[o] (accumulated when they coincide at a clamped edge)."""
    lo, hi, frac = _linear_coords(out_size, in_size)
    mat = np.zeros((out_size, in_size), np.float32)
    np.add.at(mat, (np.arange(out_size), lo), 1.0 - frac)
    np.add.at(mat, (np.arange(out_size), hi), frac)
    return mat


def resize_bilinear(
    x: jax.Array, out_hw: Tuple[int, int]
) -> jax.Array:
    """Bilinear resize (..., H, W, C) -> (..., H', W', C), cv2 convention.

    Runs as two banded-matrix contractions on the MXU rather than
    per-axis gathers: each output row/column is a 2-term convex
    combination, so the (out, in) interpolation matrices have two
    entries per row and the matmul computes the identical arithmetic.
    Gather-based resize lowers catastrophically on TPU — measured
    1080p->1024 at 348 ms and the 1024->1080p mask upsample at 930 ms
    per 4-frame batch on v5e; the matmul form runs the pair in ~3 ms.
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    out = x
    if oh != h:
        mat_h = jnp.asarray(_resize_matrix(oh, h))
        out = jnp.einsum(
            "ij,...jwc->...iwc", mat_h, out,
            preferred_element_type=jnp.float32,
        )
    if ow != w:
        mat_w = jnp.asarray(_resize_matrix(ow, w))
        out = jnp.einsum(
            "kj,...hjc->...hkc", mat_w, out,
            preferred_element_type=jnp.float32,
        )
    return out


def resize_nearest(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbour resize with OpenCV INTER_NEAREST index rule."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    # cv2 INTER_NEAREST: src = floor(dst * scale)
    yi = np.minimum((np.arange(oh) * (h / oh)).astype(np.int32), h - 1)
    xi = np.minimum((np.arange(ow) * (w / ow)).astype(np.int32), w - 1)
    x = jnp.take(x, jnp.asarray(yi), axis=-3)
    return jnp.take(x, jnp.asarray(xi), axis=-2)


@functools.partial(jax.jit, static_argnames=("out_hw", "pad_to", "dtype_name"))
def preprocess_frames(
    frames_u8: jax.Array,
    out_hw: Tuple[int, int],
    pad_to: Optional[Tuple[int, int]] = None,
    dtype_name: str = "float32",
) -> jax.Array:
    """Fused device-side preprocess: uint8 -> /255 -> resize -> (pad).

    Matches the reference's normalize-then-resize ordering
    (``inference.py:107-109``).  ``pad_to`` zero-pads bottom/right so any
    resolution maps onto U-Net-compatible dims.
    """
    x = frames_u8.astype(jnp.float32) / 255.0
    x = resize_bilinear(x, out_hw)
    if pad_to is not None:
        ph, pw = pad_to
        oh, ow = out_hw
        if (ph, pw) != (oh, ow):
            pad_cfg = [(0, 0)] * (x.ndim - 3) + [
                (0, ph - oh), (0, pw - ow), (0, 0)
            ]
            x = jnp.pad(x, pad_cfg)
    return x.astype(jnp.dtype(dtype_name))


@functools.partial(jax.jit, static_argnames=("orig_hw",))
def postprocess_probs(
    probs: jax.Array,
    orig_hw: Tuple[int, int],
) -> jax.Array:
    """Device-side probability upsample back to the original resolution.

    (The threshold stays with the caller so both the mask image and the
    prob map remain available, mirroring ``inference.py:147-160``.)
    """
    return resize_bilinear(probs, orig_hw)
