"""Functional convolution ops, laid out for the TPU MXU.

These back the Flax modules in :mod:`..models.layers`. All tensors are NHWC
(the TPU-native layout) and all kernels use Keras-compatible shapes so
reference ``.h5`` checkpoints import without transposition gymnastics:

* depthwise kernel  ``(kh, kw, C, 1)``   (Keras SeparableConv2D.depthwise)
* pointwise kernel  ``(1, 1, C, F)``     (Keras SeparableConv2D.pointwise)
* transpose kernel  ``(2, 2, F, C)``     (Keras Conv2DTranspose)

TPU-first design notes:

* The pointwise conv and the 2x2-stride-2 transpose conv are expressed as
  plain matmuls (``jnp.einsum``) — the MXU's native operation — rather than
  generic conv primitives.  For kernel=stride=2 and 'same' padding, every
  output pixel of a transpose conv receives exactly one kernel tap, so the
  op *is* a matmul followed by a pixel-shuffle reshape (no overlap-add).
* The depthwise 3x3 is the one VPU-bound op; it is the Pallas fusion target
  (``ops/pallas/fused_sepconv.py`` fuses depthwise+pointwise+BN+ReLU into a
  single VMEM-resident kernel for inference).
* MaxPool 2x2 uses reduce_window (measured faster than reshape+max on
  v5e: the reshape formulation induces layout-conversion copies downstream).
* Decoder skip-concats are factored away: ``separable_conv2d_pair`` computes
  ``sepconv(concat(a, b))`` as two half-convs summed with sliced kernels,
  eliminating the concat materialization and its relayout copies.

Reference behaviours rebuilt here: SeparableConv2D / Conv2DTranspose /
MaxPooling2D usage in ``model/u_net.py:14-101``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_DN_NHWC = ("NHWC", "HWIO", "NHWC")


def depthwise_conv2d(
    x: jax.Array,
    kernel: jax.Array,
    *,
    padding: str = "SAME",
) -> jax.Array:
    """Depthwise 2-D conv, channel multiplier 1.

    x: (B, H, W, C); kernel: (kh, kw, C, 1) (Keras layout).
    """
    kh, kw, c, mult = kernel.shape
    assert mult == 1, "depth multiplier != 1 not supported"
    # lax depthwise layout: rhs (kh, kw, 1, C*mult) with feature_group_count=C.
    rhs = jnp.transpose(kernel, (0, 1, 3, 2)).reshape(kh, kw, 1, c * mult)
    return lax.conv_general_dilated(
        x,
        rhs.astype(x.dtype),
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=_DN_NHWC,
        feature_group_count=c,
    )


def pointwise_conv2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """1x1 conv as an MXU matmul. kernel: (1, 1, C, F) or (C, F)."""
    if kernel.ndim == 4:
        kernel = kernel.reshape(kernel.shape[-2], kernel.shape[-1])
    y = jnp.einsum(
        "bhwc,cf->bhwf",
        x,
        kernel.astype(x.dtype),
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def separable_conv2d(
    x: jax.Array,
    depthwise_kernel: jax.Array,
    pointwise_kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    padding: str = "SAME",
) -> jax.Array:
    """SeparableConv2D = depthwise then pointwise (+ optional bias)."""
    y = depthwise_conv2d(x, depthwise_kernel, padding=padding)
    return pointwise_conv2d(y, pointwise_kernel, bias)


def separable_conv2d_pair(
    a: jax.Array,
    b: jax.Array,
    depthwise_kernel: jax.Array,
    pointwise_kernel: jax.Array,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """``separable_conv2d(concat([a, b], -1), ...)`` without the concat.

    A depthwise conv acts per channel and a 1x1 conv is linear in channels,
    so the concatenated block factors exactly into two half-convs summed:
    kernels are sliced views (params stay checkpoint-identical).  Avoids
    materializing the (B, H, W, Ca+Cb) concat tensor — which on TPU also
    triggers layout-conversion copies when the operands' layouts disagree
    (the decoder's [upsampled, skip] case, reference u_net.py:96).
    """
    ca = a.shape[-1]
    dw = depthwise_kernel
    pw = pointwise_kernel.reshape(pointwise_kernel.shape[-2], pointwise_kernel.shape[-1])
    ya = depthwise_conv2d(a, dw[:, :, :ca])
    yb = depthwise_conv2d(b, dw[:, :, ca:])
    f = pw.shape[-1]
    y = jnp.einsum("bhwc,cf->bhwf", ya, pw[:ca].astype(ya.dtype),
                   preferred_element_type=ya.dtype)
    y = y + jnp.einsum("bhwc,cf->bhwf", yb, pw[ca:].astype(yb.dtype),
                       preferred_element_type=yb.dtype)
    del f
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    padding: str = "SAME",
) -> jax.Array:
    """Plain 2-D conv; kernel (kh, kw, C, F) (Keras/HWIO layout)."""
    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=_DN_NHWC,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv_transpose_2x2(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Keras ``Conv2DTranspose(F, kernel_size=2, strides=2, padding='same')``.

    kernel: (2, 2, F, C) (Keras transpose layout: ..., out, in).

    With kernel == stride there is no overlap-add: output pixel
    ``(2h+i, 2w+j, f) = sum_c x[h, w, c] * K[i, j, f, c]``.  So we run one
    (B*H*W, C) x (C, 4F) matmul on the MXU and pixel-shuffle the result —
    dramatically cheaper on TPU than a general conv_transpose lowering.
    Rebuilds reference ``model/u_net.py:91-97`` decoder upsampling.
    """
    b, h, w, c = x.shape
    kh, kw, f, c_in = kernel.shape
    assert (kh, kw) == (2, 2) and c_in == c, (kernel.shape, x.shape)
    # (2,2,F,C) -> (C, 2,2,F) -> (C, 4F)
    wmat = jnp.transpose(kernel, (3, 0, 1, 2)).reshape(c, 4 * f)
    y = jnp.einsum(
        "bhwc,cf->bhwf", x, wmat.astype(x.dtype), preferred_element_type=x.dtype
    )
    y = y.reshape(b, h, w, 2, 2, f)
    # (B, H, 2, W, 2, F) -> (B, 2H, 2W, F)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, 2 * h, 2 * w, f)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv_transpose_2x2_packed(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    out_pack: int = 2,
) -> jax.Array:
    """:func:`conv_transpose_2x2` emitting a PACKED ``(B, 2H, 2W/p, p*F)``
    output for the fused training chain's lane-packed layout.

    With kernel == stride the output row parity selects the ``di`` taps,
    so the op splits into two ``(C, 2F)`` matmuls whose column order
    ``(dj, f)`` IS the pack-2 chunk layout: a leading-dim stack
    interleaves the row parities with no 6D transpose (the transpose in
    the unpacked form costs a multi-ms layout copy per decoder stage on
    the 256px train step).  ``out_pack > 2`` adds one repack reshape.
    """
    b, h, w, c = x.shape
    kh, kw, f, c_in = kernel.shape
    assert (kh, kw) == (2, 2) and c_in == c, (kernel.shape, x.shape)
    assert out_pack >= 2 and (2 * w) % out_pack == 0
    wmat = jnp.transpose(kernel, (3, 0, 1, 2)).reshape(c, 4 * f).astype(x.dtype)
    y_lo = jnp.einsum(
        "bhwc,cf->bhwf", x, wmat[:, : 2 * f], preferred_element_type=x.dtype
    )
    y_hi = jnp.einsum(
        "bhwc,cf->bhwf", x, wmat[:, 2 * f :], preferred_element_type=x.dtype
    )
    if bias is not None:
        b2 = jnp.tile(bias.astype(y_lo.dtype), 2)
        y_lo = y_lo + b2
        y_hi = y_hi + b2
    up2 = jnp.stack([y_lo, y_hi], axis=2).reshape(b, 2 * h, w, 2 * f)
    if out_pack != 2:
        up2 = up2.reshape(b, 2 * h, 2 * w, f).reshape(
            b, 2 * h, (2 * w) // out_pack, out_pack * f
        )
    return up2


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """2x2 stride-2 max pool (reference enc pooling, u_net.py:69).

    Uses reduce_window: measured on v5e it avoids the layout-conversion
    copies a reshape+max formulation induces downstream (~5 ms/step on
    the 256px train step).
    """
    assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0, f"odd spatial dims {x.shape}"
    init = (
        -jnp.inf
        if jnp.issubdtype(x.dtype, jnp.floating)
        # int8 path of the quantized graph (dtype must match the operand)
        else jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype)
    )
    return lax.reduce_window(
        x, init, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def batch_norm_inference(
    x: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    eps: float = 1e-3,
) -> jax.Array:
    """Inference-mode BN as a folded affine (Keras epsilon default 1e-3)."""
    scale = gamma * lax.rsqrt(var + eps)
    offset = beta - mean * scale
    return x * scale.astype(x.dtype) + offset.astype(x.dtype)
