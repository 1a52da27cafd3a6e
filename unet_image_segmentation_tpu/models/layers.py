"""Flax building blocks for the TPU U-Net.

Parameter shapes intentionally mirror Keras so that reference-trained
checkpoints (``.h5``) import 1:1 (see :mod:`..utils.keras_import`):

* ``SeparableConv``: ``depthwise_kernel (k,k,C,1)``, ``pointwise_kernel
  (1,1,C,F)``, ``bias (F,)`` — reference ``model/u_net.py:14-21``.
* ``ConvBlock``: [Separable]Conv -> BatchNorm -> ReLU with
  ``use_bias = not use_batch_norm`` — reference ``model/u_net.py:5-26``.
* ``TransposeUp``: ``kernel (2,2,F,C)``, ``bias (F,)`` — reference
  ``model/u_net.py:91-97`` (computed as a matmul + pixel shuffle, see
  :func:`..ops.conv.conv_transpose_2x2`).

BatchNorm uses the Keras defaults (momentum 0.99, epsilon 1e-3) rather than
the Flax defaults, for numerical parity.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unet_image_segmentation_tpu.ops import conv as conv_ops

Dtype = Any

# Keras kernel default: glorot_uniform. Flax's variance_scaling computes
# fan-in/out from the trailing two axes + receptive field, identically to
# Keras' _compute_fans, so distributions match on Keras-shaped kernels.
glorot_uniform = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")


class SeparableConv(nn.Module):
    """Depthwise(k x k) + pointwise(1x1) conv, Keras SeparableConv2D parity.

    When a second input ``x2`` is given, computes the conv over the channel
    concatenation ``[x, x2]`` *without materializing it* (see
    :func:`..ops.conv.separable_conv2d_pair`); the parameter tree is
    identical to the concat formulation.
    """

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, x2: Optional[jax.Array] = None) -> jax.Array:
        c = x.shape[-1] + (x2.shape[-1] if x2 is not None else 0)
        k = self.kernel_size
        depthwise = self.param(
            "depthwise_kernel", glorot_uniform, (k, k, c, 1), jnp.float32
        )
        pointwise = self.param(
            "pointwise_kernel", glorot_uniform, (1, 1, c, self.features), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        if x2 is not None:
            return conv_ops.separable_conv2d_pair(
                x.astype(self.dtype), x2.astype(self.dtype),
                depthwise, pointwise, bias,
            )
        return conv_ops.separable_conv2d(
            x.astype(self.dtype), depthwise, pointwise, bias
        )


class Conv(nn.Module):
    """Plain Conv2D with Keras-shaped kernel (kh, kw, C, F)."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        params_only: bool = False,
        in_features: Optional[int] = None,
    ) -> Any:
        c = in_features if in_features is not None else x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", glorot_uniform, (k, k, c, self.features), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        if params_only:
            # fused-head path: declare the identical variable tree, return
            # the raw kernels (checkpoints interchangeable with this path)
            return kernel, bias
        x = x.astype(self.dtype)
        if k == 1:
            return conv_ops.pointwise_conv2d(x, kernel, bias)
        return conv_ops.conv2d(x, kernel, bias)


class SepConvParams(nn.Module):
    """Parameter-only twin of :class:`SeparableConv` for the fused path.

    Declares the identical variable tree (same names/shapes/initializers)
    and returns the raw kernels so the parent can feed the Pallas fused
    sepconv+BN+ReLU kernel. Checkpoints are interchangeable between the
    XLA and Pallas paths.
    """

    features: int
    kernel_size: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        k = self.kernel_size
        dw = self.param(
            "depthwise_kernel", glorot_uniform, (k, k, in_features, 1), jnp.float32
        )
        pw = self.param(
            "pointwise_kernel", glorot_uniform, (1, 1, in_features, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return dw, pw, bias


class BatchNormParams(nn.Module):
    """Parameter-only twin of ``nn.BatchNorm`` (same variable tree)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        return scale, bias, mean, var


class ConvBlock(nn.Module):
    """[Separable]Conv -> BN -> ReLU (reference conv_block, u_net.py:5-26).

    ``use_pallas=True`` routes the separable variant through the fused
    Pallas kernel (:mod:`..ops.pallas.fused_sepconv`): at inference the
    whole block (incl. folded BN) is one VMEM-resident kernel; in training
    the fused sepconv forward is used and BN batch statistics are computed
    explicitly with Keras-identical semantics (momentum 0.99, eps 1e-3,
    biased variance).
    """

    features: int
    kernel_size: int = 3
    use_batch_norm: bool = True
    conv_type: str = "separable"  # 'separable' | 'full'
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None  # set for cross-replica BN stats
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        x2: Optional[jax.Array] = None,
        params_only: bool = False,
        in_features: Optional[int] = None,
    ) -> Any:
        if params_only:
            # Declare the identical variable tree and hand the raw params
            # (+ BN mutable refs) to the caller — the whole-stage fused
            # training chain (ops/pallas/fused_train.py) consumes blocks
            # jointly, so the parent assembles the stage. Checkpoints stay
            # interchangeable with every other path.
            assert self.conv_type == "separable" and self.use_batch_norm
            dw, pw, _ = SepConvParams(
                features=self.features,
                kernel_size=self.kernel_size,
                use_bias=False,
                name="sepconv",
            )(in_features if in_features is not None else x.shape[-1])
            scale, offset, mean_var, var_var = BatchNormParams(
                features=self.features, name="bn"
            )()
            return dw, pw, scale, offset, mean_var, var_var
        if self.use_pallas and self.conv_type == "separable" and self.kernel_size == 3:
            if x2 is not None:
                x = jnp.concatenate([x, x2], axis=-1)
            return self._fused_call(x, train)
        conv_cls: Callable[..., nn.Module]
        if self.conv_type == "separable":
            conv_cls, conv_name = SeparableConv, "sepconv"
        elif self.conv_type == "full":
            conv_cls, conv_name = Conv, "conv"
        else:
            raise ValueError(f"conv_type must be 'separable'|'full', got {self.conv_type!r}")
        if x2 is not None and self.conv_type != "separable":
            x, x2 = jnp.concatenate([x, x2], axis=-1), None
        conv = conv_cls(
            features=self.features,
            kernel_size=self.kernel_size,
            use_bias=not self.use_batch_norm,
            dtype=self.dtype,
            name=conv_name,
        )
        x = conv(x, x2) if x2 is not None else conv(x)
        if self.use_batch_norm:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=self.dtype,
                axis_name=self.bn_axis_name if train else None,
                name="bn",
            )(x)
        return nn.relu(x)

    def _fused_call(self, x: jax.Array, train: bool) -> jax.Array:
        from unet_image_segmentation_tpu.ops.pallas.fused_sepconv import (
            fused_sepconv_bn_relu,
            sepconv_apply,
        )

        eps, momentum = 1e-3, 0.99
        dw, pw, bias = SepConvParams(
            features=self.features,
            kernel_size=self.kernel_size,
            use_bias=not self.use_batch_norm,
            name="sepconv",
        )(x.shape[-1])
        x = x.astype(self.dtype)
        if not self.use_batch_norm:
            y = fused_sepconv_bn_relu(x, dw, pw, bias=bias, relu=True)
            return y

        scale, offset, mean_var, var_var = BatchNormParams(
            features=self.features, name="bn"
        )()
        if not train:
            # whole block as ONE fused kernel with BN folded in
            return fused_sepconv_bn_relu(
                x, dw, pw, bias=None,
                bn_scale=scale, bn_offset=offset,
                bn_mean=mean_var.value, bn_var=var_var.value,
                eps=eps, relu=True,
            )
        # training: fused sepconv forward emitting BN batch moments in the
        # same kernel pass (no separate statistics read of the activations)
        from unet_image_segmentation_tpu.ops.pallas.fused_sepconv import (
            sepconv_apply_stats,
        )

        y, stat_sum, stat_sq = sepconv_apply_stats(x, dw, pw)
        yf = y.astype(jnp.float32)
        n = y.shape[0] * y.shape[1] * y.shape[2]
        batch_mean = stat_sum / n
        batch_sq = stat_sq / n
        if self.bn_axis_name is not None:
            batch_mean = jax.lax.pmean(batch_mean, self.bn_axis_name)
            batch_sq = jax.lax.pmean(batch_sq, self.bn_axis_name)
        batch_var = batch_sq - jnp.square(batch_mean)
        if not self.is_initializing():
            mean_var.value = momentum * mean_var.value + (1 - momentum) * batch_mean
            var_var.value = momentum * var_var.value + (1 - momentum) * batch_var
        inv = jax.lax.rsqrt(batch_var + eps) * scale
        y = (yf - batch_mean) * inv + offset
        return nn.relu(y).astype(self.dtype)


class TransposeUp(nn.Module):
    """Conv2DTranspose(features, k=2, s=2, 'same') as matmul+pixel-shuffle."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, out_pack: int = 1, params_only: bool = False
    ):
        c = x.shape[-1]
        kernel = self.param(
            "kernel", glorot_uniform, (2, 2, self.features, c), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        if params_only:
            # fused paths (ops/pallas/fused_upconcat.py) consume the raw
            # params; the variable tree stays identical to the module path
            return kernel, bias
        if out_pack > 1:
            return conv_ops.conv_transpose_2x2_packed(
                x.astype(self.dtype), kernel, bias, out_pack
            )
        return conv_ops.conv_transpose_2x2(x.astype(self.dtype), kernel, bias)
