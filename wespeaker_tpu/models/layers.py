"""Shared flax building blocks for the speaker-model zoo.

Layout conventions (TPU-native, channels-last so the feature dim rides the
128-lane axis and convs lower onto the MXU):
  - 1D (TDNN-style) activations: (B, T, C)
  - 2D (ResNet-style) activations: (B, F, T, C)

Module/child names deliberately mirror the reference torch attribute names
(e.g. wespeaker/models/ecapa_tdnn.py, resnet.py) so that torch state_dicts
convert to flax variable trees mechanically (see utils/torch_compat.py).

BatchNorm: torch defaults eps=1e-5, momentum=0.1 -> flax momentum=0.9. Under
a jit-ed global batch the batch statistics are computed over the full
(sharded) batch, i.e. sync-BN semantics, which subsumes the reference's DDP
per-replica BN.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from wespeaker_tpu.ops.conv_dw_pack import (_eligible, conv2d_packed_dw,
                                            conv_dw_mode)
from wespeaker_tpu.ops.grouped_conv import grouped_conv


class GroupedConv(nn.Module):
    """nn.Conv drop-in for feature_group_count > 1 (same param names,
    shapes, and default inits), routed through ops/grouped_conv.py so the
    kernel gradient partitions correctly under GSPMD (XLA mis-scales the
    grouped-conv kernel cotangent when the batch is replicated over a mesh
    axis — see that module's docstring for the repro)."""
    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...]
    padding: Tuple[Tuple[int, int], ...]
    kernel_dilation: Tuple[int, ...]
    feature_group_count: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kshape = tuple(self.kernel_size) + (
            in_features // self.feature_group_count, self.features)
        kernel = self.param("kernel", nn.initializers.lecun_normal(), kshape)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        dtype = jnp.result_type(x.dtype, kernel.dtype)
        y = grouped_conv(x.astype(dtype), kernel.astype(dtype),
                         tuple(self.strides), tuple(self.padding),
                         tuple(self.kernel_dilation),
                         self.feature_group_count)
        if bias is not None:
            y = y + bias.astype(dtype)
        return y


class PackedDWConv(nn.Module):
    """nn.Conv drop-in (same param names/shapes/inits) that computes the
    FILTER gradient with the tap-packed Pallas kernel
    (ops/conv_dw_pack.py) when the call-time shape is eligible (3x3,
    stride 1, pad 1, groups 1, cin/cout <= 64 — where XLA's
    conv-backprop-filter sits at the MXU's skinny-output lane bound);
    otherwise numerically identical native path. Forward and dX are the
    native XLA ops either way."""
    features: int
    strides: Tuple[int, ...]
    padding: Tuple[Tuple[int, int], ...]
    kernel_dilation: Tuple[int, ...]
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kshape = (3, 3, x.shape[-1], self.features)
        kernel = self.param("kernel", nn.initializers.lecun_normal(), kshape)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        dtype = jnp.result_type(x.dtype, kernel.dtype)
        xk, kk = x.astype(dtype), kernel.astype(dtype)
        if _eligible(x.shape, kshape, self.strides, self.padding,
                     self.kernel_dilation, 1):
            y = conv2d_packed_dw(xk, kk, tuple(self.strides),
                                 tuple(self.padding),
                                 tuple(self.kernel_dilation))
        else:
            y = lax.conv_general_dilated(
                xk, kk, window_strides=tuple(self.strides),
                padding=tuple(self.padding),
                rhs_dilation=tuple(self.kernel_dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias.astype(dtype)
        return y


def _conv(features, kernel_size, strides, padding, dilation, groups, bias,
          name):
    if groups > 1:
        return GroupedConv(
            features=features, kernel_size=kernel_size, strides=strides,
            padding=padding, kernel_dilation=dilation,
            feature_group_count=groups, use_bias=bias, name=name)
    if (conv_dw_mode() == "packed" and kernel_size == (3, 3)
            and strides == (1, 1) and padding == ((1, 1), (1, 1))
            and dilation == (1, 1) and features <= 64):
        return PackedDWConv(features=features, strides=strides,
                            padding=padding, kernel_dilation=dilation,
                            use_bias=bias, name=name)
    return nn.Conv(
        features=features, kernel_size=kernel_size, strides=strides,
        padding=list(padding), kernel_dilation=dilation,
        feature_group_count=groups, use_bias=bias, name=name)


def conv1d(features, kernel_size, *, stride=1, padding=0, dilation=1,
           bias=True, groups=1, name=None):
    """torch nn.Conv1d equivalent on (B, T, C) input (explicit symmetric
    integer padding, matching torch's default padding semantics)."""
    return _conv(features, (kernel_size,), (stride,),
                 ((padding, padding),), (dilation,), groups, bias, name)


def conv2d(features, kernel_size, *, stride=1, padding=0, bias=True,
           groups=1, dilation=1, name=None):
    """torch nn.Conv2d equivalent on (B, H, W, C) input."""
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    return _conv(features, tuple(kernel_size), tuple(stride),
                 ((padding[0], padding[0]), (padding[1], padding[1])),
                 tuple(dilation), groups, bias, name)


def masked_mean(x, mask, axis, keepdims=False, eps=0.0):
    """Mean over `axis` counting only mask==1 positions. mask broadcasts to x."""
    if mask is None:
        return jnp.mean(x, axis=axis, keepdims=keepdims)
    total = jnp.sum(x * mask, axis=axis, keepdims=keepdims)
    count = jnp.sum(mask, axis=axis, keepdims=keepdims)
    return total / jnp.maximum(count, 1.0 + eps)


Dtype = Any
