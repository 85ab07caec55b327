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

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def conv1d(features, kernel_size, *, stride=1, padding=0, dilation=1,
           bias=True, groups=1, name=None):
    """torch nn.Conv1d equivalent on (B, T, C) input (explicit symmetric
    integer padding, matching torch's default padding semantics)."""
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size,),
        strides=(stride,),
        padding=[(padding, padding)],
        kernel_dilation=(dilation,),
        feature_group_count=groups,
        use_bias=bias,
        name=name,
    )


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
    return nn.Conv(
        features=features,
        kernel_size=kernel_size,
        strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        kernel_dilation=dilation,
        feature_group_count=groups,
        use_bias=bias,
        name=name,
    )


def masked_mean(x, mask, axis, keepdims=False, eps=0.0):
    """Mean over `axis` counting only mask==1 positions. mask broadcasts to x."""
    if mask is None:
        return jnp.mean(x, axis=axis, keepdims=keepdims)
    total = jnp.sum(x * mask, axis=axis, keepdims=keepdims)
    count = jnp.sum(mask, axis=axis, keepdims=keepdims)
    return total / jnp.maximum(count, 1.0 + eps)


Dtype = Any
