"""SimAM-ResNet with ASP pooling (VoxBlink models).

Behavioral spec: wespeaker/models/samresnet.py (SimAMBasicBlock:21 with the
parameter-free SimAM attention :65-70, ResNet trunk :73, SimAM_ResNet*_ASP
:134-167). (B, F, T, C) channels-last.
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from wespeaker_tpu.models.layers import conv2d
from wespeaker_tpu.models.pooling_layers import ASP


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


def simam(x, lambda_p=1e-4):
    """Parameter-free attention: x * sigmoid(E_inv) with E_inv from the
    per-channel spatial energy (samresnet.py:65-70). Spatial dims here are
    (F, T) = axes (1, 2)."""
    n = x.shape[1] * x.shape[2] - 1
    d = (x - jnp.mean(x, axis=(1, 2), keepdims=True)) ** 2
    v = jnp.sum(d, axis=(1, 2), keepdims=True) / n
    e_inv = d / (4 * (v + lambda_p)) + 0.5
    return x * nn.sigmoid(e_inv)


class SimAMBasicBlock(nn.Module):
    in_planes: int
    planes: int
    stride: int = 1
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(_bn(train, "bn1")(
            conv2d(self.planes, 3, stride=self.stride, padding=1, bias=False,
                   name="conv1")(x)))
        out = _bn(train, "bn2")(
            conv2d(self.planes, 3, padding=1, bias=False, name="conv2")(out))
        out = simam(out)
        if self.stride != 1 or self.in_planes != self.planes:
            sc = conv2d(self.planes, 1, stride=self.stride, bias=False,
                        name="downsample_conv")(x)
            sc = _bn(train, "downsample_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class SimAMResNetTrunk(nn.Module):
    in_planes: int
    num_blocks: Sequence[int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.in_planes
        h = nn.relu(_bn(train, "bn1")(
            conv2d(p, 3, padding=1, bias=False, name="conv1")(x)))
        in_planes = p
        for idx, (planes, count, stride) in enumerate(
                zip((p, p * 2, p * 4, p * 8), self.num_blocks, (1, 2, 2, 2)),
                start=1):
            strides = [stride] + [1] * (count - 1)
            for i, s in enumerate(strides):
                h = SimAMBasicBlock(in_planes, planes, s,
                                    name=f"layer{idx}_{i}")(h, train)
                in_planes = planes
        return h


class SimAM_ResNet_ASP(nn.Module):
    in_planes: int = 64
    num_blocks: Sequence[int] = (3, 4, 6, 3)
    embed_dim: int = 256
    feat_dim: int = 80  # acoustic_dim in the reference

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False, return_frame_feat: bool = False):
        h = jnp.transpose(x, (0, 2, 1))[..., None]
        h = SimAMResNetTrunk(self.in_planes, self.num_blocks,
                             name="front")(h, train)
        b, fdim, tdim, c = h.shape
        if return_frame_feat:
            # public frame-level API (B, T, F'*C), d = f*C + c — the
            # reference's transpose(1,3)+flatten ordering (resnet.py:174-180 convention);
            # the pooling path below keeps the c-major (B, C*F', T)
            # internal ordering
            return jnp.transpose(h, (0, 2, 1, 3)).reshape(
                b, tdim, fdim * c)
        feat = jnp.transpose(h, (0, 2, 3, 1)).reshape(b, tdim, c * fdim)
        fmask = mask[:, ::8][:, :tdim] if mask is not None else None
        pooled = ASP(self.in_planes * 8 * (self.feat_dim // 8),
                     name="pooling")(feat, fmask, train)
        return nn.Dense(self.embed_dim, name="bottleneck")(pooled)


def SimAM_ResNet34_ASP(in_planes=64, embed_dim=256, acoustic_dim=80,
                       feat_dim=None, **_):
    return SimAM_ResNet_ASP(in_planes, (3, 4, 6, 3), embed_dim,
                            feat_dim or acoustic_dim)


def SimAM_ResNet100_ASP(in_planes=64, embed_dim=256, acoustic_dim=80,
                        feat_dim=None, **_):
    return SimAM_ResNet_ASP(in_planes, (6, 16, 24, 3), embed_dim,
                            feat_dim or acoustic_dim)
