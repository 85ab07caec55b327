"""ResNet (r-vector) speaker encoders, TPU-native flax implementation.

Behavioral spec: wespeaker/models/resnet.py (BasicBlock:35, Bottleneck:72,
ResNet:110, constructors :207-260).

TPU design: activations are (B, F, T, C) channels-last so every 3x3 conv is
an MXU matmul with C on lanes; the torch reference's (B, C, F, T) layout and
permutes disappear. Stats pooling flattens to (B, T, C*F) with feature index
d = c*F_out + f, matching the reference's (B, C*F, T) ASTP/TSTP ordering
(pooling_layers.py:125-126).
"""

from typing import Optional, Sequence, Type

import flax.linen as nn
import jax.numpy as jnp

from wespeaker_tpu.models.layers import conv2d
from wespeaker_tpu.models.pooling_layers import get_pooling, pooling_out_dim


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class BasicBlock(nn.Module):
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
            conv2d(self.planes, 3, stride=1, padding=1, bias=False,
                   name="conv2")(out))
        if self.stride != 1 or self.in_planes != self.planes * self.expansion:
            sc = conv2d(self.planes * self.expansion, 1, stride=self.stride,
                        bias=False, name="shortcut_conv")(x)
            sc = _bn(train, "shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class Bottleneck(nn.Module):
    in_planes: int
    planes: int
    stride: int = 1
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(_bn(train, "bn1")(
            conv2d(self.planes, 1, bias=False, name="conv1")(x)))
        out = nn.relu(_bn(train, "bn2")(
            conv2d(self.planes, 3, stride=self.stride, padding=1, bias=False,
                   name="conv2")(out)))
        out = _bn(train, "bn3")(
            conv2d(self.planes * self.expansion, 1, bias=False,
                   name="conv3")(out))
        if self.stride != 1 or self.in_planes != self.planes * self.expansion:
            sc = conv2d(self.planes * self.expansion, 1, stride=self.stride,
                        bias=False, name="shortcut_conv")(x)
            sc = _bn(train, "shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet(nn.Module):
    block: Type[nn.Module]
    num_blocks: Sequence[int]
    m_channels: int = 32
    feat_dim: int = 40
    embed_dim: int = 128
    pooling_func: str = "TSTP"
    two_emb_layer: bool = False

    def _layer(self, x, idx, planes, count, stride, in_planes, train):
        strides = [stride] + [1] * (count - 1)
        for i, s in enumerate(strides):
            x = self.block(in_planes, planes, s,
                           name=f"layer{idx}_{i}")(x, train)
            in_planes = planes * self.block.expansion
        return x, in_planes

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False, return_frame_feat: bool = False):
        """x: (B, T, F) -> embedding (B, embed_dim)."""
        m = self.m_channels
        # (B, T, F) -> (B, F, T, 1): freq is H, time is W, channels last.
        h = jnp.transpose(x, (0, 2, 1))[..., None]
        h = nn.relu(_bn(train, "bn1")(
            conv2d(m, 3, stride=1, padding=1, bias=False, name="conv1")(h)))
        in_planes = m
        h, in_planes = self._layer(h, 1, m, self.num_blocks[0], 1, in_planes, train)
        h, in_planes = self._layer(h, 2, m * 2, self.num_blocks[1], 2, in_planes, train)
        h, in_planes = self._layer(h, 3, m * 4, self.num_blocks[2], 2, in_planes, train)
        h, in_planes = self._layer(h, 4, m * 8, self.num_blocks[3], 2, in_planes, train)

        # (B, F', T', C) -> (B, T', C*F') with d = c*F' + f (reference order).
        b, fdim, tdim, c = h.shape
        if return_frame_feat:
            # public frame-level API (B, T, F'*C), d = f*C + c — the
            # reference's transpose(1,3)+flatten ordering (resnet.py:174-180);
            # the pooling path below keeps the c-major (B, C*F', T)
            # internal ordering
            return jnp.transpose(h, (0, 2, 1, 3)).reshape(
                b, tdim, fdim * c)
        feat = jnp.transpose(h, (0, 2, 3, 1)).reshape(b, tdim, c * fdim)
        if mask is not None:
            # time axis was downsampled 8x by the three stride-2 stages
            fmask = mask[:, ::8][:, :tdim] if mask.shape[1] >= tdim else None
        else:
            fmask = None

        stats_dim = (self.feat_dim // 8) * self.m_channels * 8
        pooled = get_pooling(self.pooling_func,
                             stats_dim * self.block.expansion,
                             name="pool")(feat, fmask, train)
        embed_a = nn.Dense(self.embed_dim, name="seg_1")(pooled)
        if self.two_emb_layer:
            out = nn.relu(embed_a)
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, use_scale=False, use_bias=False,
                               name="seg_bn_1")(out)
            return nn.Dense(self.embed_dim, name="seg_2")(out)
        return embed_a

    @property
    def pool_out_dim(self):
        stats_dim = (self.feat_dim // 8) * self.m_channels * 8
        return pooling_out_dim(self.pooling_func,
                               stats_dim * self.block.expansion)


def ResNet18(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False):
    return ResNet(BasicBlock, (2, 2, 2, 2), feat_dim=feat_dim,
                  embed_dim=embed_dim, pooling_func=pooling_func,
                  two_emb_layer=two_emb_layer)


def ResNet34(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False):
    return ResNet(BasicBlock, (3, 4, 6, 3), feat_dim=feat_dim,
                  embed_dim=embed_dim, pooling_func=pooling_func,
                  two_emb_layer=two_emb_layer)


def ResNet50(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False):
    return ResNet(Bottleneck, (3, 4, 6, 3), feat_dim=feat_dim,
                  embed_dim=embed_dim, pooling_func=pooling_func,
                  two_emb_layer=two_emb_layer)


def ResNet101(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False):
    return ResNet(Bottleneck, (3, 4, 23, 3), feat_dim=feat_dim,
                  embed_dim=embed_dim, pooling_func=pooling_func,
                  two_emb_layer=two_emb_layer)


def ResNet152(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False):
    return ResNet(Bottleneck, (3, 8, 36, 3), feat_dim=feat_dim,
                  embed_dim=embed_dim, pooling_func=pooling_func,
                  two_emb_layer=two_emb_layer)


def ResNet221(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False):
    return ResNet(Bottleneck, (6, 16, 48, 3), feat_dim=feat_dim,
                  embed_dim=embed_dim, pooling_func=pooling_func,
                  two_emb_layer=two_emb_layer)


def ResNet293(feat_dim, embed_dim, pooling_func="TSTP", two_emb_layer=False):
    return ResNet(Bottleneck, (10, 20, 64, 3), feat_dim=feat_dim,
                  embed_dim=embed_dim, pooling_func=pooling_func,
                  two_emb_layer=two_emb_layer)
