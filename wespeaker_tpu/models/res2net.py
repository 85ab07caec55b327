"""Res2Net r-vector (hierarchical split-conv residual blocks).

Behavioral spec: wespeaker/models/res2net.py (BasicBlockRes2Net:34,
Res2Net:96, constructors :192-211). (B, F, T, C) channels-last.
"""

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from wespeaker_tpu.models.eres2net import relu20
from wespeaker_tpu.models.layers import conv2d
from wespeaker_tpu.models.pooling_layers import get_pooling


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class BasicBlockRes2Net(nn.Module):
    in_planes: int
    planes: int
    stride: int = 1
    base_width: int = 32
    scale: int = 2
    expansion = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        nums = self.scale - 1
        out = conv2d(width * self.scale, 1, stride=self.stride, bias=False,
                     name="conv1")(x)
        out = relu20(_bn(train, "bn1")(out))
        splits = [out[..., i * width:(i + 1) * width]
                  for i in range(self.scale)]
        sp = splits[0]
        outs = []
        for i in range(nums):
            if i >= 1:
                sp = sp + splits[i]
            sp = conv2d(width, 3, padding=1, bias=False, name=f"convs_{i}")(sp)
            sp = relu20(_bn(train, f"bns_{i}")(sp))
            outs.append(sp)
        outs.append(splits[nums])
        out = jnp.concatenate(outs, axis=-1)
        out = _bn(train, "bn3")(
            conv2d(self.planes * self.expansion, 1, bias=False,
                   name="conv3")(out))
        if self.stride != 1 or self.in_planes != self.expansion * self.planes:
            sc = conv2d(self.planes * self.expansion, 1, stride=self.stride,
                        bias=False, name="shortcut_conv")(x)
            sc = _bn(train, "shortcut_bn")(sc)
        else:
            sc = x
        return relu20(out + sc)


class Res2Net(nn.Module):
    m_channels: int
    num_blocks: tuple
    feat_dim: int = 80
    embed_dim: int = 192
    pooling_func: str = "TSTP"
    two_emb_layer: bool = False

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False, return_frame_feat: bool = False):
        m = self.m_channels
        h = jnp.transpose(x, (0, 2, 1))[..., None]
        h = nn.relu(_bn(train, "bn1")(
            conv2d(m, 3, padding=1, bias=False, name="conv1")(h)))
        in_planes = m
        for idx, (planes, count, stride) in enumerate(
                zip((m, m * 2, m * 4, m * 8), self.num_blocks,
                    (1, 2, 2, 2)), start=1):
            strides = [stride] + [1] * (count - 1)
            for i, s in enumerate(strides):
                h = BasicBlockRes2Net(in_planes, planes, s,
                                      name=f"layer{idx}_{i}")(h, train)
                in_planes = planes * BasicBlockRes2Net.expansion

        b, fdim, tdim, c = h.shape
        if return_frame_feat:
            # public frame-level API (B, T, F'*C), d = f*C + c — the
            # reference's transpose(1,3)+flatten ordering (res2net.py:170-177);
            # the pooling path below keeps the c-major (B, C*F', T)
            # internal ordering
            return jnp.transpose(h, (0, 2, 1, 3)).reshape(
                b, tdim, fdim * c)
        feat = jnp.transpose(h, (0, 2, 3, 1)).reshape(b, tdim, c * fdim)
        fmask = mask[:, ::8][:, :tdim] if mask is not None else None
        stats_dim = (self.feat_dim // 8) * self.m_channels * 8
        pooled = get_pooling(self.pooling_func,
                             stats_dim * BasicBlockRes2Net.expansion,
                             name="pool")(feat, fmask, train)
        embed_a = nn.Dense(self.embed_dim, name="seg_1")(pooled)
        if self.two_emb_layer:
            out = nn.relu(embed_a)
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, use_scale=False, use_bias=False,
                               name="seg_bn_1")(out)
            return nn.Dense(self.embed_dim, name="seg_2")(out)
        return embed_a


def Res2Net34_Base(feat_dim, embed_dim, pooling_func="TSTP",
                   two_emb_layer=False):
    return Res2Net(32, (3, 4, 6, 3), feat_dim=feat_dim, embed_dim=embed_dim,
                   pooling_func=pooling_func, two_emb_layer=two_emb_layer)


def Res2Net34_Large(feat_dim, embed_dim, pooling_func="TSTP",
                    two_emb_layer=False):
    return Res2Net(64, (3, 4, 6, 3), feat_dim=feat_dim, embed_dim=embed_dim,
                   pooling_func=pooling_func, two_emb_layer=two_emb_layer)
