"""ERes2Net: enhanced Res2Net with local/global attentional feature fusion.

Behavioral spec: wespeaker/models/eres2net.py (ReLU=hardtanh(0,20):44,
AFF:75, BasicBlockERes2Net:106, BasicBlockERes2Net_diff_AFF:171,
ERes2Net:243, constructors :394-427). (B, F, T, C) channels-last.
"""

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from wespeaker_tpu.models.layers import conv2d
from wespeaker_tpu.models.pooling_layers import get_pooling


def relu20(x):
    """The reference's ReLU is Hardtanh(0, 20) (eres2net.py:44-52)."""
    return jnp.clip(x, 0.0, 20.0)


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class AFF(nn.Module):
    """Attentional feature fusion gate (eres2net.py:75-103)."""
    channels: int
    r: int = 4

    @nn.compact
    def __call__(self, x, ds_y, train: bool = False):
        inter = self.channels // self.r
        xa = jnp.concatenate([x, ds_y], axis=-1)
        h = conv2d(inter, 1, name="local_att_0")(xa)
        h = _bn(train, "local_att_1")(h)
        h = nn.silu(h)
        h = conv2d(self.channels, 1, name="local_att_3")(h)
        h = _bn(train, "local_att_4")(h)
        att = 1.0 + jnp.tanh(h)
        return x * att + ds_y * (2.0 - att)


class BasicBlockERes2Net(nn.Module):
    in_planes: int
    planes: int
    stride: int = 1
    base_width: int = 32
    scale: int = 2
    expansion: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        out = conv2d(width * self.scale, 1, stride=self.stride, bias=False,
                     name="conv1")(x)
        out = relu20(_bn(train, "bn1")(out))
        splits = [out[..., i * width:(i + 1) * width]
                  for i in range(self.scale)]
        sp = splits[0]
        outs = []
        for i in range(self.scale):
            if i >= 1:
                sp = sp + splits[i]
            sp = conv2d(width, 3, padding=1, bias=False, name=f"convs_{i}")(sp)
            sp = relu20(_bn(train, f"bns_{i}")(sp))
            outs.append(sp)
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


class BasicBlockERes2NetDiffAFF(nn.Module):
    """Res2 block whose hierarchical adds are replaced by AFF fusion
    (eres2net.py:171-240)."""
    in_planes: int
    planes: int
    stride: int = 1
    base_width: int = 32
    scale: int = 2
    expansion: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        out = conv2d(width * self.scale, 1, stride=self.stride, bias=False,
                     name="conv1")(x)
        out = relu20(_bn(train, "bn1")(out))
        splits = [out[..., i * width:(i + 1) * width]
                  for i in range(self.scale)]
        sp = conv2d(width, 3, padding=1, bias=False, name="conv2_1")(splits[0])
        sp = relu20(_bn(train, "bn2_1")(sp))
        outs = [sp]
        for i in range(1, self.scale):
            sp = AFF(width, name=f"fuse_models_{i - 1}")(sp, splits[i], train)
            sp = conv2d(width, 3, padding=1, bias=False,
                        name=f"convs_{i - 1}")(sp)
            sp = relu20(_bn(train, f"bns_{i - 1}")(sp))
            outs.append(sp)
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


class ERes2Net(nn.Module):
    m_channels: int
    num_blocks: tuple
    base_width: int = 32
    scale: int = 2
    expansion: int = 2
    feat_dim: int = 80
    embed_dim: int = 192
    pooling_func: str = "TSTP"
    two_emb_layer: bool = False

    def _layer(self, x, block_cls, idx, planes, count, stride, in_planes,
               train):
        strides = [stride] + [1] * (count - 1)
        for i, s in enumerate(strides):
            x = block_cls(in_planes, planes, s, self.base_width, self.scale,
                          self.expansion, name=f"layer{idx}_{i}")(x, train)
            in_planes = planes * self.expansion
        return x, in_planes

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False, return_frame_feat: bool = False):
        m, e = self.m_channels, self.expansion
        h = jnp.transpose(x, (0, 2, 1))[..., None]
        h = nn.relu(_bn(train, "bn1")(
            conv2d(m, 3, padding=1, bias=False, name="conv1")(h)))
        in_planes = m
        out1, in_planes = self._layer(h, BasicBlockERes2Net, 1, m,
                                      self.num_blocks[0], 1, in_planes, train)
        out2, in_planes = self._layer(out1, BasicBlockERes2Net, 2, m * 2,
                                      self.num_blocks[1], 2, in_planes, train)
        out1_ds = conv2d(m * e * 2, 3, stride=2, padding=1, bias=False,
                         name="layer1_downsample")(out1)
        fuse12 = AFF(m * e * 2, name="fuse_mode12")(out2, out1_ds, train)
        out3, in_planes = self._layer(out2, BasicBlockERes2NetDiffAFF, 3,
                                      m * 4, self.num_blocks[2], 2, in_planes,
                                      train)
        fuse12_ds = conv2d(m * e * 4, 3, stride=2, padding=1, bias=False,
                           name="layer2_downsample")(fuse12)
        fuse123 = AFF(m * e * 4, name="fuse_mode123")(out3, fuse12_ds, train)
        out4, in_planes = self._layer(out3, BasicBlockERes2NetDiffAFF, 4,
                                      m * 8, self.num_blocks[3], 2, in_planes,
                                      train)
        fuse123_ds = conv2d(m * e * 8, 3, stride=2, padding=1, bias=False,
                            name="layer3_downsample")(fuse123)
        fuse1234 = AFF(m * e * 8, name="fuse_mode1234")(out4, fuse123_ds,
                                                        train)

        b, fdim, tdim, c = fuse1234.shape
        if return_frame_feat:
            # public frame-level API (B, T, F'*C), d = f*C + c — the
            # reference's transpose(1,3)+flatten ordering (eres2net.py:370-377);
            # the pooling path below keeps the c-major (B, C*F', T)
            # internal ordering
            return jnp.transpose(fuse1234, (0, 2, 1, 3)).reshape(
                b, tdim, fdim * c)
        feat = jnp.transpose(fuse1234, (0, 2, 3, 1)).reshape(b, tdim, c * fdim)
        fmask = None
        if mask is not None:
            fmask = mask[:, ::8][:, :tdim]
        stats_dim = (self.feat_dim // 8) * self.m_channels * 8
        pooled = get_pooling(self.pooling_func, stats_dim * e,
                             name="pool")(feat, fmask, train)
        embed_a = nn.Dense(self.embed_dim, name="seg_1")(pooled)
        if self.two_emb_layer:
            out = nn.relu(embed_a)
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, use_scale=False, use_bias=False,
                               name="seg_bn_1")(out)
            return nn.Dense(self.embed_dim, name="seg_2")(out)
        return embed_a


def ERes2Net34_Base(feat_dim, embed_dim, pooling_func="TSTP",
                    two_emb_layer=False):
    return ERes2Net(32, (3, 4, 6, 3), feat_dim=feat_dim, embed_dim=embed_dim,
                    pooling_func=pooling_func, two_emb_layer=two_emb_layer)


def ERes2Net34_Large(feat_dim, embed_dim, pooling_func="TSTP",
                     two_emb_layer=False):
    return ERes2Net(64, (3, 4, 6, 3), feat_dim=feat_dim, embed_dim=embed_dim,
                    pooling_func=pooling_func, two_emb_layer=two_emb_layer)


def ERes2Net34_aug(feat_dim, embed_dim, pooling_func="TSTP",
                   two_emb_layer=False, expansion=4, baseWidth=24, scale=3):
    return ERes2Net(64, (3, 4, 6, 3), base_width=baseWidth, scale=scale,
                    expansion=expansion, feat_dim=feat_dim,
                    embed_dim=embed_dim, pooling_func=pooling_func,
                    two_emb_layer=two_emb_layer)
