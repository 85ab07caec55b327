"""Gemini DF-ResNet: depth-first inverted bottlenecks with the Golden-Gemini
T14c stride strategy (freq strides 2,2,2,2; time strides 1,2,1,1).

Behavioral spec: wespeaker/models/gemini_dfresnet.py (Inverted_Bottleneck:30,
Gemini_DF_ResNet:51, constructors :145-178). (B, F, T, C) channels-last;
the depthwise 3x3 uses feature_group_count=channels.
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from wespeaker_tpu.models.layers import conv2d
from wespeaker_tpu.models.pooling_layers import get_pooling


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class InvertedBottleneck(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(_bn(train, "bn1")(
            conv2d(4 * self.dim, 1, bias=False, name="conv1")(x)))
        out = nn.relu(_bn(train, "bn2")(
            conv2d(4 * self.dim, 3, padding=1, groups=4 * self.dim,
                   bias=False, name="conv2")(out)))
        out = _bn(train, "bn3")(
            conv2d(self.dim, 1, bias=False, name="conv3")(out))
        return nn.relu(out + x)


class _BNP(nn.Module):
    """Parameter holder matching nn.BatchNorm's tree (ecapa _BNParams)."""
    width: int

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.width,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.width,))
        self.mean = self.variable("batch_stats", "mean",
                                  lambda: jnp.zeros((self.width,)))
        self.var = self.variable("batch_stats", "var",
                                 lambda: jnp.ones((self.width,)))

    def fold(self):
        s = self.scale / jnp.sqrt(self.var.value + 1e-5)
        return s, self.bias - self.mean.value * s


class _Conv2dP(nn.Module):
    """Parameter holder matching conv2d's kernel tree (no compute)."""
    shape: tuple  # (kh, kw, c_in_per_group, c_out)

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 self.shape)

    def __call__(self):
        return self.kernel


class _InvBottleneckParams(nn.Module):
    """Parameter tree of InvertedBottleneck, folded for the fused stage
    kernel (ops/inv_bottleneck_pallas.py). Same child names, so the two
    paths share one checkpoint."""
    dim: int

    def setup(self):
        d = self.dim
        self.conv1 = _Conv2dP((1, 1, d, 4 * d), name="conv1")
        self.bn1 = _BNP(4 * d, name="bn1")
        self.conv2 = _Conv2dP((3, 3, 1, 4 * d), name="conv2")
        self.bn2 = _BNP(4 * d, name="bn2")
        self.conv3 = _Conv2dP((1, 1, 4 * d, d), name="conv3")
        self.bn3 = _BNP(d, name="bn3")

    def __call__(self):
        s1, t1 = self.bn1.fold()
        s2, t2 = self.bn2.fold()
        s3, t3 = self.bn3.fold()
        return (self.conv1()[0, 0], s1, t1, self.conv2()[:, :, 0], s2, t2,
                self.conv3()[0, 0], s3, t3)


class Gemini_DF_ResNet(nn.Module):
    depths: Sequence[int]
    dims: Sequence[int]
    feat_dim: int = 40
    embed_dim: int = 128
    pooling_func: str = "TSTP"
    two_emb_layer: bool = False
    # Fused whole-stage Pallas kernel (ops/inv_bottleneck_pallas.py):
    # inference-only, identical parameter tree. The round-4 ablation
    # measured the XLA stages HBM-bound (docs/PERF.md); the kernel keeps
    # the 4x-expanded maps VMEM-resident.
    fused_stages: Optional[bool] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False, return_frame_feat: bool = False):
        h = jnp.transpose(x, (0, 2, 1))[..., None]
        # stem: downsample_layers.0 = conv+bn+relu
        h = nn.relu(_bn(train, "downsample_layers_0_1")(
            conv2d(self.dims[0], 3, padding=1, bias=False,
                   name="downsample_layers_0_0")(h)))
        stride_f = [2, 2, 2, 2]
        stride_t = [1, 2, 1, 1]
        for i in range(4):
            h = _bn(train, f"downsample_layers_{i + 1}_1")(
                conv2d(self.dims[i + 1], 3,
                       stride=(stride_f[i], stride_t[i]), padding=1,
                       bias=False, name=f"downsample_layers_{i + 1}_0")(h))
            h = self._stage(h, i, train)

        return self._head(h, mask, train, return_frame_feat)

    def _stage(self, h, i, train):
        dim = self.dims[i + 1]
        if self.fused_stages and not train:
            from wespeaker_tpu.ops.inv_bottleneck_pallas import (
                fused_inv_bottleneck_stage, inv_stage_fits)
            if inv_stage_fits(h.shape[1], h.shape[2], dim,
                              itemsize=h.dtype.itemsize):
                import jax as _jax
                cols = [[] for _ in range(9)]
                for j in range(self.depths[i]):
                    parts = _InvBottleneckParams(
                        dim, name=f"stages_{i}_{j}")()
                    for k, p in enumerate(parts):
                        cols[k].append(p)
                stacked = [jnp.stack(c) for c in cols]
                interpret = _jax.devices()[0].platform != "tpu"
                return fused_inv_bottleneck_stage(h, *stacked,
                                                  interpret=interpret)
        for j in range(self.depths[i]):
            h = InvertedBottleneck(dim, name=f"stages_{i}_{j}")(h, train)
        return h

    def _head(self, h, mask, train, return_frame_feat):
        b, fdim, tdim, c = h.shape
        if return_frame_feat:
            # public frame-level API (B, T, F'*C), d = f*C + c — the
            # reference's transpose(1,3)+flatten ordering (gemini_dfresnet.py:120-127);
            # the pooling path below keeps the c-major (B, C*F', T)
            # internal ordering
            return jnp.transpose(h, (0, 2, 1, 3)).reshape(
                b, tdim, fdim * c)
        feat = jnp.transpose(h, (0, 2, 3, 1)).reshape(b, tdim, c * fdim)
        fmask = mask[:, ::2][:, :tdim] if mask is not None else None
        stats_dim = (self.feat_dim // 16) * self.dims[-1]
        pooled = get_pooling(self.pooling_func, stats_dim,
                             name="pool")(feat, fmask, train)
        embed_a = nn.Dense(self.embed_dim, name="seg_1")(pooled)
        if self.two_emb_layer:
            out = nn.relu(embed_a)
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, use_scale=False, use_bias=False,
                               name="seg_bn_1")(out)
            return nn.Dense(self.embed_dim, name="seg_2")(out)
        return embed_a


def Gemini_DF_ResNet60(feat_dim, embed_dim, pooling_func="TSTP",
                       two_emb_layer=False, fused_stages=None):
    return Gemini_DF_ResNet((3, 3, 9, 3), (32, 32, 64, 128, 256),
                            feat_dim=feat_dim, embed_dim=embed_dim,
                            pooling_func=pooling_func,
                            two_emb_layer=two_emb_layer,
                            fused_stages=fused_stages)


def Gemini_DF_ResNet114(feat_dim, embed_dim, pooling_func="TSTP",
                        two_emb_layer=False, fused_stages=None):
    return Gemini_DF_ResNet((3, 3, 27, 3), (32, 32, 64, 128, 256),
                            feat_dim=feat_dim, embed_dim=embed_dim,
                            pooling_func=pooling_func,
                            two_emb_layer=two_emb_layer,
                            fused_stages=fused_stages)


def Gemini_DF_ResNet183(feat_dim, embed_dim, pooling_func="TSTP",
                        two_emb_layer=False, fused_stages=None):
    return Gemini_DF_ResNet((3, 8, 45, 3), (32, 32, 64, 128, 256),
                            feat_dim=feat_dim, embed_dim=embed_dim,
                            pooling_func=pooling_func,
                            two_emb_layer=two_emb_layer,
                            fused_stages=fused_stages)


def Gemini_DF_ResNet237(feat_dim, embed_dim, pooling_func="TSTP",
                        two_emb_layer=False, fused_stages=None):
    return Gemini_DF_ResNet((3, 8, 63, 3), (32, 32, 64, 128, 256),
                            feat_dim=feat_dim, embed_dim=embed_dim,
                            pooling_func=pooling_func,
                            two_emb_layer=two_emb_layer,
                            fused_stages=fused_stages)
