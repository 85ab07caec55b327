"""CAM++ (context-aware masking densely-connected TDNN), TPU-native flax.

Behavioral spec: wespeaker/models/campplus.py (CAMLayer:86,
CAMDenseTDNNLayer:138, FCM:282, CAMPPlus:333). Layouts: FCM runs (B, F, T, C)
channels-last 2D convs; the TDNN trunk runs (B, T, C).

seg_pooling: 100-frame non-overlapping average, broadcast back over frames
(campplus.py:117-135). With masking, pad frames are excluded from both the
global and segment means.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from wespeaker_tpu.models.layers import conv1d, conv2d
from wespeaker_tpu.models.pooling_layers import get_pooling


def _bn(train, name, affine=True):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, use_scale=affine, use_bias=affine,
                        name=name)


class TDNNLayer(nn.Module):
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        padding = self.padding
        if padding < 0:
            padding = (self.kernel_size - 1) // 2 * self.dilation
        x = conv1d(self.out_channels, self.kernel_size, stride=self.stride,
                   padding=padding, dilation=self.dilation, bias=False,
                   name="linear")(x)
        # config_str='batchnorm-relu'
        return nn.relu(_bn(train, "nonlinear_bn")(x))


def seg_pooling(x, mask=None, seg_len=100):
    """Non-overlapping mean over time segments, broadcast back to frames.
    x: (B, T, C); returns (B, T, C)."""
    b, t, c = x.shape
    nseg = -(-t // seg_len)
    pad = nseg * seg_len - t
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    if mask is None:
        m = jnp.pad(jnp.ones((b, t), x.dtype), ((0, 0), (0, pad)))
    else:
        m = jnp.pad(mask.astype(x.dtype), ((0, 0), (0, pad)))
    xs = xp.reshape(b, nseg, seg_len, c)
    ms = m.reshape(b, nseg, seg_len, 1)
    seg = jnp.sum(xs * ms, axis=2) / jnp.maximum(jnp.sum(ms, axis=2), 1.0)
    out = jnp.repeat(seg, seg_len, axis=1)[:, :t]
    return out


class CAMLayer(nn.Module):
    bn_channels: int
    out_channels: int
    kernel_size: int
    stride: int
    padding: int
    dilation: int
    reduction: int = 2

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        y = conv1d(self.out_channels, self.kernel_size, stride=self.stride,
                   padding=self.padding, dilation=self.dilation, bias=False,
                   name="linear_local")(x)
        if mask is None:
            gmean = jnp.mean(x, axis=1, keepdims=True)
        else:
            m = mask[..., None].astype(x.dtype)
            gmean = (jnp.sum(x * m, axis=1, keepdims=True)
                     / jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0))
        context = gmean + seg_pooling(x, mask)
        context = nn.relu(conv1d(self.bn_channels // self.reduction, 1,
                                 name="linear1")(context))
        gate = nn.sigmoid(conv1d(self.out_channels, 1,
                                 name="linear2")(context))
        if self.stride > 1:
            gate = gate[:, ::self.stride]
        return y * gate


class CAMDenseTDNNLayer(nn.Module):
    out_channels: int
    bn_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        padding = (self.kernel_size - 1) // 2 * self.dilation
        h = nn.relu(_bn(train, "nonlinear1_bn")(x))
        h = conv1d(self.bn_channels, 1, bias=False, name="linear1")(h)
        h = nn.relu(_bn(train, "nonlinear2_bn")(h))
        return CAMLayer(self.bn_channels, self.out_channels, self.kernel_size,
                        self.stride, padding, self.dilation,
                        name="cam_layer")(h, mask, train)


class _ConvP(nn.Module):
    """Parameter holder matching conv1d's tree without the compute."""
    shape: tuple  # (k, c_in, c_out)
    use_bias: bool = True

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 self.shape)
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros,
                                   (self.shape[-1],))

    def __call__(self):
        return (self.kernel, self.bias) if self.use_bias \
            else (self.kernel,)


class _CAMGateParams(nn.Module):
    """Parameter tree of CAMLayer (linear_local/linear1/linear2)."""
    bn_channels: int
    out_channels: int
    kernel_size: int

    def setup(self):
        self.linear_local = _ConvP(
            (self.kernel_size, self.bn_channels, self.out_channels),
            use_bias=False, name="linear_local")
        self.linear1 = _ConvP((1, self.bn_channels, self.bn_channels // 2),
                              name="linear1")
        self.linear2 = _ConvP((1, self.bn_channels // 2, self.out_channels),
                              name="linear2")

    def __call__(self):
        return (self.linear_local()[0], *self.linear1(), *self.linear2())


class _CAMLayerParams(nn.Module):
    """Parameter tree of CAMDenseTDNNLayer for the fused block kernel."""
    in_channels: int
    bn_channels: int
    out_channels: int
    kernel_size: int

    def setup(self):
        from wespeaker_tpu.models.ecapa_tdnn import _BNParams
        self.nonlinear1_bn = _BNParams(self.in_channels,
                                       name="nonlinear1_bn")
        self.linear1 = _ConvP((1, self.in_channels, self.bn_channels),
                              use_bias=False, name="linear1")
        self.nonlinear2_bn = _BNParams(self.bn_channels,
                                       name="nonlinear2_bn")
        self.cam_layer = _CAMGateParams(self.bn_channels, self.out_channels,
                                        self.kernel_size, name="cam_layer")

    def __call__(self):
        def fold(bn):
            gamma, beta, mean, var = bn()
            s = gamma / jnp.sqrt(var + 1e-5)
            return s, beta - mean * s

        s1, t1 = fold(self.nonlinear1_bn)
        s2, t2 = fold(self.nonlinear2_bn)
        (w1,) = (self.linear1(),)
        return (s1, t1, w1[0][0], s2, t2, *self.cam_layer())


class CAMDenseTDNNBlock(nn.Module):
    num_layers: int
    out_channels: int
    bn_channels: int
    kernel_size: int
    dilation: int = 1
    fused: Optional[bool] = None  # Pallas whole-block kernel (inference)

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        # opt-in (fused=True), not auto: the kernel wins a measured +4%
        # end-to-end at the flagship shape but costs a ~3 min Mosaic
        # compile per (T, C) shape — wrong default for multi-bucket
        # extraction, right for fixed-shape serving (docs/PERF.md).
        if self.fused and not train and self.out_channels == 32:
            from wespeaker_tpu.ops.cam_block_pallas import (
                cam_block_fits, fused_cam_dense_block)
            if cam_block_fits(x.shape[1], x.shape[-1], self.num_layers,
                              itemsize=x.dtype.itemsize):
                import jax as _jax
                c0 = x.shape[-1]
                cend = c0 + 32 * self.num_layers
                cols = [[] for _ in range(10)]
                for i in range(self.num_layers):
                    parts = _CAMLayerParams(
                        c0 + 32 * i, self.bn_channels, self.out_channels,
                        self.kernel_size, name=f"tdnnd{i + 1}")()
                    s1, t1, w1, s2, t2, w2, wc1, bc1, wc2, bc2 = parts
                    padw = cend - s1.shape[0]
                    cols[0].append(jnp.pad(s1, (0, padw)))
                    cols[1].append(jnp.pad(t1, (0, padw)))
                    cols[2].append(jnp.pad(w1, ((0, padw), (0, 0))))
                    cols[3].append(s2)
                    cols[4].append(t2)
                    cols[5].append(w2)
                    cols[6].append(wc1[0])
                    cols[7].append(bc1)
                    cols[8].append(wc2[0])
                    cols[9].append(bc2)
                stacked = [jnp.stack(c) for c in cols]
                interpret = _jax.devices()[0].platform != "tpu"
                return fused_cam_dense_block(
                    x, *stacked, dilation=self.dilation, mask=mask,
                    interpret=interpret)
        for i in range(self.num_layers):
            y = CAMDenseTDNNLayer(self.out_channels, self.bn_channels,
                                  self.kernel_size, 1, self.dilation,
                                  name=f"tdnnd{i + 1}")(x, mask, train)
            x = jnp.concatenate([x, y], axis=-1)
        return x


class TransitLayer(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(_bn(train, "nonlinear_bn")(x))
        return conv1d(self.out_channels, 1, bias=False, name="linear")(x)


class DenseLayer(nn.Module):
    out_channels: int
    bn_affine: bool = False  # config_str='batchnorm_'

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv1d(self.out_channels, 1, bias=False, name="linear")(
            x[:, None, :] if x.ndim == 2 else x)
        if x.shape[1] == 1:
            x = x[:, 0]
        return _bn(train, "nonlinear_bn", affine=self.bn_affine)(x)


class BasicResBlock(nn.Module):
    """2D residual block with freq-only stride (campplus.py:245-279)."""
    in_planes: int
    planes: int
    stride: int = 1
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(_bn(train, "bn1")(
            conv2d(self.planes, 3, stride=(self.stride, 1), padding=1,
                   bias=False, name="conv1")(x)))
        out = _bn(train, "bn2")(
            conv2d(self.planes, 3, stride=1, padding=1, bias=False,
                   name="conv2")(out))
        if self.stride != 1 or self.in_planes != self.planes:
            sc = conv2d(self.planes, 1, stride=(self.stride, 1), bias=False,
                        name="shortcut_conv")(x)
            sc = _bn(train, "shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class FCM(nn.Module):
    m_channels: int = 32
    feat_dim: int = 80

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, T, F) -> (B, T, C * F/8)."""
        h = jnp.transpose(x, (0, 2, 1))[..., None]  # (B, F, T, 1)
        h = nn.relu(_bn(train, "bn1")(
            conv2d(self.m_channels, 3, stride=1, padding=1, bias=False,
                   name="conv1")(h)))
        for li, name in ((0, "layer1"), (1, "layer2")):
            in_planes = self.m_channels
            for i, s in enumerate([2, 1]):
                h = BasicResBlock(in_planes, self.m_channels, s,
                                  name=f"{name}_{i}")(h, train)
        h = nn.relu(_bn(train, "bn2")(
            conv2d(self.m_channels, 3, stride=(2, 1), padding=1, bias=False,
                   name="conv2")(h)))
        b, f, t, c = h.shape
        # (B, F', T, C) -> (B, T, C*F') with index c*F'+f (reference order)
        return jnp.transpose(h, (0, 2, 3, 1)).reshape(b, t, c * f)


class XVectorTrunk(nn.Module):
    """The reference's `xvector` Sequential (campplus.py:350-390)."""
    init_channels: int
    growth_rate: int
    bn_size: int
    embed_dim: int
    pooling_func: str
    fused_blocks: Optional[bool] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False,
                 return_frame_feat: bool = False):
        x = TDNNLayer(self.init_channels, 5, stride=2, dilation=1,
                      padding=-1, name="tdnn")(x, train)
        if mask is not None:
            mask = mask[:, ::2][:, :x.shape[1]]
        channels = self.init_channels
        for i, (num_layers, ks, dil) in enumerate(
                zip((12, 24, 16), (3, 3, 3), (1, 2, 2))):
            x = CAMDenseTDNNBlock(num_layers, self.growth_rate,
                                  self.bn_size * self.growth_rate, ks, dil,
                                  fused=self.fused_blocks,
                                  name=f"block{i + 1}")(x, mask, train)
            channels += num_layers * self.growth_rate
            x = TransitLayer(channels // 2, name=f"transit{i + 1}")(x, train)
            channels //= 2
        x = nn.relu(_bn(train, "out_nonlinear_bn")(x))
        if return_frame_feat:
            return x
        stats = get_pooling(self.pooling_func, channels,
                            name="stats")(x, mask, train)
        return DenseLayer(self.embed_dim, name="dense")(stats, train)


class CAMPPlus(nn.Module):
    feat_dim: int = 80
    embed_dim: int = 512
    pooling_func: str = "TSTP"
    growth_rate: int = 32
    bn_size: int = 4
    init_channels: int = 128
    # Fused Pallas dense-block kernel (ops/cam_block_pallas.py) — opt-in
    # for fixed-shape inference serving (+4% end-to-end, ~3 min Mosaic
    # compile per shape); parameter trees are identical either way.
    fused_blocks: Optional[bool] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False, return_frame_feat: bool = False):
        h = FCM(feat_dim=self.feat_dim, name="head")(x, train)
        return XVectorTrunk(self.init_channels, self.growth_rate,
                            self.bn_size, self.embed_dim, self.pooling_func,
                            fused_blocks=self.fused_blocks,
                            name="xvector")(h, mask, train, return_frame_feat)
