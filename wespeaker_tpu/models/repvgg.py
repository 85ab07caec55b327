"""RepVGG / RepSPK speaker encoders with structural re-parameterization.

Behavioral spec: wespeaker/models/repvgg.py (SEBlock_2D:40, RepVGGBlock:105,
RepSPKBlock:289, RepVGG:456, repvgg_model_convert:590, constructors
:602-927). (B, F, T, C) channels-last.

Train mode: 3x3 + 1x1 (or 3x3-dilated) + identity-BN branches.
Deploy mode: a single fused conv. `convert_repvgg_variables` performs the
branch fusion on a flax variables tree (the switch_to_deploy equivalent),
entirely in numpy on host.
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from flax.core import freeze, unfreeze

from wespeaker_tpu.models.layers import conv2d
from wespeaker_tpu.models.pooling_layers import get_pooling


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class SEBlock2D(nn.Module):
    in_planes: int
    ratio: int = 16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))
        s = nn.relu(nn.Dense(self.in_planes // self.ratio, name="fc_1")(s))
        s = nn.sigmoid(nn.Dense(self.in_planes, name="fc_2")(s))
        return x * s[:, None, None, :]


class ConvBN(nn.Module):
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.out_channels, self.kernel_size, stride=self.stride,
                   padding=self.padding, dilation=self.dilation,
                   groups=self.groups, bias=False, name="conv")(x)
        return _bn(train, "bn")(x)


class RepVGGBlock(nn.Module):
    in_channels: int
    out_channels: int
    stride: int = 1
    groups: int = 1
    deploy: bool = False
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deploy:
            out = conv2d(self.out_channels, 3, stride=self.stride, padding=1,
                         groups=self.groups, bias=True,
                         name="rbr_reparam")(x)
        else:
            out = ConvBN(self.out_channels, 3, self.stride, 1,
                         groups=self.groups, name="rbr_dense")(x, train)
            out = out + ConvBN(self.out_channels, 1, self.stride, 0,
                               groups=self.groups, name="rbr_1x1")(x, train)
            if self.out_channels == self.in_channels and self.stride == 1:
                out = out + _bn(train, "rbr_identity")(x)
        out = nn.relu(out)
        if self.use_se:
            out = SEBlock2D(self.out_channels, 4, name="se")(out)
        return out


class RepSPKBlock(nn.Module):
    """RSBB: dilated second branch (arXiv:2110.09720); deploys to 5x5."""
    in_channels: int
    out_channels: int
    stride: int = 1
    groups: int = 1
    deploy: bool = False
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deploy:
            out = conv2d(self.out_channels, 5, stride=self.stride, padding=2,
                         groups=self.groups, bias=True,
                         name="rbr_reparam")(x)
        else:
            out = ConvBN(self.out_channels, 3, self.stride, 1,
                         groups=self.groups, name="rbr_dense")(x, train)
            out = out + ConvBN(self.out_channels, 3, self.stride, 2,
                               dilation=2, groups=self.groups,
                               name="rbr_dense_dilation")(x, train)
            if self.out_channels == self.in_channels and self.stride == 1:
                out = out + _bn(train, "rbr_identity")(x)
        out = nn.relu(out)
        if self.use_se:
            out = SEBlock2D(self.out_channels, 4, name="se")(out)
        return out


OPTIONAL_GROUPWISE_LAYERS = tuple(range(2, 27, 2))
G2_MAP = {k: 2 for k in OPTIONAL_GROUPWISE_LAYERS}
G4_MAP = {k: 4 for k in OPTIONAL_GROUPWISE_LAYERS}


class RepVGG(nn.Module):
    num_blocks: Sequence[int]
    strides: Sequence[int]
    width_multiplier: Sequence[float]
    block: str = "RepVGG"
    base_width: int = 64
    deploy: bool = False
    use_se: bool = False
    pooling_func: str = "TSTP"
    feat_dim: int = 80
    embed_dim: int = 256
    override_groups_map: Optional[dict] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False, return_frame_feat: bool = False):
        wm = [w * (self.base_width / 64.0) for w in self.width_multiplier]
        block_cls = RepVGGBlock if self.block == "RepVGG" else RepSPKBlock
        in_planes = min(64, int(64 * wm[0]))

        h = jnp.transpose(x, (0, 2, 1))[..., None]
        h = block_cls(1, in_planes, self.strides[0], deploy=self.deploy,
                      use_se=self.use_se, name="stage0")(h, train)
        widths = [int(64 * wm[0]), int(128 * wm[1]), int(256 * wm[2]),
                  int(512 * wm[3])]
        ogm = self.override_groups_map or {}
        layer_idx = 1
        for si, (planes, count, stride) in enumerate(
                zip(widths, self.num_blocks, self.strides[1:]), start=1):
            strides = [stride] + [1] * (count - 1)
            for bi, s in enumerate(strides):
                h = block_cls(in_planes, planes, s,
                              groups=ogm.get(layer_idx, 1),
                              deploy=self.deploy, use_se=self.use_se,
                              name=f"stage{si}_{bi}")(h, train)
                in_planes = planes
                layer_idx += 1

        b, fdim, tdim, c = h.shape
        if return_frame_feat:
            # public frame-level API (B, T, F'*C), d = f*C + c — the
            # reference's transpose(1,3)+flatten ordering (repvgg.py:574-581);
            # the pooling path below keeps the c-major (B, C*F', T)
            # internal ordering
            return jnp.transpose(h, (0, 2, 1, 3)).reshape(
                b, tdim, fdim * c)
        feat = jnp.transpose(h, (0, 2, 3, 1)).reshape(b, tdim, c * fdim)
        down = int(np.prod(self.strides))
        fmask = mask[:, ::down][:, :tdim] if mask is not None else None
        stats_dim = in_planes * (self.feat_dim // down)
        pooled = get_pooling(self.pooling_func, stats_dim,
                             name="pool")(feat, fmask, train)
        return nn.Dense(self.embed_dim, name="seg")(pooled)


def _fuse_convbn(sub, ksize, groups_in):
    """Fuse flax ConvBN params: kernel (kh,kw,ic,O) * gamma/std, bias."""
    kernel = np.asarray(sub["conv"]["kernel"])
    bn_p = sub["bn"]
    gamma = np.asarray(bn_p["scale"])
    beta = np.asarray(bn_p["bias"])
    mean = np.asarray(bn_p["mean"])
    var = np.asarray(bn_p["var"])
    std = np.sqrt(var + 1e-5)
    t = gamma / std
    return kernel * t, beta - mean * t


def _identity_kernel(channels, ic, ksize):
    k = np.zeros((ksize, ksize, ic, channels), np.float32)
    c = ksize // 2
    for i in range(channels):
        k[c, c, i % ic, i] = 1.0
    return k


def convert_repvgg_variables(variables, block: str = "RepVGG"):
    """Fuse train-mode branch parameters into deploy-mode rbr_reparam convs
    (the reference's repvgg_model_convert / switch_to_deploy)."""
    tree = unfreeze(variables)
    params = tree["params"]
    stats = tree.get("batch_stats", {})

    def merge(p, s):
        out = dict(p)
        for k, v in s.items():
            if k in out and isinstance(v, dict):
                out[k] = merge(out[k], v)
            else:
                out[k] = v
        return out

    full = merge(params, stats)
    new_params = {}
    for name, sub in full.items():
        if not name.startswith("stage"):
            new_params[name] = params[name]
            continue
        if block == "RepVGG":
            k3, b3 = _fuse_convbn(sub["rbr_dense"], 3, None)
            k1, b1 = _fuse_convbn(sub["rbr_1x1"], 1, None)
            k1 = np.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0)))
            kernel, bias = k3 + k1, b3 + b1
            ksize = 3
        else:
            k3, b3 = _fuse_convbn(sub["rbr_dense"], 3, None)
            kd, bd = _fuse_convbn(sub["rbr_dense_dilation"], 3, None)
            k5 = np.zeros(kd.shape[:0] + (5, 5) + kd.shape[2:], np.float32)
            k5[::2, ::2] = kd
            k3 = np.pad(k3, ((1, 1), (1, 1), (0, 0), (0, 0)))
            kernel, bias = k5 + k3, b3 + bd
            ksize = 5
        if "rbr_identity" in sub:
            bnid = sub["rbr_identity"]
            gamma = np.asarray(bnid["scale"])
            beta = np.asarray(bnid["bias"])
            mean = np.asarray(bnid["mean"])
            std = np.sqrt(np.asarray(bnid["var"]) + 1e-5)
            t = gamma / std
            ic = kernel.shape[2]
            kid = _identity_kernel(kernel.shape[3], ic, ksize) * t
            kernel = kernel + kid
            bias = bias + beta - mean * t
        entry = {"rbr_reparam": {"kernel": kernel, "bias": bias}}
        if "se" in params.get(name, {}):
            entry["se"] = params[name]["se"]
        new_params[name] = entry
    return freeze({"params": new_params, "batch_stats": {}})


def _make(block, num_blocks, strides, wm, **kw):
    return RepVGG(num_blocks=num_blocks, strides=strides,
                  width_multiplier=wm, block=block, **kw)


def REPVGG_TINY_A0(feat_dim, embed_dim, pooling_func="TSTP", deploy=False,
                   use_se=False):
    return _make("RepVGG", (3, 4, 23, 3), (1, 1, 2, 2, 2),
                 (0.5, 0.5, 0.5, 0.5), feat_dim=feat_dim,
                 embed_dim=embed_dim, pooling_func=pooling_func,
                 deploy=deploy, use_se=use_se)


def REPVGG_TINY_RSBB_A0(feat_dim, embed_dim, pooling_func="TSTP",
                        deploy=False, use_se=False):
    return _make("RepSPK", (3, 4, 23, 3), (1, 1, 2, 2, 2),
                 (0.5, 0.5, 0.5, 0.5), feat_dim=feat_dim,
                 embed_dim=embed_dim, pooling_func=pooling_func,
                 deploy=deploy, use_se=use_se)


def REPVGG_A0(feat_dim, embed_dim, pooling_func="TSTP", deploy=False,
              use_se=False):
    return _make("RepVGG", (2, 4, 14, 1), (1, 1, 2, 2, 2),
                 (0.75, 0.75, 0.75, 2.5), feat_dim=feat_dim,
                 embed_dim=embed_dim, pooling_func=pooling_func,
                 deploy=deploy, use_se=use_se)


def REPVGG_RSBB_A0(feat_dim, embed_dim, pooling_func="TSTP", deploy=False,
                   use_se=False):
    return _make("RepSPK", (2, 4, 14, 1), (1, 1, 2, 2, 2),
                 (0.75, 0.75, 0.75, 2.5), feat_dim=feat_dim,
                 embed_dim=embed_dim, pooling_func=pooling_func,
                 deploy=deploy, use_se=use_se)


def REPVGG_A1(feat_dim, embed_dim, pooling_func="TSTP", deploy=False,
              use_se=False):
    return _make("RepVGG", (2, 4, 14, 1), (1, 1, 2, 2, 2), (1, 1, 1, 2.5),
                 feat_dim=feat_dim, embed_dim=embed_dim,
                 pooling_func=pooling_func, deploy=deploy, use_se=use_se)


def REPVGG_A2(feat_dim, embed_dim, pooling_func="TSTP", deploy=False,
              use_se=False):
    return _make("RepVGG", (2, 4, 14, 1), (1, 1, 2, 2, 2),
                 (1.5, 1.5, 1.5, 2.75), feat_dim=feat_dim,
                 embed_dim=embed_dim, pooling_func=pooling_func,
                 deploy=deploy, use_se=use_se)


def REPVGG_RSBB_A2(feat_dim, embed_dim, pooling_func="TSTP", deploy=False,
                   use_se=False):
    return _make("RepSPK", (2, 4, 14, 1), (1, 1, 2, 2, 2),
                 (1.5, 1.5, 1.5, 2.75), feat_dim=feat_dim,
                 embed_dim=embed_dim, pooling_func=pooling_func,
                 deploy=deploy, use_se=use_se)


def REPVGG_B0(feat_dim, embed_dim, pooling_func="TSTP", deploy=False,
              use_se=False):
    return _make("RepVGG", (4, 6, 16, 1), (1, 1, 2, 2, 2), (1, 1, 1, 2.5),
                 feat_dim=feat_dim, embed_dim=embed_dim,
                 pooling_func=pooling_func, deploy=deploy, use_se=use_se)


def REPVGG_RSBB_B0(feat_dim, embed_dim, pooling_func="TSTP", deploy=False,
                   use_se=False):
    return _make("RepSPK", (4, 6, 16, 1), (1, 1, 2, 2, 2), (1, 1, 1, 2.5),
                 feat_dim=feat_dim, embed_dim=embed_dim,
                 pooling_func=pooling_func, deploy=deploy, use_se=use_se)


def REPVGG_B1(feat_dim, embed_dim, pooling_func="TSTP", deploy=False,
              use_se=False):
    return _make("RepVGG", (4, 6, 16, 1), (1, 1, 2, 2, 2), (2, 2, 2, 4),
                 feat_dim=feat_dim, embed_dim=embed_dim,
                 pooling_func=pooling_func, deploy=deploy, use_se=use_se)


def REPVGG_B2(feat_dim, embed_dim, pooling_func="TSTP", deploy=False,
              use_se=False):
    return _make("RepVGG", (4, 6, 16, 1), (1, 1, 2, 2, 2),
                 (2.5, 2.5, 2.5, 5), feat_dim=feat_dim, embed_dim=embed_dim,
                 pooling_func=pooling_func, deploy=deploy, use_se=use_se)


def REPVGG_D2SE(feat_dim, embed_dim, pooling_func="TSTP", deploy=False,
                use_se=True):
    return _make("RepVGG", (8, 14, 24, 1), (1, 1, 2, 2, 2),
                 (2.5, 2.5, 2.5, 5), feat_dim=feat_dim, embed_dim=embed_dim,
                 pooling_func=pooling_func, deploy=deploy, use_se=use_se)


def REPVGG_B1g2(feat_dim, embed_dim, pooling_func="TSTP", deploy=False,
                use_se=False):
    return _make("RepVGG", (4, 6, 16, 1), (1, 1, 2, 2, 2), (2, 2, 2, 4),
                 feat_dim=feat_dim, embed_dim=embed_dim,
                 pooling_func=pooling_func, deploy=deploy, use_se=use_se,
                 override_groups_map=G2_MAP)


def REPVGG_B1g4(feat_dim, embed_dim, pooling_func="TSTP", deploy=False,
                use_se=False):
    return _make("RepVGG", (4, 6, 16, 1), (1, 1, 2, 2, 2), (2, 2, 2, 4),
                 feat_dim=feat_dim, embed_dim=embed_dim,
                 pooling_func=pooling_func, deploy=deploy, use_se=use_se,
                 override_groups_map=G4_MAP)


def REPVGG_B2g2(feat_dim, embed_dim, pooling_func="TSTP", deploy=False,
                use_se=False):
    return _make("RepVGG", (4, 6, 16, 1), (1, 1, 2, 2, 2),
                 (2.5, 2.5, 2.5, 5), feat_dim=feat_dim, embed_dim=embed_dim,
                 pooling_func=pooling_func, deploy=deploy, use_se=use_se,
                 override_groups_map=G2_MAP)


def REPVGG_B2g4(feat_dim, embed_dim, pooling_func="TSTP", deploy=False,
                use_se=False):
    return _make("RepVGG", (4, 6, 16, 1), (1, 1, 2, 2, 2),
                 (2.5, 2.5, 2.5, 5), feat_dim=feat_dim, embed_dim=embed_dim,
                 pooling_func=pooling_func, deploy=deploy, use_se=use_se,
                 override_groups_map=G4_MAP)


def REPVGG_B3(feat_dim, embed_dim, pooling_func="TSTP", deploy=False,
              use_se=False):
    return _make("RepVGG", (4, 6, 16, 1), (1, 1, 2, 2, 2), (3, 3, 3, 5),
                 feat_dim=feat_dim, embed_dim=embed_dim,
                 pooling_func=pooling_func, deploy=deploy, use_se=use_se)


def REPVGG_B3g2(feat_dim, embed_dim, pooling_func="TSTP", deploy=False,
                use_se=False):
    return _make("RepVGG", (4, 6, 16, 1), (1, 1, 2, 2, 2), (3, 3, 3, 5),
                 feat_dim=feat_dim, embed_dim=embed_dim,
                 pooling_func=pooling_func, deploy=deploy, use_se=use_se,
                 override_groups_map=G2_MAP)


def REPVGG_B3g4(feat_dim, embed_dim, pooling_func="TSTP", deploy=False,
                use_se=False):
    return _make("RepVGG", (4, 6, 16, 1), (1, 1, 2, 2, 2), (3, 3, 3, 5),
                 feat_dim=feat_dim, embed_dim=embed_dim,
                 pooling_func=pooling_func, deploy=deploy, use_se=use_se,
                 override_groups_map=G4_MAP)
