"""ReDimNet2: UNet-like ReDimNet with full-time-resolution feature-map
aggregation.

Behavioral spec: wespeaker/models/redimnet2.py (weigth1d:414, ConvBlock2d:434,
TimeContextBlock1d:477, ReDimNet2:523 — per-stage: weighted aggregation of
all previous 1D maps -> to2d -> (sf, stt)-strided conv (groups =
gcd(c, out) when compress_tconvs) -> 2D blocks -> optional squeeze-back ->
to1d -> optional time-context block -> nearest time-upsample back to full T;
ReDimNet2Wrap:801 adds pooling/BN/linear; constructors :952-1080).

Input convention here: (B, T, F) features like every other model (the torch
wrapper takes (B, F, T) spectrograms). Not implemented (unused by the
released B0-B6 configs): causal variants, dual_agg, agg_gnorm, subnet mode,
freq positional encoding, and the internal torchaudio MelBanks (use the
external fbank/tfmel frontends).
"""

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from wespeaker_tpu.models.layers import conv1d, conv2d
from wespeaker_tpu.models.pooling_layers import get_pooling
from wespeaker_tpu.models.redimnet import (
    PosEncConv,
    TransformerEncoderLayer,
    fwSEBlock,
    to1d,
    to2d,
)


def _bn(train, name, eps=1e-5):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=eps, name=name)


def _ln(name, eps=1e-6):
    return nn.LayerNorm(epsilon=eps, name=name)


class ConvNeXtLikeBlock1d(nn.Module):
    C: int
    kernel_sizes: Tuple[int, ...] = (7,)
    gdiv: Optional[int] = 1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        groups = self.C // self.gdiv if self.gdiv is not None else 1
        outs = [conv1d(self.C, ks, padding=ks // 2, groups=groups,
                       name=f"dwconvs_{i}")(x)
                for i, ks in enumerate(self.kernel_sizes)]
        h = jnp.concatenate(outs, axis=-1)
        h = _bn(train, "norm")(h)
        h = nn.gelu(h, approximate=False) if self.activation == "gelu" \
            else nn.relu(h)
        return x + conv1d(self.C, 1, name="pwconv1")(h)


class ConvNeXtLikeBlock2d(nn.Module):
    C: int
    kernel_sizes: Tuple[Tuple[int, int], ...] = ((3, 3),)
    gdiv: Optional[int] = 1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        groups = self.C // self.gdiv if self.gdiv is not None else 1
        outs = [conv2d(self.C, tuple(ks),
                       padding=(ks[0] // 2, ks[1] // 2), groups=groups,
                       name=f"dwconvs_{i}")(x)
                for i, ks in enumerate(self.kernel_sizes)]
        h = jnp.concatenate(outs, axis=-1)
        h = _bn(train, "norm")(h)
        h = nn.gelu(h, approximate=False) if self.activation == "gelu" \
            else nn.relu(h)
        return x + conv2d(self.C, 1, name="pwconv1")(h)


class ResBasicBlock2(nn.Module):
    inc: int
    outc: int
    num_freq: int
    se_channels: int = 64
    gdiv: Optional[int] = 4
    use_fwse: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        gd = self.gdiv
        if gd is not None:
            h = conv2d(self.inc, 3, padding=1, bias=False,
                       groups=self.inc // gd, name="conv1")(x)
            h = conv2d(self.outc, 1, name="conv1pw")(h)
        else:
            h = conv2d(self.outc, 3, padding=1, bias=False, name="conv1")(x)
        h = _bn(train, "bn1")(nn.relu(h))
        if gd is not None:
            h = conv2d(self.outc, 3, padding=1, bias=False,
                       groups=self.outc // gd, name="conv2")(h)
            h = conv2d(self.outc, 1, name="conv2pw")(h)
        else:
            h = conv2d(self.outc, 3, padding=1, bias=False, name="conv2")(h)
        h = _bn(train, "bn2")(h)
        if self.use_fwse:
            h = fwSEBlock(self.num_freq, self.se_channels, name="se")(h)
        if self.outc != self.inc:
            sc = conv2d(self.outc, 1, bias=False, name="downsample_conv")(x)
            sc = _bn(train, "downsample_bn")(sc)
        else:
            sc = x
        return nn.relu(h + sc)


class TimeContextBlock1d2(nn.Module):
    C: int
    hC: int
    pos_ker_sz: int = 59
    block_type: str = "conv+att"

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip = x
        h = conv1d(self.hC, 1, name="red_dim_conv_0")(x)
        h = _ln("red_dim_conv_1")(h)
        if self.block_type == "fc":
            h2 = conv1d(self.hC * 2, 1, name="tcm_0")(h)
            h2 = nn.gelu(_ln("tcm_1")(h2), approximate=False)
            h = conv1d(self.hC, 1, name="tcm_3")(h2)
        elif self.block_type == "conv":
            for i in range(4):
                h = ConvNeXtLikeBlock1d(self.hC, (7, 15, 31), 1,
                                        name=f"tcm_{i}")(h, train)
        elif self.block_type == "att":
            h = PosEncConv(self.hC, self.pos_ker_sz, name="tcm_0")(h)
            h = TransformerEncoderLayer(self.hC, self.hC * 2, 4,
                                        name="tcm_1")(h)
        elif self.block_type == "conv+att":
            for i, ks in enumerate((7, 19, 31, 59)):
                h = ConvNeXtLikeBlock1d(self.hC, (ks,), 1,
                                        name=f"tcm_{i}")(h, train)
            h = TransformerEncoderLayer(self.hC, self.hC, 4,
                                        name="tcm_4")(h)
        else:
            raise NotImplementedError(self.block_type)
        h = conv1d(self.C, 1, name="exp_dim_conv")(h)
        return skip + h


def upsample_time(x1d, factor: int):
    """Nearest-neighbor upsample along time of a (B, T, D) map."""
    if factor == 1:
        return x1d
    return jnp.repeat(x1d, factor, axis=1)


class ReDimNet2Backbone(nn.Module):
    F: int = 72
    C: int = 24
    out_channels: Optional[int] = None
    block_1d_type: str = "conv+att"
    block_2d_type: str = "basic_resnet"
    return_2d_output: bool = False
    compress_tconvs: bool = True
    stages_setup: Sequence = ()
    group_divisor: Optional[int] = 1

    def _block2d(self, c, f, kernel_sizes, name):
        if self.block_2d_type.startswith("convnext_like"):
            act = "relu" if self.block_2d_type.endswith("relu") else "gelu"
            return lambda x, train: ConvNeXtLikeBlock2d(
                c, tuple(tuple(k) for k in kernel_sizes), self.group_divisor,
                act, name=f"{name}_conv_block")(x, train)
        use_fwse = self.block_2d_type == "basic_resnet_fwse"
        return lambda x, train: ResBasicBlock2(
            c, c, f, se_channels=min(64, max(c, 32)),
            gdiv=self.group_divisor, use_fwse=use_fwse,
            name=f"{name}_conv_block")(x, train)

    @nn.compact
    def __call__(self, x2d, train: bool = False):
        """x2d: (B, F, T, 1) -> (B, T', D) 1d features, or (B, f, T', c)
        when return_2d_output (T' = T truncated to the max time stride)."""
        F0, C0 = self.F, self.C
        CF = F0 * C0

        # max cumulative time stride determines the truncation
        stt_cum, max_stt = 1, 1
        for (sf, st), *_ in self.stages_setup:
            stt_cum *= st
            max_stt = max(max_stt, stt_cum)
        t_full = (x2d.shape[2] // max_stt) * max_stt
        # explicit lax.slice: jnp indexing elides a full-extent slice at
        # trace time, which makes the op sequence shape-dependent and
        # breaks ONNX export probing (export/jaxpr_to_onnx.py)
        import jax as _jax
        x2d = _jax.lax.slice_in_dim(x2d, 0, t_full, axis=2)

        def agg(outs, widx, n):
            w = self.param(f"{widx}_w", nn.initializers.zeros,
                           (1, n, CF, 1))
            ws = nn.softmax(w, axis=1).transpose(0, 1, 3, 2)  # (1,n,1,CF)
            xs = jnp.stack(outs, axis=1)  # (B, n, T, CF)
            return jnp.sum(ws * xs, axis=1)

        h = conv2d(C0, 3, padding=1, name="stem_0")(x2d)
        h = _ln("stem_1")(h)
        outputs_1d = [to1d(h)]

        cur_c, cur_f = C0, F0
        stt = 1
        for si, (stride, num_blocks, conv_exp, kernel_sizes,
                 att_red) in enumerate(self.stages_setup):
            sf, st = stride
            stt *= st
            xin = agg(outputs_1d, f"stage{si}_0", len(outputs_1d))
            h = to2d(xin, cur_c, cur_f)
            idx = 2  # 0=weigth1d, 1=to2d
            tconv_out = int(sf * cur_c * conv_exp)
            groups = math.gcd(int(cur_c), tconv_out) \
                if self.compress_tconvs else 1
            h = conv2d(tconv_out, (sf, stt), stride=(sf, stt), padding=0,
                       groups=groups, name=f"stage{si}_{idx}")(h)
            idx += 1
            cur_c = sf * cur_c
            cur_f = cur_f // sf
            for _ in range(num_blocks):
                h = self._block2d(tconv_out, cur_f, kernel_sizes,
                                  f"stage{si}_{idx}")(h, train)
                idx += 1
            if conv_exp != 1:
                h = conv2d(cur_c, 1, name=f"stage{si}_{idx}_0")(h)
                h = _bn(train, f"stage{si}_{idx}_1", eps=1e-6)(h)
                idx += 1
            idx += 1  # to1d slot
            h1d = to1d(h)
            if att_red is not None:
                h1d = TimeContextBlock1d2(
                    CF, CF // att_red, block_type=self.block_1d_type,
                    name=f"stage{si}_{idx}")(h1d, train)
                idx += 1
            h1d = upsample_time(h1d, stt)
            outputs_1d.append(h1d)

        out = agg(outputs_1d, "fin_wght1d", len(outputs_1d))
        if self.return_2d_output:
            out2d = to2d(out, cur_c, cur_f)
            if self.out_channels is not None:
                out2d = conv2d(self.out_channels, 1, name="head")(out2d)
            return out2d
        if self.out_channels is not None:
            out = conv1d(self.out_channels, 1, name="head")(out)
        return out

    @property
    def freq_stride(self):
        s = 1
        for (sf, _), *_ in self.stages_setup:
            s *= sf
        return s


class ReDimNet2Wrap(nn.Module):
    F: int = 72
    C: int = 24
    feat_dim: Optional[int] = None
    embed_dim: int = 192
    pooling_func: str = "ASTP"
    out_channels: Optional[int] = None
    block_1d_type: str = "conv+att"
    block_2d_type: str = "basic_resnet"
    compress_tconvs: bool = True
    return_2d_output: bool = False
    stages_setup: Sequence = ()
    group_divisor: Optional[int] = 1
    global_context_att: bool = True
    emb_bn: bool = False

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False, return_frame_feat: bool = False):
        """x: (B, T, F) mel features -> (B, embed_dim)."""
        F0 = self.feat_dim if self.feat_dim is not None else self.F
        h = jnp.transpose(x, (0, 2, 1))[..., None]  # (B, F, T, 1)
        backbone = ReDimNet2Backbone(
            F0, self.C, self.out_channels, self.block_1d_type,
            self.block_2d_type, self.return_2d_output, self.compress_tconvs,
            self.stages_setup, self.group_divisor, name="backbone")
        out = backbone(h, train)
        if out.ndim == 4:
            # (B, f, T, c) -> (B, T, c*f) with d = c*f + f_i, matching the
            # torch wrapper's (bs, C, F, T).reshape(bs, C*F, T) ordering
            b, f, t, c = out.shape
            out = out.transpose(0, 2, 3, 1).reshape(b, t, c * f)
        if return_frame_feat:
            return out
        in_dim = out.shape[-1]
        fmask = None
        if mask is not None:
            fmask = mask[:, :out.shape[1]]
        pooled = get_pooling(self.pooling_func, in_dim,
                             global_context_att=self.global_context_att,
                             name="pool")(out, fmask, train)
        pooled = _bn(train, "bn")(pooled)
        emb = nn.Dense(self.embed_dim, name="linear")(pooled)
        if self.emb_bn:
            emb = _bn(train, "bn2")(emb)
        return emb


def _wrap(C, out_channels, stages, feat_dim=72, embed_dim=192,
          pooling_func="ASTP", return_2d_output=False, **kw):
    return ReDimNet2Wrap(F=feat_dim, C=C, feat_dim=feat_dim,
                         embed_dim=embed_dim, pooling_func=pooling_func,
                         out_channels=out_channels,
                         return_2d_output=return_2d_output,
                         stages_setup=tuple(
                             (tuple(s[0]), s[1], s[2],
                              tuple(tuple(k) for k in s[3]), s[4])
                             for s in stages), **kw)


def ReDimNet2B0(feat_dim=72, embed_dim=192, pooling_func="ASTP", **kw):
    stages = [[[1, 1], 2, 2, [[3, 3]], 36], [[2, 1], 3, 1, [[3, 3]], 36],
              [[1, 2], 4, 1, [[3, 3]], 36], [[2, 1], 5, 1, [[3, 3]], 36],
              [[1, 2], 4, 1, [[3, 3]], 18], [[2, 1], 3, 1, [[3, 3]], 18]]
    return _wrap(12, 64, stages, feat_dim, embed_dim, pooling_func, **kw)


def ReDimNet2B1(feat_dim=72, embed_dim=192, pooling_func="ASTP", **kw):
    stages = [[[1, 1], 2, 2, [[3, 3]], 32], [[2, 1], 3, 1, [[3, 3]], 32],
              [[1, 2], 4, 1, [[3, 3]], 32], [[2, 1], 5, 1, [[3, 3]], 32],
              [[1, 2], 4, 1, [[3, 3]], 16], [[2, 1], 3, 1, [[3, 3]], 16]]
    return _wrap(16, 64, stages, feat_dim, embed_dim, pooling_func, **kw)


def ReDimNet2B2(feat_dim=72, embed_dim=192, pooling_func="ASTP", **kw):
    stages = [[[1, 1], 2, 2, [[3, 5]], 40], [[2, 1], 3, 1, [[3, 5]], 30],
              [[1, 2], 4, 1, [[3, 5]], 30], [[3, 1], 5, 1, [[3, 5]], 20],
              [[1, 2], 4, 1, [[3, 7]], 20], [[2, 1], 3, 1, [[3, 7]], 10]]
    return _wrap(20, 64, stages, feat_dim, embed_dim, pooling_func, **kw)


def ReDimNet2B3(feat_dim=72, embed_dim=192, pooling_func="ASTP", **kw):
    stages = [[[1, 1], 2, 2, [[3, 3]], 36], [[2, 1], 3, 1, [[3, 3]], 36],
              [[1, 2], 4, 1, [[3, 3]], 36], [[2, 1], 5, 1, [[3, 3]], 36],
              [[1, 2], 4, 1, [[3, 3]], 18], [[2, 1], 3, 1, [[3, 3]], 18]]
    return _wrap(24, 64, stages, feat_dim, embed_dim, pooling_func, **kw)


def ReDimNet2B4(feat_dim=72, embed_dim=192, pooling_func="ASTP", **kw):
    stages = [[[1, 1], 2, 4, [[3, 3]], 24], [[2, 1], 3, 3, [[3, 3]], 24],
              [[1, 2], 4, 2, [[3, 3]], 24], [[2, 1], 5, 1, [[3, 3]], 24],
              [[1, 2], 4, 1, [[3, 3]], 24], [[2, 1], 3, 1, [[3, 3]], 24]]
    return _wrap(32, None, stages, feat_dim, embed_dim, pooling_func, **kw)


def ReDimNet2B5(feat_dim=72, embed_dim=192, pooling_func="ASTP", **kw):
    stages = [[[1, 1], 2, 4, [[3, 3]], 48], [[2, 1], 3, 3, [[3, 3]], 48],
              [[1, 2], 4, 2, [[3, 3]], 48], [[2, 1], 5, 1, [[3, 3]], 48],
              [[1, 2], 4, 1, [[3, 3]], 32], [[2, 1], 3, 1, [[3, 3]], 32]]
    return _wrap(48, 256, stages, feat_dim, embed_dim, pooling_func, **kw)


def ReDimNet2B6(feat_dim=72, embed_dim=192, pooling_func="ASTP", **kw):
    stages = [[[1, 1], 3, 3, [[3, 3]], 64], [[2, 1], 4, 2, [[3, 3]], 64],
              [[1, 2], 5, 2, [[3, 3]], 48], [[2, 1], 5, 1, [[3, 3]], 48],
              [[1, 2], 4, 0.75, [[3, 3]], 32], [[2, 1], 3, 0.5, [[3, 3]], 24]]
    return _wrap(64, 224, stages, feat_dim, embed_dim, pooling_func,
                 return_2d_output=True, **kw)
