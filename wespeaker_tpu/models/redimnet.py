"""ReDimNet: alternating 2D conv stages and 1D time-context blocks with
learned per-stage input weighting and dimension reshaping.

Behavioral spec: wespeaker/models/redimnet.py (to1d:47, LayerNorm:63,
PosEncConv:118, ConvNeXtLikeBlock:134, MultiHeadAttention:206,
TransformerEncoderLayer:276, ResBasicBlock:461, fwSEBlock:434,
TimeContextBlock1d:540, ReDimNetBone:622, ReDimNet:792, constructors
:874-1078).

Layouts: 2D activations (B, F, T, C); 1D activations (B, T, F*C) with
index d = f*C + c — identical ordering to the reference's
(B, C, F, T) -> (B, F*C, T) to1d. Flax child names mirror the torch
Sequential indices so checkpoints convert mechanically; the learned
inputs_weights keep their torch shape (1, n, C*F, 1) and are transposed
in-model.

All four time-context variants ('fc', 'gru', 'att', 'conv+att') are
implemented; 'gru' recurs over time (see BiGRU for the reference quirk).
"""

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from wespeaker_tpu.models.layers import conv1d, conv2d
from wespeaker_tpu.models.pooling_layers import get_pooling


def new_gelu(x):
    """HF 'new' gelu == tanh approximation."""
    return 0.5 * x * (1.0 + jnp.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * x ** 3)))


def _bn(train, name, eps=1e-5):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=eps, name=name)


def _ln(name, eps=1e-6):
    return nn.LayerNorm(epsilon=eps, name=name)


class PosEncConv(nn.Module):
    """x + LN(depthwise-conv(x)) positional encoding; (B, T, C)."""
    C: int
    ks: int

    @nn.compact
    def __call__(self, x):
        h = conv1d(self.C, self.ks, padding=self.ks // 2, groups=self.C,
                   name="conv")(x)
        return x + _ln("norm")(h)


class ConvNeXtLikeBlock1d(nn.Module):
    C: int
    kernel_sizes: Tuple[int, ...] = (7,)
    group_divisor: Optional[int] = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        groups = (self.C // self.group_divisor
                  if self.group_divisor is not None else 1)
        outs = [conv1d(self.C, ks, padding=ks // 2, groups=groups,
                       name=f"dwconvs_{i}")(x)
                for i, ks in enumerate(self.kernel_sizes)]
        h = jnp.concatenate(outs, axis=-1)
        h = nn.gelu(_bn(train, "norm")(h), approximate=False)
        h = conv1d(self.C, 1, name="pwconv1")(h)
        return x + h


class ConvNeXtLikeBlock2d(nn.Module):
    C: int
    kernel_sizes: Tuple[Tuple[int, int], ...] = ((3, 3),)
    group_divisor: Optional[int] = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        groups = (self.C // self.group_divisor
                  if self.group_divisor is not None else 1)
        outs = [conv2d(self.C, ks, padding=(ks[0] // 2, ks[1] // 2),
                       groups=groups, name=f"dwconvs_{i}")(x)
                for i, ks in enumerate(self.kernel_sizes)]
        h = jnp.concatenate(outs, axis=-1)
        h = nn.gelu(_bn(train, "norm")(h), approximate=False)
        h = conv2d(self.C, 1, name="pwconv1")(h)
        return x + h


class fwSEBlock(nn.Module):
    """Frequency-wise squeeze-excitation; (B, F, T, C)."""
    num_freq: int
    num_feats: int = 64

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(2, 3))  # (B, F)
        s = nn.relu(nn.Dense(self.num_feats, name="squeeze")(s))
        s = nn.sigmoid(nn.Dense(self.num_freq, name="exitation")(s))
        return x * s[:, :, None, None]


class ResBasicBlock(nn.Module):
    in_planes: int
    planes: int
    num_freq: int
    se_channels: int = 64
    group_divisor: Optional[int] = 4
    use_fwse: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        gd = self.group_divisor
        if gd is not None:
            h = conv2d(self.in_planes, 3, padding=1, bias=False,
                       groups=self.in_planes // gd, name="conv1")(x)
            h = conv2d(self.planes, 1, name="conv1pw")(h)
        else:
            h = conv2d(self.planes, 3, padding=1, bias=False,
                       name="conv1")(x)
        h = _bn(train, "bn1")(nn.relu(h))
        if gd is not None:
            h = conv2d(self.planes, 3, padding=1, bias=False,
                       groups=self.planes // gd, name="conv2")(h)
            h = conv2d(self.planes, 1, name="conv2pw")(h)
        else:
            h = conv2d(self.planes, 3, padding=1, bias=False,
                       name="conv2")(h)
        h = _bn(train, "bn2")(h)
        if self.use_fwse:
            h = fwSEBlock(self.num_freq, self.se_channels, name="se")(h)
        if self.planes != self.in_planes:
            sc = conv2d(self.planes, 1, bias=False,
                        name="downsample_conv")(x)
            sc = _bn(train, "downsample_bn")(sc)
        else:
            sc = x
        return nn.relu(h + sc)


class MultiHeadAttention(nn.Module):
    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        d = self.embed_dim // self.num_heads
        b, t, _ = x.shape
        q = nn.Dense(self.embed_dim, name="q_proj")(x) * (d ** -0.5)
        k = nn.Dense(self.embed_dim, name="k_proj")(x)
        v = nn.Dense(self.embed_dim, name="v_proj")(x)
        q = q.reshape(b, t, self.num_heads, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, self.num_heads, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, self.num_heads, d).transpose(0, 2, 1, 3)
        w = nn.softmax(q @ k.transpose(0, 1, 3, 2), axis=-1)
        out = (w @ v).transpose(0, 2, 1, 3).reshape(b, t, self.embed_dim)
        return nn.Dense(self.embed_dim, name="out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """Post-LN transformer layer (redimnet.py:276-328); (B, T, C)."""
    n_state: int
    n_mlp: int
    n_head: int = 4

    @nn.compact
    def __call__(self, x):
        x = x + MultiHeadAttention(self.n_state, self.n_head,
                                   name="attention")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="layer_norm")(x)
        h = nn.Dense(self.n_mlp, name="feed_forward_intermediate_dense")(x)
        h = new_gelu(h)
        h = nn.Dense(self.n_state, name="feed_forward_output_dense")(h)
        x = x + h
        return nn.LayerNorm(epsilon=1e-6, name="final_layer_norm")(x)


class BiGRU(nn.Module):
    """Bidirectional single-layer GRU over time, (B, T, C) -> (B, T, 2C).

    The reference's 'gru' block (wespeaker/models/redimnet.py:107-115,
    564-575) constructs nn.GRU(batch_first=False) but feeds it (B, T, C),
    so torch recurs over the *batch* axis — an apparent bug no released
    config exercises. We implement the intended semantics (recurrence over
    time) by default; `torch_quirk=True` replicates the reference bug
    bit-for-bit for any checkpoint that was trained with it.
    """
    hidden: int
    torch_quirk: bool = False

    @nn.compact
    def __call__(self, x):
        # nn.RNN shares scope with its cell, so params live under the
        # cell names 'fwd'/'bwd'
        fwd = nn.RNN(nn.GRUCell(self.hidden, name="fwd"))
        bwd = nn.RNN(nn.GRUCell(self.hidden, name="bwd"), reverse=True,
                     keep_order=True)
        if self.torch_quirk:
            # torch nn.GRU(batch_first=False) fed (B, T, C) takes axis 0
            # as the sequence: recur over B with T acting as the batch
            xq = x.swapaxes(0, 1)  # RNN scans axis 1 -> the B axis
            return jnp.concatenate([fwd(xq), bwd(xq)],
                                   axis=-1).swapaxes(0, 1)
        return jnp.concatenate([fwd(x), bwd(x)], axis=-1)


class TimeContextBlock1d(nn.Module):
    """(B, T, C) residual time-context block."""
    C: int
    hC: int
    pos_ker_sz: int = 59
    block_type: str = "att"
    gru_quirk_compat: bool = False  # see BiGRU.torch_quirk

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip = x
        h = conv1d(self.hC, 1, name="red_dim_conv_0")(x)
        h = _ln("red_dim_conv_1")(h)
        if self.block_type == "fc":
            h2 = conv1d(self.hC * 2, 1, name="tcm_0")(h)
            h2 = nn.gelu(_ln("tcm_1")(h2), approximate=False)
            h = conv1d(self.hC, 1, name="tcm_3")(h2)
        elif self.block_type == "att":
            h = PosEncConv(self.hC, self.pos_ker_sz, name="tcm_0")(h)
            h = TransformerEncoderLayer(self.hC, self.hC * 2, 4,
                                        name="tcm_1")(h)
        elif self.block_type == "gru":
            h = BiGRU(self.hC, torch_quirk=self.gru_quirk_compat,
                      name="tcm_0")(h)
            h = conv1d(self.hC, 1, name="tcm_1")(h)
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


def to1d(x):
    """(B, F, T, C) -> (B, T, F*C) with d = f*C + c."""
    b, f, t, c = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, f * c)


def to2d(x, c, f):
    """(B, T, F*C) -> (B, F, T, C)."""
    b, t, fc = x.shape
    return x.reshape(b, t, f, c).transpose(0, 2, 1, 3)


class ReDimNetBone(nn.Module):
    feat_dim: int = 72
    C: int = 16
    block_1d_type: str = "conv+att"
    block_2d_type: str = "basic_resnet"
    stages_setup: Sequence = (
        (1, 2, 1, ((3, 3),), None),
        (2, 3, 1, ((3, 3),), None),
        (3, 4, 1, ((3, 3),), 8),
        (2, 5, 1, ((3, 3),), 8),
        (1, 5, 1, ((7, 1),), 8),
        (2, 3, 1, ((3, 3),), 8),
    )
    group_divisor: Optional[int] = 1
    out_channels: Optional[int] = 512
    gru_quirk_compat: bool = False  # see BiGRU.torch_quirk

    def _block2d(self, c, f, name):
        if self.block_2d_type == "convnext_like":
            return lambda x, train: ConvNeXtLikeBlock2d(
                c, ((3, 3),), self.group_divisor,
                name=f"{name}_conv_block")(x, train)
        use_fwse = self.block_2d_type == "basic_resnet_fwse"
        return lambda x, train: ResBasicBlock(
            c, c, f, se_channels=min(64, max(c, 32)),
            group_divisor=self.group_divisor, use_fwse=use_fwse,
            name=f"{name}_conv_block")(x, train)

    @nn.compact
    def __call__(self, x, train: bool = False):
        F0, C0 = self.feat_dim, self.C
        n_stages = len(self.stages_setup)
        # learned per-stage softmax weighting of all previous 1d outputs;
        # params keep the torch layout (1, n_inputs, C*F, 1)
        weights = [None]  # stage 0 weight is a frozen scalar in the reference
        for i in range(1, n_stages + 1):
            weights.append(self.param(f"inputs_weights_{i}",
                                      nn.initializers.zeros,
                                      (1, i + 1, C0 * F0, 1)))

        h = conv2d(C0, 3, padding=1, name="stem_0")(x)
        h = _ln("stem_1")(h)

        def weight1d(outs, i):
            if weights[i] is None:
                return outs[0]
            xs = jnp.stack(outs, axis=1)  # (B, n, T, CF)
            w = nn.softmax(weights[i], axis=1)  # (1, n, CF, 1)
            w = w.transpose(0, 1, 3, 2)  # (1, n, 1, CF)
            return jnp.sum(w * xs, axis=1)

        outputs_1d = [to1d(h)]
        cur_c, cur_f = C0, F0
        for si, (stride, num_blocks, conv_exp, _ks, att_red) in enumerate(
                self.stages_setup):
            xin = weight1d(outputs_1d, si)
            h = to2d(xin, cur_c, cur_f)
            idx = 0
            h = conv2d(int(stride * cur_c * conv_exp), (stride, 1),
                       stride=(stride, 1), padding=0,
                       name=f"stage{si}_{idx}")(h)
            idx += 1
            cur_c = stride * cur_c
            cur_f = cur_f // stride
            for _ in range(num_blocks):
                h = self._block2d(int(cur_c * conv_exp), cur_f,
                                  f"stage{si}_{idx}")(h, train)
                idx += 1
            if conv_exp != 1:
                gd = self.group_divisor
                h2 = conv2d(cur_c, 3, padding=1,
                            groups=(cur_c // gd if gd is not None else 1),
                            name=f"stage{si}_{idx}_0")(h)
                h2 = _bn(train, f"stage{si}_{idx}_1", eps=1e-6)(h2)
                h2 = nn.gelu(h2, approximate=False)
                h = conv2d(cur_c, 1, name=f"stage{si}_{idx}_3")(h2)
                idx += 1
            idx += 1  # to1d occupies a Sequential slot in the reference
            h1d = to1d(h)
            if att_red is not None:
                h1d = TimeContextBlock1d(
                    C0 * F0, (C0 * F0) // att_red,
                    block_type=self.block_1d_type,
                    gru_quirk_compat=self.gru_quirk_compat,
                    name=f"stage{si}_{idx}")(h1d, train)
            outputs_1d.append(h1d)

        out = weight1d(outputs_1d, n_stages)
        if self.out_channels is not None:
            out = conv1d(self.out_channels, 1, name="mfa_0")(out)
            out = _bn(train, "mfa_1")(out)
        return out  # (B, T, D)


class ReDimNet(nn.Module):
    feat_dim: int = 72
    C: int = 16
    block_1d_type: str = "conv+att"
    block_2d_type: str = "basic_resnet"
    stages_setup: Sequence = ReDimNetBone.stages_setup
    group_divisor: Optional[int] = 4
    out_channels: Optional[int] = None
    embed_dim: int = 192
    pooling_func: str = "ASTP"
    global_context_att: bool = True
    two_emb_layer: bool = False
    gru_quirk_compat: bool = False  # see BiGRU.torch_quirk

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False, return_frame_feat: bool = False):
        h = jnp.transpose(x, (0, 2, 1))[..., None]  # (B, F, T, 1)
        feat = ReDimNetBone(self.feat_dim, self.C, self.block_1d_type,
                            self.block_2d_type, self.stages_setup,
                            self.group_divisor, self.out_channels,
                            gru_quirk_compat=self.gru_quirk_compat,
                            name="backbone")(h, train)
        if return_frame_feat:
            return feat
        out_dim = (self.out_channels if self.out_channels is not None
                   else self.C * self.feat_dim)
        pooled = get_pooling(self.pooling_func, out_dim,
                             global_context_att=self.global_context_att,
                             name="pool")(feat, mask, train)
        embed_a = nn.Dense(self.embed_dim, name="seg_1")(pooled)
        if self.two_emb_layer:
            out = nn.relu(embed_a)
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, use_scale=False, use_bias=False,
                               name="seg_bn_1")(out)
            return nn.Dense(self.embed_dim, name="seg_2")(out)
        return embed_a


def ReDimNetB0(feat_dim=60, embed_dim=192, pooling_func="ASTP",
               two_emb_layer=False):
    return ReDimNet(feat_dim=feat_dim, C=10, block_1d_type="conv+att",
                    block_2d_type="basic_resnet",
                    stages_setup=((1, 2, 1, ((3, 3),), 30),
                                  (2, 3, 2, ((3, 3),), 30),
                                  (1, 3, 3, ((3, 3),), 30),
                                  (2, 4, 2, ((3, 3),), 10),
                                  (1, 3, 1, ((3, 3),), 10)),
                    group_divisor=1, out_channels=None, embed_dim=embed_dim,
                    pooling_func=pooling_func, global_context_att=True,
                    two_emb_layer=two_emb_layer)


def ReDimNetB1(feat_dim=72, embed_dim=192, pooling_func="ASTP",
               two_emb_layer=False):
    return ReDimNet(feat_dim=feat_dim, C=12, block_1d_type="conv+att",
                    block_2d_type="convnext_like",
                    stages_setup=((1, 2, 1, ((3, 3),), None),
                                  (2, 3, 1, ((3, 3),), None),
                                  (3, 4, 1, ((3, 3),), 12),
                                  (2, 5, 1, ((3, 3),), 12),
                                  (2, 3, 1, ((3, 3),), 8)),
                    group_divisor=8, out_channels=None, embed_dim=embed_dim,
                    pooling_func=pooling_func, global_context_att=True,
                    two_emb_layer=two_emb_layer)


def ReDimNetB2(feat_dim=72, embed_dim=192, pooling_func="ASTP",
               two_emb_layer=False):
    return ReDimNet(feat_dim=feat_dim, C=16, block_1d_type="conv+att",
                    block_2d_type="convnext_like",
                    stages_setup=((1, 2, 1, ((3, 3),), 12),
                                  (2, 2, 1, ((3, 3),), 12),
                                  (1, 3, 1, ((3, 3),), 12),
                                  (2, 4, 1, ((3, 3),), 8),
                                  (1, 4, 1, ((3, 3),), 8),
                                  (2, 4, 1, ((3, 3),), 4)),
                    group_divisor=8, out_channels=None, embed_dim=embed_dim,
                    pooling_func=pooling_func, global_context_att=True,
                    two_emb_layer=two_emb_layer)


def ReDimNetB3(feat_dim=72, embed_dim=192, pooling_func="ASTP",
               two_emb_layer=False):
    return ReDimNet(feat_dim=feat_dim, C=16, block_1d_type="conv+att",
                    block_2d_type="basic_resnet_fwse",
                    stages_setup=((1, 6, 4, ((3, 3),), 32),
                                  (2, 6, 2, ((3, 3),), 32),
                                  (1, 8, 2, ((3, 3),), 32),
                                  (2, 10, 2, ((3, 3),), 16),
                                  (1, 10, 1, ((3, 3),), 16),
                                  (2, 8, 1, ((3, 3),), 16)),
                    group_divisor=1, out_channels=None, embed_dim=embed_dim,
                    pooling_func=pooling_func, global_context_att=True,
                    two_emb_layer=two_emb_layer)


def ReDimNetB4(feat_dim=72, embed_dim=192, pooling_func="ASTP",
               two_emb_layer=False):
    return ReDimNet(feat_dim=feat_dim, C=32, block_1d_type="conv+att",
                    block_2d_type="basic_resnet_fwse",
                    stages_setup=((1, 4, 2, ((3, 3),), 48),
                                  (2, 4, 2, ((3, 3),), 48),
                                  (1, 6, 2, ((3, 3),), 48),
                                  (2, 6, 1, ((3, 3),), 32),
                                  (1, 8, 1, ((3, 3),), 24),
                                  (2, 4, 1, ((3, 3),), 16)),
                    group_divisor=1, out_channels=None, embed_dim=embed_dim,
                    pooling_func=pooling_func, global_context_att=True,
                    two_emb_layer=two_emb_layer)


def ReDimNetB5(feat_dim=72, embed_dim=192, pooling_func="ASTP",
               two_emb_layer=False):
    return ReDimNet(feat_dim=feat_dim, C=32, block_1d_type="conv+att",
                    block_2d_type="basic_resnet_fwse",
                    stages_setup=((1, 4, 2, ((3, 3),), 48),
                                  (2, 4, 2, ((3, 3),), 48),
                                  (1, 6, 2, ((3, 3),), 48),
                                  (2, 6, 1, ((3, 3),), 32),
                                  (1, 8, 1, ((3, 3),), 24),
                                  (2, 4, 1, ((3, 3),), 16)),
                    group_divisor=16, out_channels=None, embed_dim=embed_dim,
                    pooling_func=pooling_func, global_context_att=True,
                    two_emb_layer=two_emb_layer)


def ReDimNetB6(feat_dim=72, embed_dim=192, pooling_func="ASTP",
               two_emb_layer=False):
    return ReDimNet(feat_dim=feat_dim, C=32, block_1d_type="conv+att",
                    block_2d_type="basic_resnet",
                    stages_setup=((1, 4, 4, ((3, 3),), 32),
                                  (2, 6, 2, ((3, 3),), 32),
                                  (1, 6, 2, ((3, 3),), 24),
                                  (3, 8, 1, ((3, 3),), 24),
                                  (1, 8, 1, ((3, 3),), 16),
                                  (2, 8, 1, ((3, 3),), 16)),
                    group_divisor=32, out_channels=None, embed_dim=embed_dim,
                    pooling_func=pooling_func, global_context_att=True,
                    two_emb_layer=two_emb_layer)
