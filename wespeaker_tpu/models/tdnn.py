"""Kaldi-style TDNN x-vector, TPU-native flax implementation.

Behavioral spec: wespeaker/models/tdnn.py (TdnnLayer:23, XVEC:57).
(B, T, C) channels-last; dilated 1D convs lower onto the MXU directly.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from wespeaker_tpu.models.layers import conv1d
from wespeaker_tpu.models.pooling_layers import get_pooling, pooling_out_dim


class TdnnLayer(nn.Module):
    out_dim: int
    context_size: int
    dilation: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = conv1d(self.out_dim, self.context_size, dilation=self.dilation,
                     padding=self.padding, name="conv_1d")(x)
        out = nn.relu(out)
        # affine=False BN, kaldi-compatible (tdnn.py:48)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, use_scale=False, use_bias=False,
                            name="bn")(out)


class XVEC(nn.Module):
    feat_dim: int = 40
    hid_dim: int = 512
    stats_dim: int = 1500
    embed_dim: int = 512
    pooling_func: str = "TSTP"

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 train: bool = False, return_frame_feat: bool = False):
        out = TdnnLayer(self.hid_dim, 5, 1, name="frame_1")(x, train)
        out = TdnnLayer(self.hid_dim, 3, 2, name="frame_2")(out, train)
        out = TdnnLayer(self.hid_dim, 3, 3, name="frame_3")(out, train)
        out = TdnnLayer(self.hid_dim, 1, 1, name="frame_4")(out, train)
        out = TdnnLayer(self.stats_dim, 1, 1, name="frame_5")(out, train)
        if return_frame_feat:
            return out
        if mask is not None:
            # unpadded convs shrink T by 4 + 2*2 + 3*2 = 14 frames
            lost = x.shape[1] - out.shape[1]
            fmask = mask[:, lost:]
        else:
            fmask = None
        stats = get_pooling(self.pooling_func, self.stats_dim,
                            name="pool")(out, fmask, train)
        embed_a = nn.Dense(self.embed_dim, name="seg_1")(stats)
        h = nn.relu(embed_a)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, use_scale=False, use_bias=False,
                         name="seg_bn_1")(h)
        return nn.Dense(self.embed_dim, name="seg_2")(h)

    @property
    def pool_out_dim(self):
        return pooling_out_dim(self.pooling_func, self.stats_dim)
